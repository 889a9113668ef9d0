"""Approximate-nearest-neighbor search over the embeddings table.

* brute-force cosine top-k — the correctness baseline (reference analogue:
  NanoVectorDB brute-force cosine, /root/reference/mmgraphrag/storage.py:297-322
  with better_than_threshold, T1) — broadcast the (small) query side, never
  all-pairs both-big;
* sign-projection LSH top-k — the 100 TB path: each vector hashes to a bucket
  of sign bits against P pseudo-random hyperplanes (hyperplane components
  derived from md5, engine-portable); candidates share a bucket, so the join
  is equi on bucket id and the per-bucket top-k is a window.

All scoring is exact integer arithmetic over quantized embeddings (see
dedup.quantized_embeddings): rank_key = sign-aware ⌊10^12·D²/(Na·Nb)⌋ orders
pairs identically in Spark and DuckDB with zero float drift.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _flat_dot, embedding_dims, quantized_embeddings

# sign-aware squared-cosine rank key, exact in int64:
#   D ≤ 64·1000² = 6.4e7 → D² ≤ 4.1e15; 10^12·D²  overflows, so divide first:
#   key = sign(D) · ((10^6·D·D) div Na div Nb · 10^6 + ((10^6·D·D) mod Na ...))
# — simpler and still deterministic: key = sign(D) · (D·D div max(Na·Nb div 10^6, 1))
_RANK = (
    "cast(case when dot >= 0 then 1 else -1 end as long)"
    " * ((dot * dot) div greatest((na * nb) div 1000000, 1))"
)


def _pairs(qe: DataFrame, n_queries: int, dims: int) -> DataFrame:
    q = qe.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qv"), F.col("n").alias("na")
    )
    c = qe.select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cv"), F.col("n").alias("nb")
    )
    # flat codegen dot (no aggregate/zip_with lambda — those run interpreted;
    # measured ~30× a flat projection on this exact path, PLANS.md §5)
    return (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .withColumn("dot", _flat_dot("qv", "cv", dims))
        .withColumn("rank_key", F.expr(_RANK))
    )


def ann_bruteforce_topk(
    spark, sf_dir: str, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """(qid, cid, dot, rank_key, rnk): exact top-k neighbors per query."""
    pairs = _pairs(
        quantized_embeddings(spark, sf_dir), n_queries, embedding_dims(spark, sf_dir)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rank_key"), F.asc("cid"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "dot", "rank_key", "rnk")
    )


def _plane_signs(table: int, plane: int, dims: int) -> list[int]:
    """Hyperplane component signs ±1 from md5('t:p|d') first-hex-digit parity.

    Precomputed DRIVER-side (the hyperplane is static data, not per-row
    work) — the per-row expression is then a pure flat ±q[d] sum in codegen;
    the DuckDB oracle recomputes the identical md5 parity in SQL.
    """
    return [
        1 if int(hashlib.md5(f"{table}:{plane}|{d}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1
        for d in range(dims)
    ]


def _plane_sign_sum(table: int, plane: int, dims: int):
    s = None
    for d, sign in enumerate(_plane_signs(table, plane, dims)):
        term = F.get("q", d) if sign > 0 else -F.get("q", d)
        s = term if s is None else s + term
    return s


def lsh_buckets(
    qe: DataFrame, tables: int = 8, planes: int = 3, dims: int = 64
) -> DataFrame:
    """(vec_id, q, n, table, bucket): multi-table sign-projection buckets.

    L independent tables of few planes each trade bucket size for recall —
    a true neighbor colliding in ANY table becomes a candidate (standard
    random-hyperplane LSH amplification). Hyperplanes derive from md5, so
    any engine computes identical buckets.
    """
    rows = []
    for t in range(tables):
        bucket = None
        for p in range(planes):
            bit = F.when(_plane_sign_sum(t, p, dims) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        rows.append(F.struct(F.lit(t).alias("table"), bucket.cast("long").alias("bucket")))
    return qe.select(
        "vec_id", "q", "n", F.explode(F.array(*rows)).alias("tb")
    ).select("vec_id", "q", "n", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def ann_lsh_topk(
    spark, sf_dir: str, k: int = 5, n_queries: int = 10,
    tables: int = 8, planes: int = 3,
) -> DataFrame:
    """(qid, cid, dot, rank_key, rnk): per-bucket top-k — the scale path.

    Recall < 1 by design (bucket boundaries); the brute-force query is the
    yardstick. Join is equi on (table, bucket) → shuffle-bounded,
    AQE-skew-safe; candidates dedup before scoring so each pair is scored
    once regardless of how many tables it collides in.
    """
    dims = embedding_dims(spark, sf_dir)
    qe = lsh_buckets(quantized_embeddings(spark, sf_dir), tables, planes, dims)
    q = qe.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("table").alias("qt"),
        F.col("bucket").alias("qb"),
    )
    c = qe.select(
        F.col("vec_id").alias("cid"), F.col("table").alias("ct"),
        F.col("bucket").alias("cb"),
    )
    cand = (
        c.join(
            F.broadcast(q),
            (F.col("qt") == F.col("ct")) & (F.col("qb") == F.col("cb"))
            & (F.col("qid") != F.col("cid")),
        )
        .select("qid", "cid")
        .distinct()
    )
    base = quantized_embeddings(spark, sf_dir)
    pairs = (
        cand.join(
            base.select(F.col("vec_id").alias("qid"), F.col("q").alias("qv"), F.col("n").alias("na")),
            "qid",
        )
        .join(
            base.select(F.col("vec_id").alias("cid"), F.col("q").alias("cv"), F.col("n").alias("nb")),
            "cid",
        )
        .withColumn("dot", _flat_dot("qv", "cv", dims))
        .withColumn("rank_key", F.expr(_RANK))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rank_key"), F.asc("cid"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "dot", "rank_key", "rnk")
    )


# ---- IVF (inverted-file) ANN ------------------------------------------------


def ivf_centroids(qe: DataFrame, n_centroids: int = 16) -> DataFrame:
    """(cent_id, cv, cn): deterministic coarse quantizer.

    Centroid seeds = the ``n_centroids`` vectors with smallest
    md5(vec_id) — a pseudo-random but engine-portable sample (DuckDB
    computes the identical set). Selection is a distributed top-K
    (TakeOrderedAndProject — no global sort materializes); only the K
    surviving rows see a window. Production swap point: refine these seeds
    with k-means|| (pyspark.ml.clustering.KMeans) — every downstream shape
    below is unchanged, the quantizer is pluggable data.
    """
    seeds = (
        qe.select(
            F.md5(F.col("vec_id").cast("string")).alias("mk"), "vec_id", "q", "n"
        )
        .orderBy("mk", "vec_id")
        .limit(n_centroids)
    )
    w = Window.orderBy("mk", "vec_id")
    return seeds.withColumn("cent_id", F.row_number().over(w)).select(
        "cent_id", F.col("q").alias("cv"), F.col("n").alias("cn")
    )


def ivf_centroids_kmeans(
    qe: DataFrame, n_centroids: int = 16, max_iter: int = 10, seed: int = 7,
) -> DataFrame:
    """(cent_id, cv, cn): k-means|| coarse quantizer — the production IVF
    path (pyspark.ml.clustering.KMeans, init='k-means||').

    Same output contract as :func:`ivf_centroids` (integer component
    vectors + integer squared norm), so every downstream shape —
    map-side-argmax assignment, nprobe probing, per-list scoring — is
    unchanged; only the centroid DATA differs. Real IVF wants ~sqrt(n)
    balanced centroids: k-means minimizes within-list variance, so lists
    are tight and nprobe lists cover the true neighbors far more often
    than the md5-sampled seeds (recall\\@k measured in
    tests/test_dedup_similarity.py). The md5 sample stays as the
    deterministic DuckDB-oracle path; k-means|| is NOT reproducible in SQL
    (iterative), which is exactly the documented split between oracle
    quantizer and production quantizer.

    Scale: k-means|| is the distributed init (O(iter) passes, each a
    map-side cost aggregation); fitting on a sampled fraction is the
    standard further cut at 10^12 rows — pass ``qe.sample(...)``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = qe.select(
        "vec_id", array_to_vector(F.col("q").cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=n_centroids, maxIter=max_iter, seed=seed, initMode="k-means||"
    ).fit(feat)
    spark = qe.sparkSession
    cents = spark.createDataFrame(
        [(i,) for i in range(len(model.clusterCenters()))], "cent_id int"
    ).join(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "cent_id int, craw array<double>",
        ),
        "cent_id",
    )
    # quantize centroid components to the same integer domain as q
    dims = len(model.clusterCenters()[0])
    comps = [
        F.round(F.get("craw", i)).cast("long").alias(f"_c{i}") for i in range(dims)
    ]
    flat = cents.select((F.col("cent_id") + 1).alias("cent_id"), *comps)
    n = None
    for i in range(dims):
        t = F.col(f"_c{i}") * F.col(f"_c{i}")
        n = t if n is None else n + t
    return flat.select(
        "cent_id",
        F.array(*[F.col(f"_c{i}") for i in range(dims)]).alias("cv"),
        n.alias("cn"),
    )


def _rank_against_centroids(vecs: DataFrame, cents: DataFrame, dims: int) -> DataFrame:
    """vec x centroid exact-integer cosine rank (broadcast cross join: K is
    small by construction; n·K rows, linear in corpus size)."""
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("dot", _flat_dot("q", "cv", dims))
        .withColumn("na", F.col("n"))
        .withColumn("nb", F.col("cn"))
        .withColumn("rank_key", F.expr(_RANK))
    )


def ivf_assign(qe: DataFrame, cents: DataFrame, dims: int) -> DataFrame:
    """(vec_id, cent_id): each vector -> its nearest centroid list.

    Argmax by (rank_key desc, cent_id asc) as a map-side partial aggregation
    (max over an ordered struct), NOT a window: the n·K cross-join output is
    already partitioned by the scan, so the agg collapses K rows per vector
    before any exchange — at 100 TB this is the difference between shuffling
    n·K rows and shuffling n.
    """
    ranked = _rank_against_centroids(qe, cents, dims)
    return (
        ranked.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("rank_key"), (-F.col("cent_id")).alias("nc"))
            ).alias("best")
        )
        .select("vec_id", (-F.col("best.nc")).alias("cent_id"))
    )


def ann_ivf_topk(
    spark, sf_dir: str, k: int = 5, n_queries: int = 10,
    n_centroids: int = 16, nprobe: int = 4, quantizer: str = "md5",
) -> DataFrame:
    """(qid, cid, dot, rank_key, rnk): IVF top-k — the partition-pruned path.

    Classic inverted-file search: vectors are bucketed by nearest centroid;
    a query scores only the vectors in its ``nprobe`` nearest lists, so the
    scored fraction is ~nprobe/n_centroids of the corpus. All joins are equi
    on cent_id (shuffle-bounded, AQE-skew-safe). With nprobe == n_centroids
    every list is probed and the result equals brute force exactly
    (unit-tested); smaller nprobe trades recall for a proportional scan cut.
    """
    dims = embedding_dims(spark, sf_dir)
    qe = quantized_embeddings(spark, sf_dir)
    if quantizer == "kmeans":
        cents = ivf_centroids_kmeans(qe, n_centroids)
    else:
        cents = ivf_centroids(qe, n_centroids)
    assign = ivf_assign(qe, cents, dims)

    queries = qe.filter(F.col("vec_id") < n_queries)
    wq = Window.partitionBy("vec_id").orderBy(
        F.desc("rank_key"), F.asc("cent_id")
    )
    probe = (
        _rank_against_centroids(queries, cents, dims)
        .withColumn("prnk", F.row_number().over(wq))
        .filter(F.col("prnk") <= nprobe)
        .select(F.col("vec_id").alias("qid"), "cent_id")
    )

    cand = (
        assign.withColumnRenamed("vec_id", "cid")
        .join(F.broadcast(probe), "cent_id")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    base = quantized_embeddings(spark, sf_dir)
    pairs = (
        cand.join(
            base.select(F.col("vec_id").alias("qid"), F.col("q").alias("qv"),
                        F.col("n").alias("na")),
            "qid",
        )
        .join(
            base.select(F.col("vec_id").alias("cid"), F.col("q").alias("cv"),
                        F.col("n").alias("nb")),
            "cid",
        )
        .withColumn("dot", _flat_dot("qv", "cv", dims))
        .withColumn("rank_key", F.expr(_RANK))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rank_key"), F.asc("cid"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "dot", "rank_key", "rnk")
    )


# ---- SQ8 (scalar-quantized) ANN ----------------------------------------------


def sq8_reconstructed(spark, sf_dir: str) -> DataFrame:
    """(vec_id, q array<long>, n long): 8-bit scalar-quantized embeddings,
    reconstructed back into the integer-quantized domain.

    The memory scale path for ANN: per dimension, the corpus [min, max]
    range (one global 1-row aggregate, broadcast) maps each component to a
    uint8 code ``(x - mn) * 255 div max(mx - mn, 1)`` — 1 byte/dim on disk
    and in executor memory, 8× smaller than the float64 column and 4×
    smaller than float32 (FAISS's SQ8 storage layout). Scoring reconstructs
    ``r = mn + (code * (mx - mn)) div 255`` — all integer, so the DuckDB
    twin (`oracle_extra.ann_sq8_topk_sql`) matches bit-for-bit, and |r| stays
    in the same magnitude envelope as the q-scale input, so the shared
    `_RANK` key needs no overflow rework.

    Scale shape: the stats aggregate is map-side combined into ONE row and
    broadcast (the same 1-row crossJoin pattern as textstats' corpus
    aggregates); coding + reconstruction are flat per-dim codegen
    projections — zero extra exchanges over the base scan.
    """
    dims = embedding_dims(spark, sf_dir)
    qe = quantized_embeddings(spark, sf_dir)
    stats = qe.agg(
        *[F.min(F.get("q", i)).alias(f"mn{i}") for i in range(dims)],
        *[F.max(F.get("q", i)).alias(f"mx{i}") for i in range(dims)],
    )
    flat = qe.select(
        "vec_id", *[F.get("q", i).alias(f"_q{i}") for i in range(dims)]
    ).crossJoin(F.broadcast(stats))
    rcols = [
        F.expr(
            f"mn{i} + ((((_q{i} - mn{i}) * 255) div greatest(mx{i} - mn{i}, 1))"
            f" * (mx{i} - mn{i})) div 255"
        ).cast("long").alias(f"_r{i}")
        for i in range(dims)
    ]
    rec = flat.select("vec_id", *rcols)
    n = None
    for i in range(dims):
        term = F.col(f"_r{i}") * F.col(f"_r{i}")
        n = term if n is None else n + term
    return rec.select(
        "vec_id",
        F.array(*[F.col(f"_r{i}") for i in range(dims)]).alias("q"),
        n.alias("n"),
    )


def ann_sq8_topk(
    spark, sf_dir: str, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """(qid, cid, dot, rank_key, rnk): top-k per query over SQ8-reconstructed
    vectors — the compressed-storage ANN variant (brute-force scoring shape;
    compose with lsh_buckets / ivf lists for candidate pruning, the coding is
    orthogonal to the index). Recall vs the exact path is bounded by the
    per-dim quantization error (≤ (mx-mn)/255 per component); the pytest
    yardstick asserts top-1 agreement with ann_bruteforce_topk on the
    synthetic table.
    """
    pairs = _pairs(
        sq8_reconstructed(spark, sf_dir), n_queries, embedding_dims(spark, sf_dir)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rank_key"), F.asc("cid"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "dot", "rank_key", "rnk")
    )
