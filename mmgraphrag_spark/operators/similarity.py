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
