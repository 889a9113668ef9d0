"""Training-data curation over the documents table: deterministic
stratified sampling and fixed-budget sequence packing.

Beyond-reference operators for the 100 TB pipeline this engine feeds: after
dedup/quality filtering (operators/dedup.py, textstats.py) a training run
wants (a) a reproducible per-stratum subsample — "x% of each language" —
that needs no RNG state, no shuffle, and gives the SAME verdict for a doc
on every run and every engine; and (b) documents packed into fixed
token-budget training sequences (the concat-and-chunk packing standard for
LM pretraining). Both are pure column expressions / single-window plans
with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# multiplicative hash (Knuth's 2^32 golden ratio); doc_id is folded through
# a Mersenne-prime mod FIRST so the product stays < 2^31 * 2^32 < 2^63 —
# int64-safe at any doc_id, including 10^12-scale ids
HASH_SQL = "pmod(pmod(doc_id, 2147483647) * 2654435761, 4294967296) % 1000000"

# default per-language keep rates (ppm): a typical rebalancing mix
DEFAULT_RATES_PPM: dict[str, int] = {"en": 500_000, "de": 250_000, "fr": 250_000}
DEFAULT_RATE_PPM = 125_000


def stratified_sample(
    docs: DataFrame,
    rates_ppm: dict[str, int] | None = None,
    default_ppm: int = DEFAULT_RATE_PPM,
) -> DataFrame:
    """(doc_id, lang, source, bucket_ppm, rate_ppm): the kept subsample.

    A doc is kept iff hash(doc_id) % 10^6 < rate(lang). The hash is a pure
    integer multiplicative mix (no RNG, no seed state): membership is
    decidable per-row with zero shuffles and zero coordination, stable
    under reruns/resume, and RAISING a stratum's rate strictly grows its
    sample (bucket_ppm is fixed per doc) — the property incremental
    curation needs. The per-stratum rate is a flat CASE over the small
    fixed language map (codegen; no join).
    """
    rates = DEFAULT_RATES_PPM if rates_ppm is None else rates_ppm
    rate = F.lit(default_ppm).cast("long")
    for lang, ppm in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(ppm).cast("long")).otherwise(rate)
    return (
        docs.select(
            "doc_id", "lang", "source",
            F.expr(HASH_SQL).alias("bucket_ppm"),
            rate.alias("rate_ppm"),
        )
        .filter(F.col("bucket_ppm") < F.col("rate_ppm"))
    )


def pack_sequences(docs: DataFrame, budget: int = 256, shards: int = 8) -> DataFrame:
    """(doc_id, shard, n_tokens, seq_id, offset_tokens): concat-and-chunk
    sequence packing — within each shard, documents concatenate in doc_id
    order and the token stream is cut into fixed ``budget``-token training
    sequences; a document belongs to the sequence where it STARTS (it may
    straddle the boundary — the packing used when pretraining corpora are
    chunked with document concatenation).

    Shape at scale: one window per shard (a running token sum in doc_id
    order — streaming, no buffering); ``shards`` is the packing parallelism
    knob: at 10^12 docs set it to the cluster's write parallelism and each
    shard packs independently. Deterministic: shard = doc_id % shards, so
    the layout is a pure function of the input relation.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            "doc_id",
            F.expr(f"pmod(doc_id, {shards})").alias("shard"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .withColumn("start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id", "shard", "n_tokens",
            F.expr(f"start div {budget}").alias("seq_id"),
            F.expr(f"start % {budget}").alias("offset_tokens"),
        )
    )


def docs_table(spark, sf_dir: str) -> DataFrame:
    """The full documents relation (dedup.docs_table keeps only id+text)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source"
    )
