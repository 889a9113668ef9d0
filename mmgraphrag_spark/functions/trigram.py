"""Shared JVM-side signed char-trigram feature hashing.

Column-expression twin of fusion.trigram_vector (the Python encoder used
inside the fusion blocks) and of the DuckDB tri_vecs CTEs: gram list =
substr(s, i, 3) for i in range(max(len-2, 1)); bucket = md5[:4] hex % dims;
sign = parity of md5[4]. All exact int64 — identical numbers in Spark SQL,
DuckDB, and Python.

Everything here is built-in column functions (posexplode + md5 + conv) so the
embedding work stays inside whole-stage codegen and shuffles stay keyed —
no interpreted lambdas, no Python on the executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def gram_rows(df: DataFrame, key_cols: list[str], text_col: str, dims: int) -> DataFrame:
    """(*key_cols, bucket, sign): one row per char-3-gram of ``text_col``."""
    grams = df.select(
        *key_cols,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, greatest(length({text_col}) - 3, 0)),"
                f" i -> substring({text_col}, i + 1, 3))"
            )
        ).alias("_i", "gram"),
    )
    h = F.md5("gram")
    return grams.select(
        *key_cols,
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % dims).alias("bucket"),
        F.when(
            F.conv(F.substring(h, 5, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
        ).otherwise(F.lit(-1)).cast("long").alias("sign"),
    )


def sparse_vectors(df: DataFrame, key_cols: list[str], text_col: str, dims: int) -> DataFrame:
    """(*key_cols, bucket, v): sparse int trigram vector per key (zero-sum
    buckets kept — they contribute 0 to any dot/norm, same both engines)."""
    return (
        gram_rows(df, key_cols, text_col, dims)
        .groupBy(*key_cols, "bucket")
        .agg(F.sum("sign").alias("v"))
    )


def dense_vectors(df: DataFrame, key_cols: list[str], text_col: str, dims: int) -> DataFrame:
    """(*key_cols, vec array<long>[dims]): the dense form of
    :func:`sparse_vectors`, one aggregation per key (missing buckets 0).

    Same numbers as the sparse relation — vec[b] = sum of signs hashed to
    bucket b — but carried as ONE row per key, so consumers that need whole
    vectors (dot products against a handful of counterparts, per-block numpy
    math) attach them with a plain equi-join instead of a posting join plus
    a per-pair re-aggregation. Built as ``dims`` conditional sums in a
    SINGLE map-side-combined aggregation over the gram rows (dims is small
    and fixed — config trigram_dims), replacing the former
    sparse-groupBy → map-pivot shape that cost a second exchange.
    """
    return gram_rows(df, key_cols, text_col, dims).groupBy(*key_cols).agg(
        F.array(*[
            F.sum(
                F.when(F.col("bucket") == i, F.col("sign")).otherwise(F.lit(0))
            )
            for i in range(dims)
        ]).alias("vec")
    )
