"""M1 — deterministic surface-form embeddings, JVM-side.

The reference embeds entity text with a SentenceTransformer
(/root/reference/mmgraphrag/parameter.py:14-20, llm.py:12-18); this container
has no model weights, so the stand-in is a seeded hash embedding: dim k of
``embed(s)`` = scaled ``xxhash64(s || '#' || k)``, unit-normalized. Properties
that matter for fusion: deterministic across engines/partitions, equal strings
→ identical vectors (cosine 1), distinct strings → near-orthogonal in
expectation (verified for the corpus vocabulary in tests). Computed entirely
with built-in column functions — zero Python.

On a real cluster this module swaps for a ``predict_batch_udf`` /
``mapInPandas`` with a per-executor cached encoder; the schema
(array<double>) and downstream fusion code are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..config import DEFAULT, PipelineConfig


def hash_embedding(col: Column, dims: int = DEFAULT.embed_dims) -> Column:
    """array<double> unit vector derived from xxhash64(col || '#' || k)."""
    raw = F.array(*[
        (
            F.xxhash64(F.concat(col, F.lit(f"#{k}"))).cast("double")
            / F.lit(float(2**63))
        )
        for k in range(dims)
    ])
    norm = F.sqrt(F.aggregate(
        F.transform(raw, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    ))
    return F.transform(raw, lambda x: x / norm)


def with_embedding(
    df: DataFrame, text_col: str, out_col: str = "embedding",
    cfg: PipelineConfig = DEFAULT,
) -> DataFrame:
    return df.withColumn(out_col, hash_embedding(F.col(text_col), cfg.embed_dims))
