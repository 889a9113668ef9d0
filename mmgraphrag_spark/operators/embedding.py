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


def with_embedding(
    df: DataFrame, text_col: str, out_col: str = "embedding",
    cfg: PipelineConfig = DEFAULT,
) -> DataFrame:
    """Attach the unit hash-embedding as ``out_col``.

    Three explicit projections (components → norm → normalized array) keep
    every expression flat and codegen'd, each evaluated once: the earlier
    single-Column form used ``transform``/``aggregate`` lambdas, which run
    interpreted (no whole-stage codegen) and were stack-sampled as ~30× the
    cost of the fusion eigendecompositions they feed.
    """
    dims = cfg.embed_dims
    col = F.col(text_col)
    comps = df.select(
        "*",
        *[
            (
                F.xxhash64(F.concat(col, F.lit(f"#{k}"))).cast("double")
                / F.lit(float(2**63))
            ).alias(f"_e{k}")
            for k in range(dims)
        ],
    )
    sq = None
    for k in range(dims):
        term = F.col(f"_e{k}") * F.col(f"_e{k}")
        sq = term if sq is None else sq + term
    normed = comps.withColumn("_norm", F.sqrt(sq))
    return normed.select(
        *df.columns,
        F.array(*[F.col(f"_e{k}") / F.col("_norm") for k in range(dims)]).alias(out_col),
    )


def hash_embedding(col: Column, dims: int = DEFAULT.embed_dims) -> Column:
    """Single-Column form (same values as with_embedding; lambda-based, so
    interpreted — use only off the hot path / in tests)."""
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
