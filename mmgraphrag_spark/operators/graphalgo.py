"""Graph analytics over the fused knowledge graph.

Beyond-reference operators: the reference ranks entities only by degree
(`/root/reference/mmgraphrag/query.py` context ordering); a KG built at
corpus scale additionally wants a global importance measure for entity
retrieval, context budgeting, and hub detection. PageRank is the standard
one, and — done in fixed-point integer arithmetic — it is exactly
reproducible, so the driver query carries a full DuckDB value-hash oracle
(unrolled iteration CTEs) instead of a rows-only check.

Scale shape (the classic distributed PageRank): the symmetrized
edge+degree relation is computed ONCE and reused every iteration; each
iteration is one equi-join on the rank key and one map-side-combined
aggregation on the destination key — shuffle volume per iteration is
O(|E|), independent of iteration count, and hub skew is defused by the
partial aggregation (a hub's contributions combine per partition before
the exchange). Iterations are a fixed small count (default 5), so the
lineage stays bounded without checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rank fixed-point scale: 10^9 per node keeps total mass for 10^5-node
# graphs around 10^14, far from int64 overflow even after the ×damping
SCALE = 1_000_000_000


def symmetric_edges(edges: DataFrame) -> DataFrame:
    """(u, v): the undirected fused edge set in both directions, distinct.

    The fused graph stores one row per undirected pair; PageRank walks both
    ways. UNION set-semantics on both sides of the oracle makes double-
    stored pairs (if any upstream produced them) harmless.
    """
    return (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """(entity_name, rank_scaled): fixed-point PageRank over the fused graph.

    Exact integer contract (bit-reproducible, any partitioning / any row
    order — integer sums are associative-commutative):

    * rank_0(v) = ``scale`` for every fused node;
    * contrib_i(v) = Σ_{u→v} (rank_i(u) div deg(u));
    * rank_{i+1}(v) = (100-d)·scale div 100 + (d · contrib_i(v)) div 100
      with d = ``damping_pct``; missing contrib coalesces to 0.

    Isolated nodes keep the teleport mass; there is no dangling-mass
    redistribution (symmetrized edges ⇒ the only rank-sinks are isolated
    nodes, and both oracle and engine share the semantics). The DuckDB twin
    (`oracle.pagerank_select`) unrolls the same recurrence as chained CTEs.
    """
    sym = symmetric_edges(edges)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # edge+degree relation: built once, reused by every iteration's join
    ed = sym.join(deg, "u")
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.select(
        F.col("entity_name").alias("name"), F.lit(scale).cast("long").alias("rank")
    )
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("name", "u"), "u")
            .select("v", F.expr("rank div deg").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            ranks.join(contrib.withColumnRenamed("v", "name"), "name", "left")
            .select(
                "name",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct} * coalesce(contrib, 0L)) div 100"
                    )
                ).alias("rank"),
            )
        )
    return ranks.select(
        F.col("name").alias("entity_name"), F.col("rank").alias("rank_scaled")
    )
