"""Query-side operators: J1 best-match join and local-query context assembly.

* J1 — image→chunk best-match: score each chunk of the doc by how many of the
  media context's word occurrences appear among the chunk's tokens, keep the
  argmax (reference ``find_chunk_for_image``,
  /root/reference/mmgraphrag/preprocessing.py:177-205 — an all-chunks scan
  with Python substring checks; re-expressed as an inverted-index equi-join +
  count + row_number, the scalable form of the same argmax).

* context assembly — the reference's local query path
  (/root/reference/mmgraphrag/query.py:313-469): seed entities from the query
  (T1; the vector top-k is swapped for deterministic token-match seeding so
  the oracle can replicate it — ann_topk covers the vector path separately),
  join node attrs + degrees (J7/A5), expand one hop (J8/U4), rank edges by
  (degree-rank desc, weight desc) (T2), truncate to a token budget with a
  running-sum window (T4, reference truncate_list_by_token_size
  base.py:187-214).

All pure column ops; the only shuffles are the two groupBys and the seed
join (broadcast — seeds are tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .canonicalize import degrees


def media_chunk_match(media: DataFrame, chunks: DataFrame) -> DataFrame:
    """J1: (doc_id, media_ref, chunk_id, score) — best chunk per media span.

    Ties break to the lowest chunk_order_index then chunk_id (deterministic).
    """
    ctx_words = media.select(
        "doc_id", "media_ref",
        F.posexplode(F.split("context", " ")).alias("pos", "tok"),
    )
    inv = chunks.select(
        "doc_id", "chunk_id", "chunk_order_index",
        F.explode(F.array_distinct(F.split("content", " "))).alias("tok"),
    )
    scored = (
        ctx_words.join(inv, ["doc_id", "tok"])
        .groupBy("doc_id", "media_ref", "chunk_id", "chunk_order_index")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    w = Window.partitionBy("media_ref").orderBy(
        F.desc("score"), F.asc("chunk_order_index"), F.asc("chunk_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "media_ref", "chunk_id", F.col("score").cast("long").alias("score"))
    )


def seed_entities(nodes: DataFrame, edges: DataFrame, query: str, k: int = 5) -> DataFrame:
    """T1/J7: top-k seed entities for a query string — entities named by a
    query token, ranked by (degree desc, name asc)."""
    toks = [t.upper() for t in query.split() if t]
    deg = degrees(edges)
    cand = nodes.filter(F.col("entity_name").isin(toks)).join(deg, "entity_name", "left")
    # unpartitioned window is deliberate and SAFE here (and in the other
    # qctx ranking/budget windows): its input is already filtered to the
    # per-query candidate set — bounded by the query's token count / seed
    # fan-out, never corpus-sized. Do NOT lift this pattern onto a big
    # relation; use the TakeOrdered/partitioned-window shapes instead.
    w = Window.orderBy(F.desc(F.coalesce("degree", F.lit(0))), F.asc("entity_name"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "entity_name", "entity_type",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def context_edges(
    nodes: DataFrame, edges: DataFrame, query: str,
    k: int = 5, token_budget: int = 4000,
) -> DataFrame:
    """J8 + T2 + T4: one-hop edges of the seeds, ranked by
    (deg(src)+deg(dst) desc, weight desc), truncated to a running
    description-length budget."""
    seeds = seed_entities(nodes, edges, query, k).select("entity_name")
    touching = edges.join(
        F.broadcast(seeds),
        (edges["src"] == seeds["entity_name"]) | (edges["dst"] == seeds["entity_name"]),
        "left_semi",
    )
    deg = degrees(edges)
    ranked = (
        touching.join(
            deg.select(F.col("entity_name").alias("src"), F.col("degree").alias("ds")), "src"
        )
        .join(
            deg.select(F.col("entity_name").alias("dst"), F.col("degree").alias("dd")), "dst"
        )
        .withColumn("edge_rank", (F.col("ds") + F.col("dd")).cast("long"))
    )
    w = Window.orderBy(
        F.desc("edge_rank"), F.desc("weight"), F.asc("src"), F.asc("dst")
    )
    return (
        ranked.withColumn(
            "running_tokens",
            F.sum(F.length("description")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("running_tokens") <= token_budget)
        .select(
            "src", "dst", "weight", "description", "edge_rank",
            F.col("running_tokens").cast("long").alias("running_tokens"),
        )
    )


def context_edges_ppr(
    nodes: DataFrame, edges: DataFrame, query: str,
    k: int = 5, token_budget: int = 4000,
) -> DataFrame:
    """PPR-ordered variant of :func:`context_edges` (cfg-gated upgrade, see
    config.qctx_ranking): identical seed set, one-hop candidate edges and
    running token budget, but edge_rank = personalized-PageRank mass
    ppr(src)+ppr(dst) instead of degree sum. Degree ordering (the
    reference's semantics, query.py) lets a globally-hubby but
    query-irrelevant entity outrank a locally-central one; PPR mass
    concentrates on entities reachable from the query's seeds, so the token
    budget is spent on query-proximate evidence. Exact-integer ranks
    (graphalgo.personalized_pagerank) keep the DuckDB twin hash-exact."""
    from .graphalgo import personalized_pagerank

    seeds = seed_entities(nodes, edges, query, k).select("entity_name")
    ppr = personalized_pagerank(nodes, edges, seeds)
    touching = edges.join(
        F.broadcast(seeds),
        (edges["src"] == seeds["entity_name"]) | (edges["dst"] == seeds["entity_name"]),
        "left_semi",
    )
    ranked = (
        touching.join(
            ppr.select(F.col("entity_name").alias("src"),
                       F.col("rank_scaled").alias("ps")), "src"
        )
        .join(
            ppr.select(F.col("entity_name").alias("dst"),
                       F.col("rank_scaled").alias("pd")), "dst"
        )
        .withColumn("edge_rank", (F.col("ps") + F.col("pd")).cast("long"))
    )
    # bounded candidate set (seed one-hop) — see seed_entities on why the
    # unpartitioned window is safe here
    w = Window.orderBy(
        F.desc("edge_rank"), F.desc("weight"), F.asc("src"), F.asc("dst")
    )
    return (
        ranked.withColumn(
            "running_tokens",
            F.sum(F.length("description")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("running_tokens") <= token_budget)
        .select(
            "src", "dst", "weight", "description", "edge_rank",
            F.col("running_tokens").cast("long").alias("running_tokens"),
        )
    )


def context_chunks(
    nodes: DataFrame, edges: DataFrame, chunks: DataFrame, query: str,
    k: int = 5, token_budget: int = 400,
) -> DataFrame:
    """T3/T4/P10: text units for the context — the seeds' source chunks,
    ranked by (chunk_order_index asc, relation_counts desc) where
    relation_counts = number of context edges citing the chunk (reference
    query.py:121-152), truncated to a running token budget."""
    seeds = seed_entities(nodes, edges, query, k).select("entity_name")
    seed_nodes = nodes.join(F.broadcast(seeds), "entity_name", "left_semi")
    seed_chunks = (
        seed_nodes.select(
            F.explode(F.split("source_id", "<SEP>")).alias("chunk_id")
        )
        .filter(F.col("chunk_id").startswith("chunk-"))  # P10
        .distinct()
    )
    touching = edges.join(
        F.broadcast(seeds),
        (edges["src"] == seeds["entity_name"]) | (edges["dst"] == seeds["entity_name"]),
        "left_semi",
    )
    edge_cites = (
        touching.select(F.explode(F.split("source_id", "<SEP>")).alias("chunk_id"))
        .groupBy("chunk_id")
        .agg(F.count(F.lit(1)).alias("relation_counts"))
    )
    ranked = (
        seed_chunks.join(chunks, "chunk_id")
        .join(edge_cites, "chunk_id", "left")
        .withColumn("relation_counts", F.coalesce("relation_counts", F.lit(0)).cast("long"))
    )
    w = Window.orderBy(
        F.asc("chunk_order_index"), F.desc("relation_counts"), F.asc("chunk_id")
    )
    return (
        ranked.withColumn(
            "running_tokens",
            F.sum("tokens").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("running_tokens") <= token_budget)
        .select(
            "chunk_id", "doc_id", "chunk_order_index",
            F.col("tokens").cast("long").alias("tokens"),
            "relation_counts",
            F.col("running_tokens").cast("long").alias("running_tokens"),
        )
    )


def top_media_entities(nodes: DataFrame, n: int = 3) -> DataFrame:
    """T6: first N ORI_IMG entities for the multimodal answer path
    (reference query.py:414-420, number_of_mmentities=3); deterministic
    order by entity_name."""
    return (
        nodes.filter(F.col("entity_type") == "ORI_IMG")
        .orderBy("entity_name")
        .limit(n)
        .select("entity_name", "entity_type", "source_id")
    )


def one_hop_entities(nodes: DataFrame, edges: DataFrame, query: str, k: int = 5) -> DataFrame:
    """J8/U2: distinct neighbor set of the seeds (incl. the seeds)."""
    seeds = seed_entities(nodes, edges, query, k).select("entity_name")
    touching = edges.join(
        F.broadcast(seeds),
        (edges["src"] == seeds["entity_name"]) | (edges["dst"] == seeds["entity_name"]),
        "left_semi",
    )
    hop = touching.select(F.explode(F.array("src", "dst")).alias("entity_name")).distinct()
    return hop.join(nodes, "entity_name").select(
        "entity_name", "entity_type"
    )


def seed_entities_vdb(
    nodes: DataFrame, edges: DataFrame, query: str, k: int = 5,
    threshold: float = 0.2, cfg=None,
) -> DataFrame:
    """J7 via the entity VDB (the reference's actual seeding path,
    query.py:327-340: entities_vdb.query(top_k) -> get_node + node_degree):
    thresholded vector top-k over name+description embeddings, then node
    attrs + degree join. rnk = the VDB ranking (not the degree re-sort; the
    reference keeps vdb order for node_datas)."""
    from ..config import DEFAULT
    from .entity_vdb import entity_vdb_topk

    hits = entity_vdb_topk(nodes, query, k=k, threshold=threshold, cfg=cfg or DEFAULT)
    deg = degrees(edges)
    return (
        hits.join(nodes.select("entity_name", "entity_type"), "entity_name")
        .join(deg, "entity_name", "left")
        .select(
            "entity_name", "entity_type",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# context rendering — the reference's actual query deliverable
# ---------------------------------------------------------------------------

def _enclose(v) -> str:
    """Reference enclose_string_with_quotes (base.py:216-224): numbers stay
    bare, strings are stripped of surrounding quotes and re-wrapped."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return str(v)
    s = str(v).strip().strip("'").strip('"')
    return f'"{s}"'


def list_of_list_to_csv(data: list[list]) -> str:
    """Reference list_of_list_to_csv (base.py:226-233): ',\\t'-joined cells."""
    return "\n".join(",\t".join(_enclose(c) for c in row) for row in data)


# The reference's exact section layout around the three CSV blocks
# (query.py:263-311, an indented f-string): wrapper pieces before/between/
# after the entities, relationships, and sources bodies. Shared with the
# DuckDB prompt oracle (oracle.qctx_prompt_sql) so the twin concatenates the
# identical bytes.
CONTEXT_WRAPPER = (
    "\n    -----Entities-----\n    ```csv\n    ",
    "\n    ```\n    -----Relationships-----\n    ```csv\n    ",
    "\n    ```\n    -----Sources-----\n    ```csv\n    ",
    "\n    ```\n    ",
)


def render_context(
    seeds: DataFrame, edges: DataFrame, chunks: DataFrame, chunk_table: DataFrame
) -> str:
    """T-group context assembly (reference query.py:263-311): three CSV
    blocks — entities (id, entity, type, description, rank), relationships
    (id, source, target, description, weight, rank), sources (id, content) —
    wrapped in the reference's exact section layout.

    Driver-side by design: the inputs are already budget-truncated context
    sets (tens of rows); this is the serialization boundary, not a bulk
    operator."""
    e, r, t = context_blocks(seeds, edges, chunks, chunk_table)
    w1, w2, w3, w4 = CONTEXT_WRAPPER
    return f"{w1}{e}{w2}{r}{w3}{t}{w4}"


def context_blocks(
    seeds: DataFrame, edges: DataFrame, chunks: DataFrame, chunk_table: DataFrame
) -> tuple[str, str, str]:
    """The three CSV blocks (entities, relationships, sources) separately —
    the answer-prompt assembler scrapes ORI_IMG rows from the entities block
    exactly like the reference does (query.py:414-421)."""
    node_rows = [["id", "entity", "type", "description", "rank"]]
    for i, r in enumerate(seeds.orderBy("rnk").collect()):
        node_rows.append([i, r.entity_name, r.entity_type, "UNKNOWN", r.degree])
    rel_rows = [["id", "source", "target", "description", "weight", "rank"]]
    ordered_edges = edges.orderBy(
        F.desc("edge_rank"), F.desc("weight"), F.asc("src"), F.asc("dst")
    )
    for i, r in enumerate(ordered_edges.collect()):
        rel_rows.append([i, r.src, r.dst, r.description, r.weight, r.edge_rank])
    text_rows = [["id", "content"]]
    content = {
        r.chunk_id: r.content
        for r in chunk_table.join(
            chunks.select("chunk_id"), "chunk_id", "left_semi"
        ).collect()
    }
    ordered_chunks = chunks.orderBy(
        F.asc("chunk_order_index"), F.desc("relation_counts"), F.asc("chunk_id")
    )
    for i, r in enumerate(ordered_chunks.collect()):
        text_rows.append([i, content.get(r.chunk_id, "")])
    return (
        list_of_list_to_csv(node_rows),
        list_of_list_to_csv(rel_rows),
        list_of_list_to_csv(text_rows),
    )
