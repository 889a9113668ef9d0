"""A1/A2 — entity & edge canonicalization (the merge/upsert group-bys).

Reference semantics (/root/reference/mmgraphrag/text2graph.py:136-272):

* node merge per entity_name: entity_type = **mode** (Counter order;
  we pin the tie-break to (count desc, entity_type asc) for cross-partition
  determinism, documented §4.2 of SURVEY.md); description = '<SEP>'-joined
  **sorted distinct**; source_id = '<SEP>'-joined distinct (we sort it too —
  the reference's set order is CPython-dict incidental, sorting is the only
  parallel-deterministic choice).
* edge merge per undirected (least,greatest) key: weight = sum, order = min
  (default 1), description/source_id as above.
* stub rule: edge endpoints missing from nodes get an '"UNKNOWN"'-typed node
  carrying the edge's source_id/description (text2graph.py:252-261).

Scale notes: one hash-shuffle each on entity_name / (subj,obj); all aggregates
(count, sum, min, collect_set) have map-side partial aggregation, so hub
entities (Zipf head) arrive at the reducer pre-combined per mapper. For
extreme skew the ``salted=True`` path does an explicit two-phase aggregate:
groupBy(key, salt) partials then groupBy(key) finals — the aggregates are all
commutative+associative (sum/min/set-union/count-sum) so the rewrite is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..config import GRAPH_FIELD_SEP, PipelineConfig

_SEP = GRAPH_FIELD_SEP


def summarize_description(col: Column, cfg: PipelineConfig) -> Column:
    """A1/A2 summarization branch (reference text2graph.py:70-112): a merged
    description whose whitespace-token count reaches ``summary_max_tokens``
    is replaced by a summary — there an LLM call, here the deterministic
    mock ``first summary_keep_tokens tokens + ' <SUMMARY n tokens>'`` (the
    DuckDB oracle computes the identical expression). Bounds hub-node
    descriptions, which otherwise grow linearly with corpus size (round-1
    measured ~270 KB single strings at the 50k-doc fixture).

    Pure conditional column — stays in whole-stage codegen; the LLM-backed
    variant is :func:`summarize_descriptions_udf`.
    """
    toks = F.split(col, " ")
    return F.when(
        F.size(toks) >= cfg.summary_max_tokens,
        F.concat(
            F.array_join(F.slice(toks, 1, cfg.summary_keep_tokens), " "),
            F.lit(" <SUMMARY "), F.size(toks).cast("string"), F.lit(" tokens>"),
        ),
    ).otherwise(col)


def summarize_descriptions_udf(
    df: DataFrame, summarize_fn=None, cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Production shape of the A1 summarizer: ONLY rows over the token
    threshold leave the JVM (filter -> Arrow-batched UDF -> union back), so
    the expensive model call touches the hub tail, not the corpus. Default
    ``summarize_fn`` is the deterministic mock (proven equal to
    :func:`summarize_description` in tests)."""
    from ..config import DEFAULT

    cfg = cfg or DEFAULT
    mx, keep = cfg.summary_max_tokens, cfg.summary_keep_tokens

    def mock(pdf):
        toks = pdf["description"].str.split(" ")
        n = toks.str.len()
        pdf = pdf.copy()
        pdf["description"] = (
            toks.str[:keep].str.join(" ") + " <SUMMARY " + n.astype(str) + " tokens>"
        )
        return pdf

    fn = summarize_fn or mock
    toks = F.split("description", " ")
    hot = df.filter(F.size(toks) >= mx)
    cold = df.filter(F.size(toks) < mx)
    schema = df.schema

    def run(batches):
        for pdf in batches:
            yield fn(pdf)

    return cold.unionByName(hot.mapInPandas(run, schema=schema))


def _mode_type(pairs: DataFrame, keys: list[str]) -> DataFrame:
    """Deterministic mode of entity_type per key: (count desc, type asc).

    min_by over the (-cnt, entity_type) struct replaces the former
    row_number window: an aggregate partial-combines map-side and needs no
    per-partition sort, and the ordering key is unique per row (it embeds
    entity_type), so the winner is identical to the window's rank-1 row.
    """
    cnt = pairs.groupBy(*keys, "entity_type").agg(F.count(F.lit(1)).alias("cnt"))
    return cnt.groupBy(*keys).agg(
        F.min_by(
            "entity_type", F.struct((-F.col("cnt")).alias("nc"), "entity_type")
        ).alias("entity_type")
    )


def build_nodes(
    mentions: DataFrame,
    salted: bool = False,
    buckets: int = 8,
    group_cols: list[str] | None = None,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """A1: mentions -> nodes(entity_name, entity_type, description, source_id).

    ``group_cols`` prepends extra grouping keys (e.g. a per-image graph id, the
    reference's one-graph-per-image model, img2graph.py:140-206): the merge
    then happens independently per group in the same single shuffle.
    ``cfg`` enables the A1 summarization branch (see summarize_description).
    """
    g = list(group_cols or [])
    keys = g + ["entity_name"]
    if salted:
        salt = F.pmod(F.xxhash64("description", "source_id"), F.lit(buckets))
        partial = (
            mentions.withColumn("salt", salt)
            .groupBy(*keys, "salt")
            .agg(
                F.collect_set("description").alias("ds"),
                F.collect_set("source_id").alias("ss"),
            )
        )
        agg = partial.groupBy(*keys).agg(
            F.array_join(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("ds")))), _SEP
            ).alias("description"),
            F.array_join(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("ss")))), _SEP
            ).alias("source_id"),
        )
    else:
        agg = mentions.groupBy(*keys).agg(
            F.array_join(F.array_sort(F.collect_set("description")), _SEP).alias(
                "description"
            ),
            F.array_join(F.array_sort(F.collect_set("source_id")), _SEP).alias(
                "source_id"
            ),
        )
    top = _mode_type(mentions.select(*keys, "entity_type"), keys)
    if cfg is not None:
        agg = agg.withColumn(
            "description", summarize_description(F.col("description"), cfg)
        )
    # both sides are already hash-partitioned by the group keys → co-located join
    return agg.join(top, keys).select(
        *g, "entity_name", "entity_type", "description", "source_id"
    )


def build_edges(
    triples: DataFrame,
    salted: bool = False,
    buckets: int = 8,
    group_cols: list[str] | None = None,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """A2: triples -> edges(src, dst, weight, description, source_id, order).

    Expects canonical (subj, obj) = (least, greatest) from the decoder.
    ``group_cols`` scopes the merge per group (per-image graphs); ``cfg``
    enables the A2 summarization branch (text2graph.py:258-262).
    """
    g = list(group_cols or [])
    t = triples.select(
        *g, F.col("subj").alias("src"), F.col("obj").alias("dst"),
        "weight", "description", "source_id", "order",
    )
    keys = g + ["src", "dst"]
    if salted:
        salt = F.pmod(F.xxhash64("source_id", "description"), F.lit(buckets))
        partial = (
            t.withColumn("salt", salt)
            .groupBy(*keys, "salt")
            .agg(
                F.sum("weight").alias("w"),
                F.min("order").alias("o"),
                F.collect_set("description").alias("ds"),
                F.collect_set("source_id").alias("ss"),
            )
        )
        out = partial.groupBy(*keys).agg(
            F.sum("w").alias("weight"),
            F.array_join(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("ds")))), _SEP
            ).alias("description"),
            F.array_join(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("ss")))), _SEP
            ).alias("source_id"),
            F.min("o").alias("order"),
        )
    else:
        out = t.groupBy(*keys).agg(
            F.sum("weight").alias("weight"),
            F.array_join(F.array_sort(F.collect_set("description")), _SEP).alias(
                "description"
            ),
            F.array_join(F.array_sort(F.collect_set("source_id")), _SEP).alias(
                "source_id"
            ),
            F.min("order").alias("order"),
        )
    if cfg is not None:
        out = out.withColumn(
            "description", summarize_description(F.col("description"), cfg)
        )
    return out


def add_stub_nodes(
    nodes: DataFrame, edges: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Stub rule: every edge endpoint exists as a node (text2graph.py:252-261).

    Missing endpoints become UNKNOWN-typed nodes carrying the edge's
    description/source_id (first edge by (src,dst) order for determinism).
    """
    g = list(group_cols or [])
    keys = g + ["entity_name"]
    endpoints = edges.select(
        *g, F.explode(F.array("src", "dst")).alias("entity_name"),
        "description", "source_id",
    )
    # first edge by (description, source_id) via min(struct(...)) — the
    # map-side-combinable twin of the former row_number window (one
    # candidate row per key leaves each mapper; no per-partition sort)
    missing = (
        endpoints.join(nodes.select(*keys), keys, "left_anti")
        .groupBy(*keys)
        .agg(F.min(F.struct("description", "source_id")).alias("s"))
        .select(
            *keys,
            F.lit("UNKNOWN").alias("entity_type"),
            F.col("s.description").alias("description"),
            F.col("s.source_id").alias("source_id"),
        )
    )
    return nodes.unionByName(missing.select(*keys, "entity_type", "description", "source_id"))


def degrees(edges: DataFrame) -> DataFrame:
    """A5: node degree from the undirected edge list."""
    return (
        edges.select(F.explode(F.array("src", "dst")).alias("entity_name"))
        .groupBy("entity_name")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
