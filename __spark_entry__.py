"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator (SURVEY.md §2) as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` carries the DuckDB
twin (mmgraphrag_spark.oracle). Column names are aliased identically on both
sides.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mmgraphrag_spark import api, oracle  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (nodes join edges stats) on sf0.001."""
    return api.edges(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_spans": api.spans,
        "kg_chunks": api.chunks,
        "kg_mentions": api.mentions,
        "kg_triples": api.triples,
        "kg_img_mentions": lambda s, d: api.img_mentions(s, d).select(
            "doc_id", "entity_name", "entity_type", "description", "source_id"
        ),
        "kg_img_triples": lambda s, d: api.img_triples(s, d).select(
            "doc_id", "subj", "obj", "description", "weight", "source_id", "order"
        ),
        "kg_nodes": api.nodes,
        "kg_edges": api.edges,
        "kg_merge_map": api.merge_map,
        "kg_clusters": api.clusters,  # spectral labels: non-SQL, rows-only check
        "kg_fused_nodes": api.fused_nodes,
        "kg_fused_edges": api.fused_edges,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_spans": oracle.q(oracle.spans_select()),
        "kg_chunks": oracle.q(oracle.chunks_select()),
        "kg_mentions": oracle.q(oracle.mentions_select()),
        "kg_triples": oracle.q(oracle.triples_select()),
        "kg_img_mentions": oracle.q(oracle.img_mentions_select()),
        "kg_img_triples": oracle.q(oracle.img_triples_select()),
        "kg_nodes": oracle.q(oracle.nodes_select()),
        "kg_edges": oracle.q(oracle.edges_select()),
        "kg_merge_map": oracle.q(oracle.merge_map_select()),
        "kg_fused_nodes": oracle.q(oracle.fused_nodes_select()),
        "kg_fused_edges": oracle.q(oracle.fused_edges_select()),
    }
