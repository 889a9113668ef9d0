"""Checkpoint/lineage/resume semantics of the staged pipeline runner."""

from __future__ import annotations

import shutil

import pytest
from conftest import SF_TINY

from mmgraphrag_spark import api
from mmgraphrag_spark.plans.pipeline import Pipeline


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("pipe"))
    p = Pipeline(spark, SF_TINY, work)
    p.run(resume=False)
    return p


def test_all_stages_ran_and_checkpointed(pipe):
    for t in ["spans", "chunks", "extraction_raw",
              "mentions", "triples", "img_mentions", "img_triples",
              "nodes", "nodes_base", "edges", "fusion_blocks",
              "fused_nodes", "fused_edges"]:
        assert pipe._complete(t), t


def test_outputs_match_direct_api(spark, pipe):
    a = pipe.read("edges").toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = api.edges(spark, SF_TINY).toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert a.equals(b)
    # nodes too (api.nodes is the pre-stub relation == the pipeline's
    # nodes_base): hub entities cross the A1 summary_max_tokens threshold at
    # SF_TINY, so this pins the pipeline's cfg plumbing (summarization branch)
    a = (pipe.read("nodes_base").toPandas()
         .sort_values(["entity_name"]).reset_index(drop=True))
    b = (api.nodes(spark, SF_TINY).toPandas()
         .sort_values(["entity_name"]).reset_index(drop=True))
    assert a.equals(b)


def test_fused_checkpoints_match_full_recompute(spark, pipe):
    """The pipeline's fused stage uses the INCREMENTAL rewiring
    (fuse_*_incremental over the graph-stage checkpoints); it must equal the
    api's full-recompute fuse_graph bit-for-bit."""
    for table, fn, keys in (
        ("fused_nodes", api.fused_nodes, ["entity_name"]),
        ("fused_edges", api.fused_edges, ["src", "dst"]),
    ):
        a = (pipe.read(table, spread=False).toPandas()
             .sort_values(keys).reset_index(drop=True))
        b = fn(spark, SF_TINY).toPandas().sort_values(keys).reset_index(drop=True)
        assert a.equals(b), table


@pytest.mark.parametrize("strategy", ["incremental", "full"])
def test_fused_strategy_variants_match(spark, pipe, tmp_path_factory, strategy):
    """Both explicit cfg.fused_strategy values produce the same fused tables
    as the default 'auto' pipeline (which picks by measured merge-map blast
    radius) — the strategy is a physical-plan choice, never a semantic one."""
    import dataclasses

    from mmgraphrag_spark.config import DEFAULT

    work = str(tmp_path_factory.mktemp(f"pipe_{strategy}"))
    p = Pipeline(spark, SF_TINY, work,
                 cfg=dataclasses.replace(DEFAULT, fused_strategy=strategy))
    p.run(resume=False)
    for table, keys in (("fused_nodes", ["entity_name"]),
                        ("fused_edges", ["src", "dst"])):
        a = (p.read(table, spread=False).toPandas()
             .sort_values(keys).reset_index(drop=True))
        b = (pipe.read(table, spread=False).toPandas()
             .sort_values(keys).reset_index(drop=True))
        assert a.equals(b), table


def test_resume_skips_complete_stages(pipe):
    ran = pipe.run(resume=True)
    assert not any(ran.values())


def test_mid_pipeline_resume(spark, pipe):
    # simulate a crash after 'extract': later checkpoints lost
    before = pipe.lineage().filter("stage = 'spans'").count()
    shutil.rmtree(pipe._path("nodes"))
    shutil.rmtree(pipe._path("edges"))
    ran = pipe.run(resume=True)
    assert ran == {"spans": False, "chunks": False, "extract_raw": False,
                   "decode": False, "media": False,
                   "graph": True, "fusion": False, "fused_graph": False}
    # earlier stages were not recomputed: no new lineage rows for them
    after = pipe.lineage().filter("stage = 'spans'").count()
    assert after == before
    assert pipe._complete("edges")


def test_lineage_and_metrics_rows(pipe):
    lin = pipe.lineage().toPandas()
    assert set(lin["output"]) >= {"spans", "chunks", "mentions", "triples",
                                  "nodes", "edges"}
    assert (lin["rows_out"] > 0).all()
    met = pipe.metrics().toPandas()
    # per-partition rows exist for every stage output
    assert set(met["stage"]) >= {"spans", "chunks", "mentions", "triples"}
    got = met.groupby("stage")["rows"].sum()
    per_stage = lin.drop_duplicates("output").set_index("output")["rows_out"]
    for stage in ["spans", "chunks", "mentions", "triples"]:
        assert got[stage] == per_stage[stage]
    # the fused stage records which physical strategy "auto" resolved to
    fused_inputs = lin[lin["stage"] == "fused_graph"]["inputs"].iloc[0]
    assert "note:strategy=" in fused_inputs


def test_decode_checkpoints_omit_derived_source_id(spark, pipe):
    """The stored mentions/triples tables must NOT contain the derivable
    source_id column (it equals chunk_id; storing it costs ~20-28% of the
    tables' bytes — PLANS.md), while Pipeline.read rehydrates it."""
    for table in ("mentions", "triples"):
        stored = spark.read.parquet(f"{pipe.work_dir}/{table}")
        assert "source_id" not in stored.columns, table
        rehydrated = pipe.read(table, spread=False)
        assert "source_id" in rehydrated.columns, table
        assert rehydrated.filter("source_id <> chunk_id").count() == 0, table


def test_parallel_dag_equals_sequential(spark, tmp_path):
    """Concurrent stage submission must produce byte-identical tables to the
    sequential topo order (checkpoint edges make scheduling invisible)."""
    from mmgraphrag_spark.plans.pipeline import Pipeline

    p_par = Pipeline(spark, SF_TINY, str(tmp_path / "par"))
    p_seq = Pipeline(spark, SF_TINY, str(tmp_path / "seq"))
    ran_par = p_par.run(resume=False, parallel=True)
    ran_seq = p_seq.run(resume=False, parallel=False)
    assert ran_par == ran_seq
    for table in ["spans", "chunks", "mentions", "triples", "img_mentions",
                  "nodes", "edges", "fused_nodes", "fused_edges"]:
        a = p_par.read(table, spread=False)
        b = p_seq.read(table, spread=False)
        assert a.count() == b.count(), table
        assert a.exceptAll(b).count() == 0, table
        assert b.exceptAll(a).count() == 0, table


def test_checkpoint_format_orc_round_trips(spark, pipe, tmp_path):
    """The checkpoint layer is format-agnostic (the documented Iceberg swap
    is a writer/catalog knob, not a rewrite): the same pipeline run with
    checkpoint_format='orc' produces value-identical tables, per-partition
    footer metrics, resume markers, and a working fused-graph 'auto' row
    count — with zero parquet files among the data checkpoints."""
    from pathlib import Path

    p = Pipeline(spark, SF_TINY, str(tmp_path / "orc"), checkpoint_format="orc")
    p.run(resume=False)
    for table in ["spans", "chunks", "mentions", "edges", "fused_nodes"]:
        a = p.read(table, spread=False)
        b = pipe.read(table, spread=False)
        assert a.exceptAll(b).count() == 0, table
        assert b.exceptAll(a).count() == 0, table
        files = list(Path(p.work_dir, table).iterdir())
        assert any(f.suffix == ".orc" for f in files), table
        assert not any(f.suffix == ".parquet" for f in files), table
        # footer metrics (no data scan) agree with the real count
        assert p._nrows(table) == b.count(), table
    # resume still recognizes completed stages; bookkeeping stays parquet
    assert not any(p.run(resume=True).values())
    assert p.lineage().count() > 0 and p.metrics().count() > 0
