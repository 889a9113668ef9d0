"""Staged KG-construction pipeline with checkpoints, lineage, metrics, resume.

Replaces the reference's skip-if-file-exists resume (dict-of-JSON rewrites per
stage, /root/reference/mmgraphrag/mmgraphrag.py:131-143, fusion.py:815-817)
with table-per-stage checkpoints:

* every stage writes its output as a parquet table under ``work_dir``
  (the layout is the Iceberg-table layout; the sandbox has no Iceberg runtime
  jar, so the parquet directory + _SUCCESS marker stands in — swap the writer
  for ``df.writeTo(...)`` on a cluster with an Iceberg catalog);
* every stage appends a **lineage** row (stage, run_id, rows_out, wall_ms,
  started_at, inputs) and per-partition **metrics** rows
  (stage, partition_id, rows) — the north_rule observability surface;
* ``run(resume=True)`` skips any stage whose outputs are complete, so a
  killed run relaunches mid-pipeline (tested in tests/test_pipeline.py).

DAG (all edges are parquet checkpoints):

    documents.parquet -> spans -> chunks -> extract{mentions,triples}
                          |                        \\
                          +-> media{img_mentions,img_triples} -> graph{nodes,edges}
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT, PipelineConfig
from ..operators import canonicalize as canon
from ..operators import chunker, extractor, fusion, media
from .. import synth


@dataclass
class Pipeline:
    spark: SparkSession
    sf_dir: str
    work_dir: str
    cfg: PipelineConfig = field(default_factory=lambda: DEFAULT)
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])

    # ---- storage helpers ----------------------------------------------------

    def _path(self, table: str) -> str:
        return str(Path(self.work_dir) / table)

    def _complete(self, table: str) -> bool:
        return (Path(self._path(table)) / "_SUCCESS").exists()

    def read(self, table: str, spread: bool = True) -> DataFrame:
        """Read a checkpoint, restoring compute parallelism.

        A checkpoint's file layout reflects its writer (AQE coalesces small
        shuffle outputs down to one file), not the parallelism the *next*
        stage needs — naively scanning a small checkpoint hands the whole
        downstream stage to one task (measured: a 28 s single-task extract
        over 10k chunks). If the scan yields fewer partitions than the
        cluster's default parallelism, redistribute. At production scale the
        scan already yields thousands of partitions and this is a no-op.
        """
        df = self.spark.read.parquet(self._path(table))
        if spread:
            want = self.spark.sparkContext.defaultParallelism
            if df.rdd.getNumPartitions() < want:
                df = df.repartition(want)
        return df

    def _write(self, df: DataFrame, table: str) -> int:
        """Write checkpoint + per-partition metrics; return row count.

        Per-partition rows come from the parquet FOOTERS of the files the
        write just produced (one file per writer task) — a driver-side
        metadata read, not a second data scan (the earlier rescan doubled
        stage IO; at 100 TB that is the difference between 1× and 2× the
        job's read volume).
        """
        df.write.mode("overwrite").parquet(self._path(table))
        import pyarrow.parquet as pq

        files = sorted(Path(self._path(table)).glob("*.parquet"))
        per_part = [
            (i, pq.ParquetFile(str(f)).metadata.num_rows, table, self.run_id)
            for i, f in enumerate(files)
        ] or [(0, 0, table, self.run_id)]
        self.spark.createDataFrame(
            per_part, "partition_id int, rows long, stage string, run_id string"
        ).coalesce(1).write.mode("append").parquet(self._path("_metrics"))
        return sum(n for _, n, _, _ in per_part)

    def _log_lineage(self, stage: str, outputs: dict[str, int],
                     inputs: list[str], wall_ms: int) -> None:
        rows = [
            (self.run_id, stage, table, n, ",".join(inputs), wall_ms,
             time.strftime("%Y-%m-%dT%H:%M:%S"))
            for table, n in outputs.items()
        ]
        self.spark.createDataFrame(
            rows,
            "run_id string, stage string, output string, rows_out long,"
            " inputs string, wall_ms long, started_at string",
        ).write.mode("append").parquet(self._path("_lineage"))

    def lineage(self) -> DataFrame:
        return self.read("_lineage")

    def metrics(self) -> DataFrame:
        return self.read("_metrics")

    # ---- stages -------------------------------------------------------------

    def _stage(self, name: str, inputs: list[str], outputs: list[str],
               fn, resume: bool) -> bool:
        """Run one stage unless all outputs are complete. Returns ran?"""
        if resume and all(self._complete(t) for t in outputs):
            return False
        t0 = time.perf_counter()
        produced = fn()  # dict[table -> DataFrame]
        cleanup = produced.pop("__cleanup__", None)
        counts = {t: self._write(df, t) for t, df in produced.items()}
        if cleanup is not None:
            cleanup()
        self._log_lineage(name, counts, inputs, int((time.perf_counter() - t0) * 1000))
        return True

    def run(self, resume: bool = True) -> dict[str, bool]:
        ran: dict[str, bool] = {}
        cfg = self.cfg

        ran["spans"] = self._stage(
            "spans", [f"{self.sf_dir}/documents.parquet"], ["spans"],
            lambda: {"spans": synth.flat_spans(self.spark, self.sf_dir, cfg)},
            resume,
        )

        ran["chunks"] = self._stage(
            "chunks", ["spans"], ["chunks"],
            lambda: {"chunks": chunker.chunk_docs(synth.nest_spans(self.read("spans")), cfg)},
            resume,
        )

        # raw grammar strings get their own checkpoint: (a) the expensive
        # Python stage (LLM in production) runs exactly once even though two
        # outputs derive from it, (b) it doubles as the extraction journal /
        # response cache (reference E6 text2graph.py:318-319, J10 llm.py:34-49)
        ran["extract_raw"] = self._stage(
            "extract_raw", ["chunks"], ["extraction_raw"],
            lambda: {"extraction_raw": extractor.extract_raw(self.read("chunks"), cfg=cfg)},
            resume,
        )

        # mentions and triples decode from ONE parse: the exploded-fields
        # relation is persisted in executor memory for the stage's two writes
        # (materializing it to parquet was measured worse — a 3.9M-row
        # array<string> table at the 50k fixture; re-parsing twice was the
        # round-1 shape and wasted a full regex pass over every record)
        def _decode():
            raw = self.read("extraction_raw")
            parsed = extractor.parse_records(raw).persist()
            return {
                "mentions": extractor.decode_mentions(parsed),
                "triples": extractor.decode_triples(parsed),
                "__cleanup__": lambda: parsed.unpersist(),
            }

        ran["decode"] = self._stage(
            "decode", ["extraction_raw"], ["mentions", "triples"], _decode, resume
        )

        def _media():
            med = media.media_spans(self.read("spans"))
            return {
                "img_mentions": media.image_mentions(med, cfg),
                "img_triples": media.image_triples(med, cfg),
            }

        ran["media"] = self._stage(
            "media", ["spans"], ["img_mentions", "img_triples"], _media, resume
        )

        def _graph():
            cols_m = ["entity_name", "entity_type", "description", "source_id"]
            cols_t = ["subj", "obj", "description", "weight", "source_id", "order"]
            all_m = (
                self.read("mentions").select(cols_m)
                .unionByName(self.read("img_mentions").select(cols_m))
            )
            all_t = (
                self.read("triples").select(cols_t)
                .unionByName(self.read("img_triples").select(cols_t))
            )
            nodes = canon.build_nodes(all_m)
            edges = canon.build_edges(all_t)
            return {"nodes": canon.add_stub_nodes(nodes, edges), "edges": edges}

        ran["graph"] = self._stage(
            "graph", ["mentions", "triples", "img_mentions", "img_triples"],
            ["nodes", "edges"], _graph, resume,
        )

        def _fusion():
            sp = self.read("spans")
            med = media.media_spans(sp)
            return {
                "fusion_blocks": fusion.fusion_blocks(
                    sp, med, self.read("img_mentions"), cfg
                )
            }

        ran["fusion"] = self._stage(
            "fusion", ["spans", "img_mentions"], ["fusion_blocks"], _fusion, resume
        )

        def _fused_graph():
            cols_m = ["entity_name", "entity_type", "description", "source_id"]
            cols_t = ["subj", "obj", "description", "weight", "source_id", "order"]
            all_m = (
                self.read("mentions").select(cols_m)
                .unionByName(self.read("img_mentions").select(cols_m))
            )
            all_t = (
                self.read("triples").select(cols_t)
                .unionByName(self.read("img_triples").select(cols_t))
            )
            mm = fusion.merge_map_from_blocks(self.read("fusion_blocks", spread=False))
            nodes, edges = fusion.fuse_graph(all_m, all_t, mm)
            return {"fused_nodes": nodes, "fused_edges": edges}

        ran["fused_graph"] = self._stage(
            "fused_graph",
            ["mentions", "triples", "img_mentions", "img_triples", "fusion_blocks"],
            ["fused_nodes", "fused_edges"], _fused_graph, resume,
        )
        return ran
