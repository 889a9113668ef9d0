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

import os
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
    # Alternative spans front end: None = the driver-table derivation
    # (documents.parquet -> synth spans). A (kind, path) pair swaps in a
    # real ingestion source for the spans stage — everything downstream is
    # unchanged (the whole engine consumes the one spans relation):
    #   ("mineru", ".../auto/*_content_list.json")  sources/mineru.py
    #   ("mineru-pdf", ".../*.pdf")                  magic-pdf shell-out first
    #   ("docx",   ".../*.docx")                    sources/docx.py
    #   ("pdf",    ".../*.pdf")                     sources/pdf.py
    source: tuple[str, str] | None = None
    # Checkpoint table format. The engine is format-agnostic: every stage
    # writes/reads through DataFrameWriter/Reader.format(...), so the
    # documented Iceberg swap is this knob plus a catalog (writeTo on a
    # cluster with the runtime jar); "orc" proves the abstraction with a
    # second built-in columnar format (tests/test_pipeline.py). The
    # driver-side lineage/metrics bookkeeping stays parquet (engine-internal
    # metadata, written with pyarrow, no executor involvement).
    checkpoint_format: str = "parquet"
    _metrics_buf: list = field(default_factory=list, repr=False)
    _lineage_buf: list = field(default_factory=list, repr=False)

    def _source_spans(self) -> DataFrame:
        kind, path = self.source
        if kind == "mineru":
            from ..sources import mineru

            return mineru.content_list_spans(
                mineru.read_content_lists(self.spark, path)
            )
        if kind == "mineru-pdf":
            # raw PDFs through the magic-pdf shell-out front half (the
            # reference's own MinerU invocation), then the content lists
            from ..sources import mineru

            lists = mineru.mineru_convert(path, self.work_dir + "/_mineru")
            return mineru.content_list_spans(
                mineru.read_content_lists(self.spark, lists)
            )
        if kind == "docx":
            from ..sources import docx

            return docx.docx_spans(self.spark, path)
        if kind == "pdf":
            from ..sources import pdf

            return pdf.pdf_spans(self.spark, path)
        raise ValueError(f"unknown source kind: {kind!r}")

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
        df = self.spark.read.format(self.checkpoint_format).load(self._path(table))
        # rehydrate columns the writer deliberately did not store because
        # they are derivable (see _decode): a projection at scan time costs
        # nothing, the stored bytes were real
        if table in ("mentions", "triples") and "source_id" not in df.columns:
            df = df.withColumn("source_id", F.col("chunk_id"))
        if spread:
            want = self.spark.sparkContext.defaultParallelism
            if df.rdd.getNumPartitions() < want:
                df = df.repartition(want)
        return df

    def _nrows(self, table: str) -> int:
        """Row count of a written checkpoint from its parquet footers —
        driver-side metadata only, no Spark job, no data scan, when the
        work_dir is a local filesystem. On a remote work_dir (hdfs://,
        s3a://, the documented Iceberg swap) the local glob sees nothing, so
        fall back to a metadata-only Spark count over the checkpoint (parquet
        footer aggregation, no column data read) instead of silently
        returning 0 — a zero here would defeat the fused-graph 'auto'
        routing by making every merge map look dense."""
        per_part = self._footer_rows(table)
        if per_part is not None:
            return sum(per_part)
        return (
            self.spark.read.format(self.checkpoint_format)
            .load(self._path(table)).count()
        )

    def _footer_rows(self, table: str) -> list[int] | None:
        """Per-file row counts from checkpoint file FOOTERS (driver-side
        metadata, no data scan) — parquet via pyarrow.parquet, orc via
        pyarrow.orc; None when the work_dir is remote (no local files) or
        the format has no footer reader here (callers fall back to a
        metadata-only Spark count)."""
        ext = "orc" if self.checkpoint_format == "orc" else "parquet"
        files = sorted(Path(self._path(table)).glob(f"*.{ext}"))
        if not files:
            return None
        if self.checkpoint_format == "orc":
            import pyarrow.orc as po

            return [po.ORCFile(str(f)).nrows for f in files]
        import pyarrow.parquet as pq

        return [pq.ParquetFile(str(f)).metadata.num_rows for f in files]

    def _write(self, df: DataFrame, table: str) -> int:
        """Write checkpoint + per-partition metrics; return row count.

        Per-partition rows come from the parquet FOOTERS of the files the
        write just produced (one file per writer task) — a driver-side
        metadata read, not a second data scan (the earlier rescan doubled
        stage IO; at 100 TB that is the difference between 1× and 2× the
        job's read volume).
        """
        (df.write.mode("overwrite").format(self.checkpoint_format)
         .save(self._path(table)))
        rows = self._footer_rows(table)
        if rows is None:
            # remote work_dir (hdfs://, s3a://, Iceberg swap): no local
            # footers — mirror _nrows' metadata-only Spark count rather than
            # silently recording 0 (a zero row count here would both corrupt
            # the metrics table and defeat dense-vs-sparse fused-graph
            # routing downstream); partition granularity is lost, the total
            # is not
            rows = [
                self.spark.read.format(self.checkpoint_format)
                .load(self._path(table)).count()
            ]
        per_part = [(i, n, table, self.run_id) for i, n in enumerate(rows)]
        self._metrics_buf.extend(per_part)
        return sum(n for _, n, _, _ in per_part)

    def _log_lineage(self, stage: str, outputs: dict[str, int],
                     inputs: list[str], wall_ms: int) -> None:
        self._lineage_buf.extend(
            (self.run_id, stage, table, n, ",".join(inputs), wall_ms,
             time.strftime("%Y-%m-%dT%H:%M:%S"))
            for table, n in outputs.items()
        )

    # lineage/metrics are driver-side metadata (a few KB per run): buffered
    # and flushed as ONE pyarrow file per table per run. The earlier
    # createDataFrame(...).coalesce(1).write per stage cost a single-task
    # Spark job each — measured 4-6 s apiece on this host, ~60 s of serial
    # wall across the 8-stage pipeline, the dominant anti-scaling term.
    def _flush_meta(self) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if self._metrics_buf:
            t = pa.table(
                dict(zip(("partition_id", "rows", "stage", "run_id"),
                         zip(*self._metrics_buf))),
                schema=pa.schema([
                    ("partition_id", pa.int32()), ("rows", pa.int64()),
                    ("stage", pa.string()), ("run_id", pa.string()),
                ]),
            )
            d = Path(self._path("_metrics")); d.mkdir(parents=True, exist_ok=True)
            pq.write_table(t, d / f"part-{self.run_id}-{uuid.uuid4().hex[:8]}.parquet")
            self._metrics_buf.clear()
        if self._lineage_buf:
            t = pa.table(
                dict(zip(
                    ("run_id", "stage", "output", "rows_out", "inputs",
                     "wall_ms", "started_at"),
                    zip(*self._lineage_buf))),
                schema=pa.schema([
                    ("run_id", pa.string()), ("stage", pa.string()),
                    ("output", pa.string()), ("rows_out", pa.int64()),
                    ("inputs", pa.string()), ("wall_ms", pa.int64()),
                    ("started_at", pa.string()),
                ]),
            )
            d = Path(self._path("_lineage")); d.mkdir(parents=True, exist_ok=True)
            pq.write_table(t, d / f"part-{self.run_id}-{uuid.uuid4().hex[:8]}.parquet")
            self._lineage_buf.clear()

    def lineage(self) -> DataFrame:
        self._flush_meta()
        # bookkeeping is always parquet (pyarrow-written), independent of
        # checkpoint_format
        return self.spark.read.parquet(self._path("_lineage"))

    def metrics(self) -> DataFrame:
        self._flush_meta()
        return self.spark.read.parquet(self._path("_metrics"))

    # ---- stages -------------------------------------------------------------

    def _stage(self, name: str, inputs: list[str], outputs: list[str],
               fn, resume: bool) -> bool:
        """Run one stage unless all outputs are complete. Returns ran?"""
        if resume and all(self._complete(t) for t in outputs):
            return False
        t0 = time.perf_counter()
        self.spark.sparkContext.setJobDescription(f"stage:{name}")
        produced = fn()  # dict[table -> DataFrame | callable -> DataFrame]
        cleanup = produced.pop("__cleanup__", None)
        # "__note__": free-form physical-plan annotation (e.g. which fused
        # strategy "auto" resolved to) — recorded with the lineage inputs so
        # a production run's choices are auditable after the fact
        note = produced.pop("__note__", None)
        if note:
            inputs = [*inputs, f"note:{note}"]
        # Plain DataFrame outputs are INDEPENDENT jobs: submit them from a
        # small thread pool so the second write's tasks back-fill executors
        # freed by the first write's straggler tail (a shared persisted
        # subtree — e.g. decode's parsed cache — is computed once either
        # way: the block manager's per-block locks make the loser wait,
        # not recompute). A callable value is resolved only after EVERY
        # plain output has been written, in dict order — lets a later
        # output derive from an earlier output's checkpoint instead of
        # recomputing its plan.
        plain = [(t, df) for t, df in produced.items() if not callable(df)]
        derived = [(t, df) for t, df in produced.items() if callable(df)]
        counts: dict[str, int] = {}
        if len(plain) > 1:
            import concurrent.futures as cf

            def _w(t, df, desc=f"stage:{name}"):
                self.spark.sparkContext.setJobDescription(desc)
                return t, self._write(df, t)

            with cf.ThreadPoolExecutor(max_workers=len(plain)) as pool:
                futs = [pool.submit(_w, t, df) for t, df in plain]
                for fut in futs:
                    t, n = fut.result()  # re-raises
                    counts[t] = n
        else:
            for t, df in plain:
                counts[t] = self._write(df, t)
        for t, df in derived:
            counts[t] = self._write(df(), t)
        if cleanup is not None:
            cleanup()
        self._log_lineage(name, counts, inputs, int((time.perf_counter() - t0) * 1000))
        return True

    def run(self, resume: bool = True, parallel: bool = True) -> dict[str, bool]:
        """Execute the stage DAG.

        ``parallel=True`` submits independent stages concurrently from worker
        threads (Spark's scheduler interleaves their jobs across the same
        executors — the standard way to keep a cluster busy through stage
        tails; e.g. the media/fusion branch overlaps the chunk/extract/decode
        chain). Checkpoint edges make this safe: a stage only starts when
        every dependency stage has COMMITTED its parquet outputs.
        """
        cfg = self.cfg

        def _spans():
            if self.source is not None:
                return {"spans": self._source_spans()}
            # source table may be a single small file (one scan split) while
            # the explode multiplies rows ~5x — spread the scan up to compute
            # parallelism so the span derivation + write use every core.
            # No-op at production scale (scans already yield many splits).
            docs = self.spark.read.parquet(f"{self.sf_dir}/documents.parquet")
            want = self.spark.sparkContext.defaultParallelism
            if docs.rdd.getNumPartitions() < want:
                docs = docs.repartition(want)
            return {"spans": synth.spans_from_docs(docs, cfg)}

        def _chunks():
            return {"chunks": chunker.chunk_flat_spans(self.read("spans"), cfg)}

        # raw grammar strings get their own checkpoint: (a) the expensive
        # Python stage (LLM in production) runs exactly once even though two
        # outputs derive from it, (b) it doubles as the extraction journal /
        # response cache (reference E6 text2graph.py:318-319, J10 llm.py:34-49)
        def _extract_raw():
            return {"extraction_raw": extractor.extract_raw(self.read("chunks"), cfg=cfg)}

        # mentions and triples decode from ONE parse: the exploded-fields
        # relation is persisted in executor memory for the stage's two writes
        # (materializing it to parquet was measured worse — a 3.9M-row
        # array<string> table at the 50k fixture; re-parsing twice was the
        # round-1 shape and wasted a full regex pass over every record)
        def _decode():
            raw = self.read("extraction_raw")
            parsed = extractor.parse_records(raw).persist()
            # source_id == chunk_id for every text-decoded row (the decoder
            # attaches it as a copy) — store the derived column NOWHERE:
            # dropping it cuts ~20% of these tables' checkpoint bytes
            # (md5-entropy strings defeat columnar compression), and
            # Pipeline.read rehydrates it for free at scan time. The media
            # tables keep their own source_id (not derivable there).
            return {
                "mentions": extractor.decode_mentions(parsed).drop("source_id"),
                "triples": extractor.decode_triples(parsed).drop("source_id"),
                "__cleanup__": lambda: parsed.unpersist(),
            }

        def _media():
            med = media.media_spans(self.read("spans"))
            # the two outputs share the scene-mention and object-detection
            # subtrees (each carries its own distinct-exchange): persist both
            # for the stage's writes so the caption explode + dedup runs once
            # per relation instead of once per consuming output (3x for
            # detect_objects: mentions, containment members, alignment)
            scene = media.scene_mentions(med, cfg).persist()
            objs = media.detect_objects(med, cfg).persist()
            return {
                "img_mentions": media.image_mentions(
                    med, cfg, scene=scene, objects=objs
                ),
                "img_triples": media.image_triples(
                    med, cfg, scene=scene, objects=objs
                ),
                "__cleanup__": lambda: (scene.unpersist(), objs.unpersist()),
            }

        def _graph():
            cols_m = ["entity_name", "entity_type", "description", "source_id"]
            cols_t = ["subj", "obj", "description", "weight", "source_id", "order"]
            # spread=False: these reads feed straight into keyed aggregations
            # (build_edges/build_nodes), which re-exchange on their group
            # keys anyway — a round-robin repartition first would shuffle
            # the full mention/triple payload twice for no extra map
            # parallelism beyond the scan's own splits (A/B at the 100k-doc
            # fixture: see OPTIMIZATION_r06.md)
            all_m = (
                self.read("mentions", spread=False).select(cols_m)
                .unionByName(self.read("img_mentions", spread=False).select(cols_m))
            )
            all_t = (
                self.read("triples", spread=False).select(cols_t)
                .unionByName(self.read("img_triples", spread=False).select(cols_t))
            )
            # nodes' stub rule consumes edges, so naively the edges
            # aggregation (the stage's biggest groupBy over the triples
            # relation) runs in BOTH writes. Write edges first and derive
            # nodes from the CHECKPOINT — zero recompute, zero cache memory
            # (at 100 TB, re-aggregating the triple relation twice is the
            # difference between 1x and 2x the stage's shuffle volume).
            # nodes_base (pre-stub) is checkpointed separately: the fused
            # stage's incremental rewiring passes untouched base rows through
            # unchanged, but stub rows derive from edges and must be re-run
            # against the FUSED edges — so the stub-free relation is the
            # reusable one. It is a tiny table (one row per entity).
            return {
                "edges": canon.build_edges(all_t, cfg=cfg),
                "nodes_base": canon.build_nodes(all_m, cfg=cfg),
                "nodes": lambda: canon.add_stub_nodes(
                    self.read("nodes_base", spread=False),
                    self.read("edges", spread=False),
                ),
            }

        def _fusion():
            sp = self.read("spans")
            med = media.media_spans(sp)
            return {
                "fusion_blocks": fusion.fusion_blocks(
                    sp, med, self.read("img_mentions"), cfg
                )
            }

        def _fused_graph():
            cols_m = ["entity_name", "entity_type", "description", "source_id"]
            cols_t = ["subj", "obj", "description", "weight", "source_id", "order"]
            # spread=False as in _graph: the rewiring is broadcast joins
            # (narrow) and both strategies end in keyed aggregations
            all_m = (
                self.read("mentions", spread=False).select(cols_m)
                .unionByName(self.read("img_mentions", spread=False).select(cols_m))
            )
            all_t = (
                self.read("triples", spread=False).select(cols_t)
                .unionByName(self.read("img_triples", spread=False).select(cols_t))
            )
            mm = fusion.merge_map_from_blocks(
                self.read("fusion_blocks", spread=False)
            ).persist()
            # INCREMENTAL rewiring: the graph stage already aggregated the
            # full mention/triple relations; only keys the merge map touches
            # re-aggregate from raw (fusion.fuse_edges_incremental docstring
            # has the exactness argument). Cold rows pass through from the
            # edges / nodes_base checkpoints with no exchange; at production
            # scale the fused stage's shuffle is proportional to the merge
            # map's blast radius, not to the corpus. Stubs re-derive from
            # the fused_edges CHECKPOINT (same dedup as the graph stage).
            # "full" re-runs A1/A2 over the whole rewired relations — the
            # bit-exact fallback (and the A/B baseline, tools/stagebench.py).
            # "auto" (default) decides from the measured blast radius: the
            # merge map is tiny and already persisted, so counting dirty
            # names is O(|mm|); the entity-name count comes from the
            # nodes_base checkpoint footers (driver-side metadata, no scan).
            strategy = cfg.fused_strategy
            if strategy not in ("auto", "incremental", "full"):
                raise ValueError(
                    f"fused_strategy={strategy!r}: expected one of "
                    "'auto', 'incremental', 'full'"
                )
            if strategy == "auto":
                n_dirty = fusion.dirty_names(mm).count()
                n_names = max(self._nrows("nodes_base"), 1)
                strategy = ("incremental"
                            if n_dirty <= cfg.fused_auto_dirty_max * n_names
                            else "full")
            if strategy == "full":
                m2, t2 = fusion.fuse_inputs(all_m, all_t, mm)
                return {
                    "fused_edges": canon.build_edges(t2, cfg=cfg),
                    "fused_nodes": lambda: canon.add_stub_nodes(
                        canon.build_nodes(m2, cfg=cfg),
                        self.read("fused_edges", spread=False),
                    ),
                    "__cleanup__": lambda: mm.unpersist(),
                    "__note__": f"strategy={strategy}",
                }
            return {
                "fused_edges": fusion.fuse_edges_incremental(
                    self.read("edges", spread=False), all_t, mm, cfg=cfg
                ),
                "fused_nodes": lambda: canon.add_stub_nodes(
                    fusion.fuse_nodes_incremental(
                        self.read("nodes_base", spread=False), all_m, mm, cfg=cfg
                    ),
                    self.read("fused_edges", spread=False),
                ),
                "__cleanup__": lambda: mm.unpersist(),
                "__note__": f"strategy={strategy}",
            }

        # name -> (dep stages, lineage inputs, output tables, builder)
        dag: dict[str, tuple[list[str], list[str], list[str], object]] = {
            "spans": (
                [],
                [self.source[1] if self.source else f"{self.sf_dir}/documents.parquet"],
                ["spans"], _spans,
            ),
            "chunks": (["spans"], ["spans"], ["chunks"], _chunks),
            "extract_raw": (["chunks"], ["chunks"], ["extraction_raw"], _extract_raw),
            "decode": (["extract_raw"], ["extraction_raw"],
                       ["mentions", "triples"], _decode),
            "media": (["spans"], ["spans"], ["img_mentions", "img_triples"], _media),
            "graph": (["decode", "media"],
                      ["mentions", "triples", "img_mentions", "img_triples"],
                      ["nodes", "nodes_base", "edges"], _graph),
            "fusion": (["spans", "media"], ["spans", "img_mentions"],
                       ["fusion_blocks"], _fusion),
            "fused_graph": (["decode", "media", "fusion", "graph"],
                            ["mentions", "triples", "img_mentions",
                             "img_triples", "fusion_blocks", "nodes_base",
                             "edges"],
                            ["fused_nodes", "fused_edges"], _fused_graph),
        }

        # concurrent _stage calls need PySpark pinned-thread mode (default
        # since Spark 3.2) so setJobDescription / per-thread local properties
        # (scheduler pools, tags) don't leak across stages running at once
        if parallel and os.environ.get("PYSPARK_PIN_THREAD", "true").lower() == "false":
            parallel = False

        ran: dict[str, bool] = {}
        # flush lineage/metrics even when a stage raises or the run is
        # interrupted: the pyarrow write is cheap driver-side IO, and losing
        # it would leave already-committed checkpoints with no lineage rows
        # (a resume then skips those stages and never backfills them)
        try:
            if not parallel:
                for name, (_, inputs, outputs, fn) in dag.items():  # topo order
                    ran[name] = self._stage(name, inputs, outputs, fn, resume)
            else:
                import concurrent.futures as cf

                with cf.ThreadPoolExecutor(max_workers=3) as pool:
                    futures: dict[cf.Future, str] = {}
                    pending = dict(dag)
                    while pending or futures:
                        for name in list(pending):
                            deps, inputs, outputs, fn = pending[name]
                            if all(d in ran for d in deps):
                                futures[pool.submit(
                                    self._stage, name, inputs, outputs, fn, resume
                                )] = name
                                del pending[name]
                        if not futures:
                            raise RuntimeError(
                                f"unschedulable stages (dependency cycle or "
                                f"unknown dep): {sorted(pending)}"
                            )
                        done, _ = cf.wait(
                            set(futures), return_when=cf.FIRST_COMPLETED
                        )
                        for fut in done:
                            ran[futures.pop(fut)] = fut.result()  # re-raises
        finally:
            self._flush_meta()
        return ran
