"""Structured Streaming surfaces.

The reference is strictly batch (SURVEY.md §2.11) — these operators extend
the engine for continuous ingestion, the shape a production KG pipeline needs
when documents arrive as a feed:

* ``stream_extract`` — incremental KG construction: a parquet-directory
  stream of documents drives chunk → extract → append-to-mentions via
  ``foreachBatch``; each micro-batch reuses the exact batch operators, so
  stream results equal batch results by construction (tested).
* ``windowed_event_counts`` — the generic streaming demo over the events
  table: event-time tumbling windows with a watermark for late data.

Both run with ``Trigger.AvailableNow`` in tests (drain-and-stop), the
recommended pattern for backfill + incremental jobs.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT, PipelineConfig
from ..operators import chunker, extractor
from .. import synth


def _run_token(checkpoint_dir: str) -> str:
    """Stable identifier for a logical streaming query: the checkpoint dir
    names the query's progress log, so a crash-replayed micro-batch carries
    the SAME (run, batch_id) key, while a fresh checkpoint (a new logical
    run over the same sink, batch numbering restarting at 0) gets a new one.
    """
    import hashlib

    return hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]


def _read_state(
    spark: SparkSession, path: str, fallback_schema: str, run: str, batch_id: int
) -> DataFrame:
    """Read a per-batch-partitioned state table, excluding any rows a prior
    PARTIAL attempt of the current micro-batch wrote.

    The foreachBatch state tables are laid out ``path/run=<tok>/batch_id=<n>/``
    and each batch writes its partition with mode("overwrite"), so a replayed
    batch (failure between the two state writes, or before checkpoint
    commit) recomputes from exactly the pre-batch state and overwrites its
    own partial output — the batch converges to the same state no matter
    how many times it replays. The run token (:func:`_run_token`) scopes the
    exclusion: batch 0 of a NEW checkpoint must not shadow batch 0 of an
    earlier run whose output it is resuming over.

    Only a missing path means "first batch": corrupt files, transient IO,
    and permission errors PROPAGATE and fail the micro-batch (silently
    treating them as empty state would re-admit every known duplicate).
    """
    try:
        df = spark.read.parquet(path)
    except AnalysisException as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        return spark.createDataFrame([], fallback_schema)
    return df.filter(
        ~((F.col("run") == F.lit(run)) & (F.col("batch_id") == F.lit(batch_id)))
    )

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def windowed_event_counts(
    spark: SparkSession, events_dir: str, window: str = "1 hour",
    watermark: str = "2 hours", slide: str | None = None,
) -> DataFrame:
    """Streaming event-time windowed aggregation with late-data watermark.
    Pass ``slide`` < ``window`` for HOPPING windows (each event lands in
    window/slide overlapping instances — the streaming form of
    operators/events.hopping_rollup, whose batch explode is the exact twin
    Structured Streaming maintains incrementally as per-instance state)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide or window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )
    return stream


def batch_event_counts(
    spark: SparkSession, events_path: str, window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Batch twin of windowed_event_counts (the correctness yardstick)."""
    return (
        spark.read.parquet(events_path)
        .groupBy(F.window("ts", window, slide or window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def stream_extract(
    spark: SparkSession,
    docs_stream_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig = DEFAULT,
    extract_fn=None,
):
    """Incremental KG ingest: stream docs -> chunk -> J10 cache join ->
    extract misses -> append.

    Each micro-batch left-anti joins its chunks against the persistent
    response-cache table ``{out_dir}/raw_cache`` (chunk_id = md5(content), so
    the cache is content-addressed like the reference's LLM cache,
    llm.py:34-49): a re-sent document costs ZERO extractor work and emits no
    duplicate mention/triple rows — cross-batch dedup, not just within-batch
    (round-1 gap). Fresh extractions append to the cache, making the sink
    exactly the batch pipeline's output over the distinct chunk set.

    Returns the started StreamingQuery (AvailableNow trigger: drains what is
    there, then stops — rerun on arrival for incremental backfill, or swap
    the trigger for continuous micro-batches).
    """
    cache_path = f"{out_dir}/raw_cache"
    run = _run_token(checkpoint_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        part = f"run={run}/batch_id={batch_id}"
        docs = synth.nest_spans(synth.spans_from_docs(batch_df, cfg))
        chunks = chunker.chunk_docs(docs, cfg)
        cache = _read_state(
            spark, cache_path,
            "doc_id string, chunk_id string, output string,"
            " run string, batch_id long",
            run, batch_id,
        ).select("chunk_id", "output")
        _, new_raw = extractor.extract_raw_with_cache(chunks, cache, extract_fn, cfg)
        new_raw = new_raw.persist()
        parsed = extractor.parse_records(new_raw)
        mentions = extractor.decode_mentions(parsed)
        triples = extractor.decode_triples(parsed)
        # per-batch partition overwrite (not append): replay-idempotent —
        # see _read_state
        mentions.write.mode("overwrite").parquet(f"{out_dir}/mentions/{part}")
        triples.write.mode("overwrite").parquet(f"{out_dir}/triples/{part}")
        new_raw.select("doc_id", "chunk_id", "output").write.mode("overwrite").parquet(
            f"{cache_path}/{part}"
        )
        new_raw.unpersist()

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


MENTIONS_SCHEMA = (
    "doc_id string, chunk_id string, entity_name string, entity_type string,"
    " description string, source_id string"
)


def stream_entity_counts(spark: SparkSession, mentions_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-entity mention totals over a stream of mention rows.

    State per entity_name = (count, seen-chunk digest set) — survives micro-batch
    boundaries AND query restarts via the checkpointed state store (tested:
    a second AvailableNow run over new files resumes the totals). This is
    the §2.11 building block the batch reference lacks: canonicalization
    (A1/A5 degree-style totals) as a continuously-updated view instead of a
    batch rebuild.

    Output mode must be ``update``; attach a sink downstream, e.g.::

        q = stream_entity_counts(spark, d).writeStream.format("memory")...
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # chunk_appearances is a TRUE distinct count across the whole stream:
    # state carries the set of 64-bit chunk-id digests seen so far, so a
    # chunk whose mentions for an entity straddle two micro-batches is
    # counted once (a bare per-batch-distinct add would double-count it).
    # State grows with distinct chunks per entity — linear in the real
    # fan-in, same as any exact distinct; at true hub scale swap the digest
    # set for an HLL sketch (approximate, constant-size) — the state schema
    # is the only thing that changes.
    def _digest64(cid: str) -> int:
        d = hashlib.md5(cid.encode()).digest()
        return int.from_bytes(d[:8], "big", signed=True)

    def update_counts(key, pdfs, state: GroupState):
        n = 0
        batch_hashes: set[int] = set()
        for pdf in pdfs:
            n += len(pdf)
            batch_hashes.update(_digest64(c) for c in pdf["chunk_id"])
        if state.exists:
            prev_n, prev_hashes = state.get
            seen = set(prev_hashes)
        else:
            prev_n, seen = 0, set()
        seen |= batch_hashes
        total_n = prev_n + n
        state.update((total_n, sorted(seen)))
        yield pd.DataFrame(
            {"entity_name": [key[0]], "mentions": [total_n],
             "chunk_appearances": [len(seen)]}
        )

    stream = spark.readStream.schema(MENTIONS_SCHEMA).parquet(mentions_dir)
    return stream.groupBy("entity_name").applyInPandasWithState(
        update_counts,
        outputStructType="entity_name string, mentions long, chunk_appearances long",
        stateStructType="mentions long, chunk_hashes array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_entity_counts(spark: SparkSession, mentions_dir: str) -> DataFrame:
    """Batch twin of stream_entity_counts (yardstick): countDistinct equals
    the stream's digest-set cardinality regardless of how a chunk's mentions
    split across micro-batches."""
    return (
        spark.read.parquet(mentions_dir)
        .groupBy("entity_name")
        .agg(
            F.count(F.lit(1)).alias("mentions"),
            F.countDistinct("chunk_id").alias("chunk_appearances"),
        )
    )


def stream_near_duplicates(
    spark: SparkSession,
    docs_stream_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    cfg: PipelineConfig = DEFAULT,
):
    """Streaming near-duplicate ADMISSION GATE: as documents arrive, admit
    only those not near-duplicating anything already admitted — the online
    form of MinHash+LSH dedup a continuously-fed training-data pipeline
    needs (the batch operators dedup a corpus at rest; this gates a feed).

    State is two batch_id-partitioned parquet tables under ``out_dir``
    (per-batch partition overwrite → micro-batch replay converges, see
    :func:`_read_state`):

    * ``admitted`` — the surviving documents (the gate's output relation);
    * ``lsh_buckets`` — their LSH band rows ``(doc_id, band, bkey)``
      (:func:`~..operators.dedup.lsh_bucket_rows`), the joinable index the
      next batch probes.

    Per micro-batch, every step is a distributed equi-join — nothing is
    collected to the driver:

    1. band rows for the batch docs probe the bucket store on
       ``(band, bkey)`` → cross candidates (new doc, admitted doc);
    2. candidates verify with the SAME exact shingle-Jaccard expression as
       :func:`~..operators.dedup.minhash_near_duplicates` — new-doc shingle
       sets from the batch, admitted-doc shingle sets re-derived from the
       ``admitted`` table, BOTH left_semi-restricted to candidate docs, so
       verification cost follows the candidate count, not the corpus;
    3. survivors cluster WITHIN the batch (same verified-pair relation the
       batch collapse uses) and only each cluster's min-doc_id rep is
       admitted — so a batch containing its own duplicates admits one.

    Equivalence to batch (tested): feeding doc_id-ordered batches through
    the gate admits exactly the batch pipeline's
    ``duplicate_clusters(...).cluster_rep`` set whenever near-dup components
    are clique-like (replica families) — the min-id rep arrives first and
    every later member verifies against it directly. For stringy components
    the gate is by construction greedier (a doc is rejected only on a
    VERIFIED match to an admitted doc — never transitively through another
    rejected doc), which is the admission semantics a feed wants.

    Scale shape: the bucket store grows with the ADMITTED corpus, bounded
    by unique content; the probe is a bucketed equi-join against it; at
    10^12 docs partition/bucket the store by ``bkey`` so batch probes
    co-locate. Returns the started StreamingQuery (AvailableNow trigger —
    rerun on arrival, same contract as :func:`stream_extract`).
    """

    run = _run_token(checkpoint_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        near_dup_process_batch(
            spark, batch_df, batch_id, out_dir, threshold, cfg, run=run
        )

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def near_dup_process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    threshold: float = 0.5,
    cfg: PipelineConfig = DEFAULT,
    run: str = "direct",
) -> None:
    """One micro-batch of the near-dup admission gate (module-level so the
    replay-idempotency contract is directly testable: calling it twice with
    the same batch_id must leave the state tables identical)."""
    from ..operators import dedup

    thr_pm = int(threshold * 1_000_000)
    store_path = f"{out_dir}/lsh_buckets"
    admitted_path = f"{out_dir}/admitted"

    def _jaccard(cand: DataFrame, sh_a: DataFrame, sh_b: DataFrame) -> DataFrame:
        """(a, b) candidate pairs -> those with exact Jaccard >= threshold
        (10^6-scaled integer floor; bit-identical to the batch verifier)."""
        return (
            cand.join(sh_a.withColumnRenamed("doc_id", "a")
                      .withColumnRenamed("sh", "sha"), "a")
            .join(sh_b.withColumnRenamed("doc_id", "b")
                  .withColumnRenamed("sh", "shb"), "b")
            .selectExpr(
                "a", "b",
                "size(array_intersect(sha, shb)) * 1000000L"
                " div size(array_union(sha, shb)) AS jaccard_pm",
            )
            .filter(F.col("jaccard_pm") >= thr_pm)
        )

    if batch_df.isEmpty():
        return
    docs = batch_df.select("doc_id", "text")
    buckets = dedup.lsh_bucket_rows(docs, cfg)
    store = _read_state(
        spark, store_path,
        "doc_id long, band int, bkey string, run string, batch_id long",
        run, batch_id,
    )
    admitted = _read_state(
        spark, admitted_path,
        DOCS_SCHEMA + ", run string, batch_id long", run, batch_id,
    ).select("doc_id", "text")
    cand = (
        buckets.alias("n")
        .join(store.alias("o"), ["band", "bkey"])
        .select(F.col("n.doc_id").alias("a"), F.col("o.doc_id").alias("b"))
        .distinct()
    )
    sh_new = dedup._shingle_sets(
        dedup.shingle_rows(docs, cfg)
        .join(cand.select(F.col("a").alias("doc_id")).distinct(),
              "doc_id", "left_semi")
    )
    sh_old = dedup._shingle_sets(
        dedup.shingle_rows(admitted, cfg)
        .join(cand.select(F.col("b").alias("doc_id")).distinct(),
              "doc_id", "left_semi")
    )
    dup_of_old = _jaccard(cand, sh_new, sh_old)
    novel = docs.join(
        dup_of_old.select(F.col("a").alias("doc_id")).distinct(),
        "doc_id", "left_anti",
    )
    reps = dedup.duplicate_clusters(
        novel,
        pairs=dedup.minhash_near_duplicates(novel, threshold, cfg),
        cfg=cfg,
    )
    admit_ids = (
        reps.filter(F.col("doc_id") == F.col("cluster_rep"))
        .select("doc_id")
        .localCheckpoint(eager=True)  # cut the iterative-clustering plan
    )
    # per-batch partition overwrite on BOTH tables: a replayed batch
    # (e.g. failure between the two writes) recomputes from pre-batch
    # state (_read_state drops its own partial rows) and overwrites its
    # partitions — admitted and lsh_buckets can never disagree durably
    part = f"run={run}/batch_id={batch_id}"
    batch_df.join(admit_ids, "doc_id", "left_semi").write.mode(
        "overwrite"
    ).parquet(f"{admitted_path}/{part}")
    buckets.join(admit_ids, "doc_id", "left_semi").write.mode(
        "overwrite"
    ).parquet(f"{store_path}/{part}")



def stream_sessions(
    spark: SparkSession, events_dir: str, gap_us: int = 1_800_000_000
) -> DataFrame:
    """Stateful streaming sessionizer (applyInPandasWithState) — the online
    twin of ``operators/events.sessionize``.

    State per user = the OPEN session (start_us, last_us, n_events,
    session_idx). Each micro-batch folds the user's new events in event-time
    order: a gap > ``gap_us`` CLOSES the open session (emitted downstream —
    append mode) and opens the next. The final open session stays in state —
    exactly the tail a production sessionizer holds back until the
    watermark expires it — so emissions are identical no matter how the
    feed splits into micro-batches, and a restarted query resumes mid-
    session from the checkpointed state store (tested).

    The fold is VECTORIZED inside each Arrow batch (numpy diff -> cumsum
    segment ids -> one pandas groupby); Python touches one row per
    *session*, not per event. Assumes per-user event-time-ordered arrival
    across micro-batches (the standard sessionizer contract; reorder with a
    watermarked sort upstream if the feed interleaves).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        parts = [pdf[["ts_us"]] for pdf in pdfs]
        ts = (
            pd.concat(parts).sort_values("ts_us")["ts_us"]
            .to_numpy(dtype="int64")
        )
        if state.exists:
            idx0, start0, last0, n0 = state.get
            open_sess = [idx0, n0, start0, last0]
        else:
            idx0, open_sess = 0, None
        prev = np.empty_like(ts)
        prev[1:] = ts[:-1]
        prev[0] = open_sess[3] if open_sess is not None else ts[0] - gap_us - 1
        seg = np.cumsum((ts - prev) > gap_us)
        stats = (
            pd.DataFrame({"seg": seg, "ts": ts})
            .groupby("seg")["ts"].agg(["count", "min", "max"]).reset_index()
        )
        closed, idx = [], idx0
        for _seg, cnt, mn, mx in stats.itertuples(index=False):
            if _seg == 0:
                open_sess[1] += int(cnt)
                open_sess[3] = int(mx)
                continue
            if open_sess is not None:
                closed.append(open_sess)
            idx += 1
            open_sess = [idx, int(cnt), int(mn), int(mx)]
        state.update((open_sess[0], open_sess[2], open_sess[3], open_sess[1]))
        if closed:
            out = pd.DataFrame(
                closed, columns=["session_idx", "n_events", "first_us", "last_us"]
            )
            out.insert(0, "user_id", key[0])
            out["duration_us"] = out["last_us"] - out["first_us"]
            yield out

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=(
            "user_id long, session_idx long, n_events long, first_us long,"
            " last_us long, duration_us long"
        ),
        stateStructType="idx long, start_us long, last_us long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- streaming Count-Min sketch ---------------------------------------------


def countmin_process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    key_expr: str,
    d: int = 4,
    w: int = 256,
    run: str = "direct",
) -> None:
    """One micro-batch of the streaming Count-Min sketch: compute the
    batch's OWN d×w cell table (the identical build the batch operator
    uses — :func:`~..operators.sketches.countmin_cells`) and write it as
    this batch's partition delta. Mergeability by (i, bucket) sum is the
    defining Count-Min property, so the current sketch is always
    ``sum(c) GROUP BY i, bucket`` over the delta partitions — no
    read-modify-write of a global state row, hence no lost updates and
    per-batch replay idempotency for free (a replayed batch overwrites its
    own partition with the same delta)."""
    from ..operators.sketches import countmin_cells

    delta = countmin_cells(batch_df, key_expr, d, w).select(
        "i", "bucket", "c",
        F.lit(run).alias("run"), F.lit(batch_id).cast("long").alias("batch_id"),
    )
    (
        delta.coalesce(1)
        .write.partitionBy("run", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(f"{out_dir}/cm_cells")
    )


def stream_countmin(
    spark: SparkSession,
    events_stream_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_expr: str = "concat(user_id, ':', event_type)",
    d: int = 4,
    w: int = 256,
):
    """Streaming Count-Min heavy-hitter sketch: as events arrive, fold each
    micro-batch into bounded d×w counter state via per-batch cell DELTAS
    (see :func:`countmin_process_batch`). The merged sketch equals the
    batch sketch over the union of all batches BIT-FOR-BIT — integer cell
    sums are associative-commutative, so batch boundaries cannot show
    through (tested, including across a query restart). AvailableNow
    trigger, same contract as :func:`stream_extract`."""
    run = _run_token(checkpoint_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        countmin_process_batch(
            spark, batch_df, batch_id, out_dir, key_expr, d, w, run=run
        )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_stream_dir)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_countmin_cells(spark: SparkSession, out_dir: str) -> DataFrame:
    """(i, bucket, c): the current merged sketch — sum of all delta
    partitions. ≤ d·w rows regardless of stream length."""
    return (
        spark.read.parquet(f"{out_dir}/cm_cells")
        .groupBy("i", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
