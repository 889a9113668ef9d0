"""Structured Streaming: stream results equal batch results."""

from __future__ import annotations

import shutil

from conftest import SF_TINY

from mmgraphrag_spark import api
from mmgraphrag_spark.streaming import incremental


def test_windowed_event_counts_stream_equals_batch(spark, tmp_path):
    # stream source must be a directory of parquet files
    src = str(tmp_path / "events_src")
    spark.read.parquet(f"{SF_TINY}/events.parquet").write.parquet(src)

    q = (
        incremental.windowed_event_counts(spark, src)
        .writeStream.format("memory")
        .queryName("evt_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from evt_counts").toPandas()
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    want = (
        incremental.batch_event_counts(spark, src).toPandas()
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    # append mode with availableNow emits only windows older than the
    # watermark; on a drained finite source Spark finalizes all of them
    assert len(got) > 0
    merged = got.merge(want, on=["window_start", "event_type"], suffixes=("_s", "_b"))
    assert (merged["n_s"] == merged["n_b"]).all()
    assert len(got) <= len(want)


def test_stream_extract_matches_batch(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").limit(50)
    docs.write.parquet(src)

    q = incremental.stream_extract(spark, src, out, ckpt)
    q.awaitTermination(180)

    got = (
        spark.read.parquet(f"{out}/mentions")
        .drop("batch_id").toPandas()
        .sort_values(["chunk_id", "entity_name", "entity_type", "description"])
        .reset_index(drop=True)
    )
    # batch twin over the same 50 docs
    from mmgraphrag_spark import synth
    from mmgraphrag_spark.operators import chunker, extractor

    bdocs = synth.nest_spans(synth.spans_from_docs(spark.read.parquet(src)))
    m, _ = extractor.extract_mentions_and_triples(chunker.chunk_docs(bdocs))
    want = (
        m.toPandas()
        .sort_values(["chunk_id", "entity_name", "entity_type", "description"])
        .reset_index(drop=True)
    )
    assert got.equals(want)

    # incremental restart: nothing new to process → no duplicate appends
    n_before = len(got)
    q2 = incremental.stream_extract(spark, src, out, ckpt)
    q2.awaitTermination(120)
    n_after = spark.read.parquet(f"{out}/mentions").count()
    assert n_after == n_before
    shutil.rmtree(out, ignore_errors=True)


def test_resent_docs_cost_zero_extractor_work(spark, tmp_path):
    """J10 cache join: a document re-sent in a LATER batch (fresh checkpoint,
    so Spark does reprocess the file) must never reach the extractor — the
    poison extractor below fails the query if it sees a single row — and must
    not duplicate sink rows."""
    src1 = str(tmp_path / "src1")
    src2 = str(tmp_path / "src2")
    out = str(tmp_path / "out")
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").limit(20)
    docs.write.parquet(src1)
    docs.write.parquet(src2)  # same content, re-sent later

    q = incremental.stream_extract(spark, src1, out, str(tmp_path / "ck1"))
    q.awaitTermination(120)
    n1 = spark.read.parquet(f"{out}/mentions").count()
    cache1 = spark.read.parquet(f"{out}/raw_cache").count()
    assert n1 > 0 and cache1 > 0

    def poison(pdf):
        raise AssertionError(f"extractor invoked on {len(pdf)} re-sent rows")

    q2 = incremental.stream_extract(
        spark, src2, out, str(tmp_path / "ck2"), extract_fn=poison
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/mentions").count() == n1
    assert spark.read.parquet(f"{out}/raw_cache").count() == cache1
    shutil.rmtree(out, ignore_errors=True)
