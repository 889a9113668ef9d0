"""C1/C2 window math, dedup, and column-op vs pandas-UDF chunker equality."""

from __future__ import annotations

import hashlib

from conftest import SF_TINY, make_docs

from mmgraphrag_spark import synth
from mmgraphrag_spark.config import PipelineConfig
from mmgraphrag_spark.operators import chunker

CFG = PipelineConfig(chunk_max_tokens=10, chunk_overlap_tokens=3)  # step 7


def test_window_math(spark):
    words = [f"w{i:02d}" for i in range(20)]
    docs = make_docs(spark, [("d1", [("text", " ".join(words), "", 0)])])
    got = chunker.chunk_docs(docs, CFG).orderBy("chunk_order_index").collect()
    # starts 0,7,14 -> lengths 10,10,6 (trailing partial kept, like the
    # reference's range(0, n, step) loop preprocessing.py:30-68)
    assert [r.chunk_order_index for r in got] == [0, 1, 2]
    assert [r.tokens for r in got] == [10, 10, 6]
    assert got[0].content == " ".join(words[0:10])
    assert got[1].content == " ".join(words[7:17])
    assert got[2].content == " ".join(words[14:20])
    for r in got:
        assert r.chunk_id == "chunk-" + hashlib.md5(r.content.encode()).hexdigest()


def test_exact_dedup_deterministic_winner(spark):
    text = " ".join(["tok"] * 5)
    docs = make_docs(spark, [
        ("d2", [("text", text, "", 0)]),
        ("d1", [("text", text, "", 0)]),
    ])
    got = chunker.chunk_docs(docs, CFG).collect()
    assert len(got) == 1
    assert got[0].doc_id == "d1"  # lexicographically first wins


def test_text_spans_only(spark):
    docs = make_docs(spark, [
        ("d1", [("text", "a b", "", 0), ("image", "cap", "d1/image_1", 1),
                 ("text", "c d", "", 2)]),
    ])
    got = chunker.chunk_docs(docs, CFG).collect()
    assert len(got) == 1
    assert got[0].content == "a b c d"  # media text excluded, order kept


def test_udf_chunker_matches_column_chunker(spark):
    docs = synth.interleaved_docs(spark, SF_TINY).limit(50)
    a = chunker.chunk_docs(docs).toPandas().sort_values("chunk_id").reset_index(drop=True)
    b = chunker.chunk_docs_udf(docs).toPandas().sort_values("chunk_id").reset_index(drop=True)
    assert a.equals(b)
