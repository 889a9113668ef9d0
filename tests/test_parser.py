"""E2–E5 grammar parser on crafted record strings, incl. malformed records.

Mirrors the reference's validation rules: arity gates (text2graph.py:54,118),
empty-name drop (:58-59), upper-casing (:57), float-regex weight fallback
(:125-127), quote stripping.
"""

from __future__ import annotations

from mmgraphrag_spark.operators import extractor


def _parse(spark, output):
    raw = spark.createDataFrame(
        [("d1", "chunk-x", output)], "doc_id string, chunk_id string, output string"
    )
    parsed = extractor.parse_records(raw)
    return (
        extractor.decode_mentions(parsed).collect(),
        extractor.decode_triples(parsed).collect(),
    )


def test_well_formed_records(spark):
    out = (
        '("entity"<|>"alpha"<|>"CONCEPT"<|>"desc a")##'
        '("relationship"<|>"alpha"<|>"beta"<|>"rel d"<|>2.5)##<|COMPLETE|>'
    )
    ments, trips = _parse(spark, out)
    assert len(ments) == 1 and len(trips) == 1
    m, t = ments[0], trips[0]
    assert (m.entity_name, m.entity_type, m.description) == ("ALPHA", "CONCEPT", "desc a")
    assert m.source_id == "chunk-x"
    assert (t.subj, t.obj, t.weight, t.order) == ("ALPHA", "BETA", 2.5, 1)


def test_malformed_records_dropped(spark):
    out = (
        '("entity"<|>"ok"<|>"T"<|>"d")##'
        '("entity"<|>"too_short")##'          # arity < 4
        'no parens record##'                   # no (...) -> empty fields
        '("entity"<|>""<|>"T"<|>"d")##'        # empty name (P3)
        '("relationship"<|>"a"<|>"a"<|>"d"<|>1)##'   # self-loop dropped
        '("relationship"<|>"x"<|>"y"<|>"d")##<|COMPLETE|>'  # arity < 5
    )
    ments, trips = _parse(spark, out)
    assert [m.entity_name for m in ments] == ["OK"]
    assert trips == []


def test_weight_float_regex_fallback(spark):
    out = (
        '("relationship"<|>"a"<|>"b"<|>"d"<|>not_a_float)##'
        '("relationship"<|>"a"<|>"c"<|>"d"<|>-3.5)##<|COMPLETE|>'
    )
    _, trips = _parse(spark, out)
    ws = {(t.subj, t.obj): t.weight for t in trips}
    assert ws[("A", "B")] == 1.0  # fallback per is_float_regex
    assert ws[("A", "C")] == -3.5


def test_undirected_canonical_key(spark):
    out = '("relationship"<|>"zeta"<|>"alpha"<|>"d"<|>1.0)##<|COMPLETE|>'
    _, trips = _parse(spark, out)
    assert (trips[0].subj, trips[0].obj) == ("ALPHA", "ZETA")


def test_mock_extractor_grammar_roundtrip(spark):
    """The mock emitter's output survives its own parse with expected rows."""
    chunks = spark.createDataFrame(
        [("d1", "chunk-1", "alpha batch tiny beta gamma alpha")],
        "doc_id string, chunk_id string, content string",
    )
    ments, trips = extractor.extract_mentions_and_triples(chunks)
    names = sorted({m.entity_name for m in ments.collect()})
    assert names == ["ALPHA", "BATCH", "GAMMA"]  # len>=5 only; BETA/TINY too short
    got = {(t.subj, t.obj) for t in trips.collect()}
    # consecutive qualifying pairs: alpha-batch, batch-gamma, gamma-alpha
    assert got == {("ALPHA", "BATCH"), ("BATCH", "GAMMA"), ("ALPHA", "GAMMA")}


def test_clean_str_column_matches_python_html_unescape(spark):
    """P1: the codegen clean_str must match html.unescape + control-strip on
    the covered entity set (reference base.py:47-56)."""
    import html
    import re

    from pyspark.sql import functions as F

    from mmgraphrag_spark.functions.cleaning import clean_str_col

    samples = [
        "  plain  ", "a&amp;b", "&lt;tag&gt;", "&quot;q&quot;", "x&#39;s",
        "&amp;lt;", "ctrl\x01char\x7f", "nb&nbsp;sp", "mixed &amp; \x02&lt;ok&gt;",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r.c for r in df.select(clean_str_col(F.col("s")).alias("c")).collect()]
    want = [re.sub(r"[\x00-\x1f\x7f-\x9f]", "", html.unescape(s.strip())) for s in samples]
    assert got == want


def test_decode_applies_clean_str(spark):
    """Dirty grammar fields (HTML escapes, control chars) come out clean."""
    from mmgraphrag_spark.operators import extractor

    raw = spark.createDataFrame(
        [("d", "c", '("entity"<|>"A&amp;B\x01"<|>"TYPE"<|>"d&lt;e")##<|COMPLETE|>')],
        "doc_id string, chunk_id string, output string",
    )
    m = extractor.decode_mentions(extractor.parse_records(raw)).collect()
    assert [(r.entity_name, r.description) for r in m] == [("A&B", "d<e")]


def test_gleaning_rounds_recover_progressively_shorter_tokens(spark):
    """Depth-2 gleaning: round 1 recovers len-4 tokens the base pass missed,
    round 2 recovers len-3 tokens round 1 ALSO missed; deeper configs
    converge (GLEAN_FLOOR) and add nothing further."""
    from dataclasses import replace

    from mmgraphrag_spark.config import DEFAULT

    chunks = spark.createDataFrame(
        [("d1", "chunk-g", "alpha four thr xx")],
        "doc_id string, chunk_id string, content string",
    )

    def names(rounds):
        cfg = replace(DEFAULT, gleaning_rounds=rounds)
        parsed = extractor.parse_records(extractor.extract_raw(chunks, cfg=cfg))
        return {
            r.entity_name
            for r in extractor.decode_mentions(parsed).collect()
        }

    base, g1, g2, g9 = names(0), names(1), names(2), names(9)
    assert base == {"ALPHA"}                      # len >= 5 only
    assert g1 == {"ALPHA", "FOUR"}                # + len-4 (round 1)
    assert g2 == {"ALPHA", "FOUR", "THR"}         # + len-3 (round 2)
    assert g9 == g2                               # converged at the floor
