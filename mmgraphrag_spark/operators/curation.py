"""Training-data curation over the documents table: deterministic
stratified sampling and fixed-budget sequence packing.

Beyond-reference operators for the 100 TB pipeline this engine feeds: after
dedup/quality filtering (operators/dedup.py, textstats.py) a training run
wants (a) a reproducible per-stratum subsample — "x% of each language" —
that needs no RNG state, no shuffle, and gives the SAME verdict for a doc
on every run and every engine; and (b) documents packed into fixed
token-budget training sequences (the concat-and-chunk packing standard for
LM pretraining). Both are pure column expressions / single-window plans
with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# multiplicative hash (Knuth's 2^32 golden ratio); doc_id is folded through
# a Mersenne-prime mod FIRST so the product stays < 2^31 * 2^32 < 2^63 —
# int64-safe at any doc_id, including 10^12-scale ids
HASH_SQL = "pmod(pmod(doc_id, 2147483647) * 2654435761, 4294967296) % 1000000"

# default per-language keep rates (ppm): a typical rebalancing mix
DEFAULT_RATES_PPM: dict[str, int] = {"en": 500_000, "de": 250_000, "fr": 250_000}
DEFAULT_RATE_PPM = 125_000


def stratified_sample(
    docs: DataFrame,
    rates_ppm: dict[str, int] | None = None,
    default_ppm: int = DEFAULT_RATE_PPM,
) -> DataFrame:
    """(doc_id, lang, source, bucket_ppm, rate_ppm): the kept subsample.

    A doc is kept iff hash(doc_id) % 10^6 < rate(lang). The hash is a pure
    integer multiplicative mix (no RNG, no seed state): membership is
    decidable per-row with zero shuffles and zero coordination, stable
    under reruns/resume, and RAISING a stratum's rate strictly grows its
    sample (bucket_ppm is fixed per doc) — the property incremental
    curation needs. The per-stratum rate is a flat CASE over the small
    fixed language map (codegen; no join).
    """
    rates = DEFAULT_RATES_PPM if rates_ppm is None else rates_ppm
    rate = F.lit(default_ppm).cast("long")
    for lang, ppm in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(ppm).cast("long")).otherwise(rate)
    return (
        docs.select(
            "doc_id", "lang", "source",
            F.expr(HASH_SQL).alias("bucket_ppm"),
            rate.alias("rate_ppm"),
        )
        .filter(F.col("bucket_ppm") < F.col("rate_ppm"))
    )


# default (lang × source) overrides: boost/suppress specific feeds inside a
# language — the knob a mixture rebalance actually turns
DEFAULT_RATES_2D_PPM: dict[tuple[str, str], int] = {
    ("en", "src0"): 800_000,
    ("en", "src1"): 100_000,
    ("de", "src0"): 600_000,
}


def stratified_sample_2d(
    docs: DataFrame,
    rates_2d_ppm: dict[tuple[str, str], int] | None = None,
    lang_rates_ppm: dict[str, int] | None = None,
    default_ppm: int = DEFAULT_RATE_PPM,
) -> DataFrame:
    """(doc_id, lang, source, bucket_ppm, rate_ppm): two-dimensional
    stratified sampling — rate resolution is (lang, source) override →
    per-lang rate → default, all under the SAME doc-fixed hash bucket as
    :func:`stratified_sample`.

    The contract carries over unchanged: membership is a per-row integer
    comparison (zero shuffles, zero RNG state), and because ``bucket_ppm``
    is a pure function of doc_id, raising ANY stratum's rate strictly grows
    that stratum's sample while every previously-kept doc stays kept
    (rate-monotone) — so an incremental re-curation only ever ADDS docs.
    The rate is one nested CASE over the small fixed stratum maps (codegen;
    no join — stratum maps are config, not data).
    """
    rates2 = DEFAULT_RATES_2D_PPM if rates_2d_ppm is None else rates_2d_ppm
    lang_rates = DEFAULT_RATES_PPM if lang_rates_ppm is None else lang_rates_ppm
    rate = F.lit(default_ppm).cast("long")
    for lang, ppm in sorted(lang_rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(ppm).cast("long")).otherwise(rate)
    # (lang, source) overrides are most-specific — applied outermost
    for (lang, source), ppm in sorted(rates2.items()):
        rate = F.when(
            (F.col("lang") == lang) & (F.col("source") == source),
            F.lit(ppm).cast("long"),
        ).otherwise(rate)
    return (
        docs.select(
            "doc_id", "lang", "source",
            F.expr(HASH_SQL).alias("bucket_ppm"),
            rate.alias("rate_ppm"),
        )
        .filter(F.col("bucket_ppm") < F.col("rate_ppm"))
    )


# default fixed budgets (docs per language stratum) for the exact-count form
DEFAULT_BUDGETS: dict[str, int] = {"en": 20, "de": 10}
DEFAULT_BUDGET = 5


def stratified_budget(
    docs: DataFrame,
    budgets: dict[str, int] | None = None,
    default_budget: int = DEFAULT_BUDGET,
    prefilter_ppm: int | None = None,
) -> DataFrame:
    """(doc_id, lang, source, bucket_ppm, stratum_rank, budget_n): EXACTLY
    min(budget, |stratum|) docs per language stratum — the fixed-budget form
    of stratified sampling ("give me 1M docs per language", not "x%").

    Selection is top-k by (bucket_ppm, doc_id) within the stratum: the same
    doc-fixed hash as :func:`stratified_sample`, so the choice is
    deterministic across runs and engines, and BUDGET-MONOTONE — a doc
    admitted at budget B is still admitted at any B' > B, because its rank
    within the stratum never changes. Rank = one row_number window per
    stratum (one shuffle on lang).

    At 10^12-doc scale a whole-stratum sort is the wrong plan; pass
    ``prefilter_ppm`` to bound the window input with the zero-shuffle hash
    filter first (exact whenever >= budget docs survive it — pick e.g.
    10 × budget/|stratum| ppm). The default (None) ranks the full stratum.
    """
    bud = DEFAULT_BUDGETS if budgets is None else budgets
    budget_col = F.lit(default_budget).cast("long")
    for lang, b in sorted(bud.items()):
        budget_col = F.when(F.col("lang") == lang, F.lit(b).cast("long")).otherwise(
            budget_col
        )
    base = docs.select(
        "doc_id", "lang", "source",
        F.expr(HASH_SQL).alias("bucket_ppm"),
        budget_col.alias("budget_n"),
    )
    if prefilter_ppm is not None:
        base = base.filter(F.col("bucket_ppm") < F.lit(prefilter_ppm))
    w = Window.partitionBy("lang").orderBy("bucket_ppm", "doc_id")
    return (
        base.withColumn("stratum_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("stratum_rank") <= F.col("budget_n"))
        .select("doc_id", "lang", "source", "bucket_ppm", "stratum_rank", "budget_n")
    )


# held-out eval stratum: the top slice of the SAME doc-fixed hash bucket the
# samplers use — docs with bucket_ppm >= this are "the benchmark set"
EVAL_FROM_PPM = 950_000


def decontaminate(
    docs: DataFrame,
    n: int = 4,
    eval_from_ppm: int = EVAL_FROM_PPM,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, hit_grams, n_grams, contam_ppm): training documents that
    share >= ``min_hits`` word ``n``-grams with the held-out eval stratum —
    test-set decontamination, the filter every pretraining corpus runs so
    benchmark text does not leak into training data.

    The eval set here is the top hash slice of the corpus itself (docs with
    ``bucket_ppm >= eval_from_ppm``, the same doc-fixed multiplicative hash
    as :func:`stratified_sample` — deterministic, engine-portable, no
    external data); in production it is whatever benchmark relation you
    join instead. ``hit_grams`` counts matching n-gram POSITIONS in the
    training doc (each position matches at most once — the eval gram set is
    distinct), ``n_grams`` its total positions, ``contam_ppm`` their exact
    integer ratio.

    Shape at scale: n-grams are md5'd generator expressions (explode — no
    shuffle, fixed-width keys instead of fat strings), the eval set is ONE
    distinct over ~1% of grams, and the probe is a broadcast hash join
    (map-side, zero shuffle of the 99% training side) followed by one
    groupBy(doc_id) with map-side combine. ``broadcast_eval=False`` drops
    the hint for a giant holdout (> a few GB of grams) and lets AQE pick a
    shuffled hash join instead.
    """
    gram_expr = (
        f"transform(sequence(0, greatest(size(w) - {n}, 0)),"
        f" j -> md5(concat_ws(' ', slice(w, j + 1, {n}))))"
    )
    base = docs.select(
        "doc_id",
        F.expr(HASH_SQL).alias("bucket_ppm"),
        F.split("text", " ").alias("w"),
    ).withColumn("grams", F.expr(gram_expr))
    eval_grams = (
        base.filter(F.col("bucket_ppm") >= eval_from_ppm)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    train = base.filter(F.col("bucket_ppm") < eval_from_ppm).select(
        "doc_id",
        F.size("grams").cast("long").alias("n_grams"),
        F.explode("grams").alias("gram"),
    )
    return (
        train.join(eval_grams, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("hit_grams"),
            F.min("n_grams").alias("n_grams"),
        )
        .filter(F.col("hit_grams") >= min_hits)
        .select(
            "doc_id", "hit_grams", "n_grams",
            F.expr("hit_grams * 1000000L div n_grams").alias("contam_ppm"),
        )
    )


# Gopher-style gate thresholds (Rae et al. 2021 §A1.1, adapted): each is a
# named rule so the emitted `reasons` string is machine-actionable
GATE_MIN_TOKENS = 20
GATE_MAX_TOKENS = 100_000
GATE_MIN_AVG_TOKEN_LEN_PPM = 3_000_000   # mean token length >= 3 chars
GATE_MAX_AVG_TOKEN_LEN_PPM = 10_000_000  # mean token length <= 10 chars
GATE_MIN_DISTINCT_PPM = 300_000          # >= 30% distinct tokens
GATE_MAX_TOP2GRAM_PPM = 180_000          # top 2-gram claims <= 18% of positions
GATE_MAX_DUP3GRAM_PPM = 100_000          # <= 10% positions in repeated 3-grams


def quality_gate(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stopword_ppm, distinct_ratio_ppm, top2gram_ppm,
    dup3gram_ppm, keep, reasons): the composite keep/drop quality filter a
    pretraining corpus runs (Gopher rules, Rae et al. 2021, adapted): length
    window, mean-token-length window, must-contain-stopwords, lexical
    diversity floor, and the two repetition ceilings from
    :func:`textstats.repetition_scores`. ``keep`` is 0/1; ``reasons`` is the
    comma-joined list of violated rule names ('' when kept) so downstream
    re-curation can re-admit by rule, not by re-scoring.

    Shape at scale: the per-row signals are flat codegen expressions over
    one scan; the repetition signals join on doc_id (co-partitioned with the
    gate's own groupBy-free side — one shuffle each side of a hash join, or
    broadcast when the corpus slice is small). No Python anywhere.
    """
    from . import textstats

    w = F.split("text", " ")
    n = F.size(w)
    n_stop = textstats._count_in_list(w, textstats.STOPWORDS)
    base = docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (n_stop * F.lit(1_000_000)).cast("long").alias("_stop_num"),
        (F.size(F.array_distinct(w)) * F.lit(1_000_000)).cast("long").alias("_dist_num"),
        F.expr(
            "(length(text) - size(split(text, ' ')) + 1)"
            " * 1000000L div size(split(text, ' '))"
        ).alias("_avg_len_ppm"),
    ).selectExpr(
        "doc_id", "n_tokens",
        "_stop_num div n_tokens AS stopword_ppm",
        "_dist_num div n_tokens AS distinct_ratio_ppm",
        "_avg_len_ppm",
    )
    rep = textstats.repetition_scores(docs).select(
        "doc_id", "top2gram_ppm", "dup3gram_ppm"
    )
    rules = [
        ("too_short", f"n_tokens < {GATE_MIN_TOKENS}"),
        ("too_long", f"n_tokens > {GATE_MAX_TOKENS}"),
        (
            "bad_token_len",
            f"_avg_len_ppm < {GATE_MIN_AVG_TOKEN_LEN_PPM}"
            f" OR _avg_len_ppm > {GATE_MAX_AVG_TOKEN_LEN_PPM}",
        ),
        ("no_stopwords", "stopword_ppm = 0"),
        ("low_diversity", f"distinct_ratio_ppm < {GATE_MIN_DISTINCT_PPM}"),
        ("top2gram", f"top2gram_ppm > {GATE_MAX_TOP2GRAM_PPM}"),
        ("dup3gram", f"dup3gram_ppm > {GATE_MAX_DUP3GRAM_PPM}"),
    ]
    reason_cols = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' END" for name, cond in rules
    )
    return base.join(rep, "doc_id").selectExpr(
        "doc_id", "n_tokens", "stopword_ppm", "distinct_ratio_ppm",
        "top2gram_ppm", "dup3gram_ppm",
        f"CASE WHEN {' OR '.join(c for _, c in rules)} THEN 0L ELSE 1L END"
        " AS keep",
        f"concat_ws(',', {reason_cols}) AS reasons",
    )


def domain_mix(docs: DataFrame) -> DataFrame:
    """(source, n_docs, n_tokens, target_ppm, target_tokens, rate_ppm,
    epochs_ppm): domain-mixture reweighting — given a target share per
    source domain, how to resample each domain so the training mix hits it.
    ``rate_ppm`` is the keep rate for down-sampled domains (capped at 10^6);
    ``epochs_ppm`` is the repetition factor for up-sampled ones (>10^6 means
    the domain repeats). The knob every pretraining mixture sweep turns
    (Pile/DoReMi-style domain weights), exact in integer ppm arithmetic.

    Target shares are a pure function of the relation: domains rank by name
    and the share is rank-proportional (rank·2·10^6 div k(k+1)) — no
    external weight table, so the twin is self-contained. Shape at scale:
    one groupBy on source (map-side combined; domain cardinality is tiny)
    then whole-relation windows over the k-row aggregate — the single
    partition the WindowExec warning flags holds k≈domains rows, not data.
    The ppm multiplies stay int64-exact below ~9·10^12 total tokens; past
    that, split the multiply (div-first on the 10^6 factor).
    """
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens"),
    )
    whole = Window.partitionBy()
    ranked = (
        per.withColumn("rnk", F.row_number().over(Window.orderBy("source")))
        .withColumn("k", F.count(F.lit(1)).over(whole))
        .withColumn("total_tokens", F.sum("n_tokens").over(whole))
    )
    return ranked.select(
        "source", "n_docs", "n_tokens",
        F.expr("rnk * 2000000 div (k * (k + 1))").alias("target_ppm"),
        F.expr(
            "total_tokens * (rnk * 2000000 div (k * (k + 1))) div 1000000"
        ).alias("target_tokens"),
        F.expr(
            "least(1000000, total_tokens * (rnk * 2000000 div (k * (k + 1)))"
            " div 1000000 * 1000000 div n_tokens)"
        ).alias("rate_ppm"),
        F.expr(
            "total_tokens * (rnk * 2000000 div (k * (k + 1))) div 1000000"
            " * 1000000 div n_tokens"
        ).alias("epochs_ppm"),
    )


def dsir_weights(
    docs: DataFrame, n: int = 2, buckets: int = 4096, target_lang: str = "en"
) -> DataFrame:
    """(doc_id, lang, n_grams, sum_ratio_ppm, avg_ratio_ppm, keep): DSIR —
    Data Selection via Importance Resampling (Xie et al. 2023): score every
    raw document by how target-like its hashed word ``n``-gram distribution
    is. Each gram hashes into one of ``buckets`` bins; a bin's importance
    ratio is p_target(bin)/p_raw(bin) with add-one smoothing, and a doc's
    weight is the mean ratio over its gram occurrences (the exact-integer
    stand-in for DSIR's log-likelihood-ratio sum — logs are float-engine-
    defined, ratios in ppm hash bit-exactly cross-engine). The target
    distribution here is the ``target_lang`` stratum of the corpus itself
    (the quality-stratum stand-in the synthetic data supports); ``keep``
    marks docs whose mean ratio is at or above the corpus-wide occurrence-
    weighted mean (add-one smoothing biases every ratio below 10^6, so an
    absolute threshold would be degenerate — the relative cut is DSIR's
    top-fraction resampling in exact integer form, at the cost of one
    1-row aggregate broadcast).

    Shape at scale: grams are a generator (zero shuffle) -> ONE map-side-
    combined groupBy over ``buckets`` keys (the whole model is a 4096-row
    relation REGARDLESS of corpus size — that is DSIR's point) -> the ratio
    table broadcasts back onto the gram stream (no second shuffle of the
    corpus) -> one groupBy(doc_id). The ppm multiplies are int64-exact
    below ~9·10^12 gram occurrences; past that, div-first on the 10^6.
    """
    base = docs.select("doc_id", "lang", F.split("text", " ").alias("w"))
    grams = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                f"CASE WHEN size(w) >= {n} THEN"
                f" transform(sequence(0, size(w) - {n}),"
                f"  j -> pmod(cast(conv(substr(md5("
                f"       concat_ws(' ', slice(w, j + 1, {n}))), 1, 15),"
                f"       16, 10) as bigint), {buckets}))"
                f" ELSE array() END"
            )
        ).alias("b"),
    )
    whole = Window.partitionBy()
    stats = (
        grams.groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cr"),
            F.sum(
                F.when(F.col("lang") == target_lang, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("ct"),
        )
        .withColumn("r_tot", F.sum("cr").over(whole))
        .withColumn("t_tot", F.sum("ct").over(whole))
        .select(
            "b",
            F.expr(
                f"(ct + 1) * (r_tot + {buckets}) * 1000000"
                f" div ((cr + 1) * (t_tot + {buckets}))"
            ).alias("ratio_ppm"),
        )
    )
    per_doc = (
        grams.join(F.broadcast(stats), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("ratio_ppm").cast("long").alias("sum_ratio_ppm"),
        )
    )
    mean = per_doc.agg(
        F.expr("sum(sum_ratio_ppm) div sum(n_grams)").alias("mean_ppm")
    )
    return (
        base.select("doc_id", "lang")
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(mean))
        .select(
            "doc_id", "lang",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("sum_ratio_ppm", F.lit(0).cast("long")).alias(
                "sum_ratio_ppm"
            ),
            F.expr(
                "coalesce(sum_ratio_ppm, 0L) div greatest(coalesce(n_grams, 0L), 1L)"
            ).alias("avg_ratio_ppm"),
            F.expr(
                "CASE WHEN coalesce(sum_ratio_ppm, 0L)"
                " div greatest(coalesce(n_grams, 0L), 1L) >= mean_ppm"
                " THEN 1L ELSE 0L END"
            ).alias("keep"),
        )
    )


def pack_sequences(docs: DataFrame, budget: int = 256, shards: int = 8) -> DataFrame:
    """(doc_id, shard, n_tokens, seq_id, offset_tokens): concat-and-chunk
    sequence packing — within each shard, documents concatenate in doc_id
    order and the token stream is cut into fixed ``budget``-token training
    sequences; a document belongs to the sequence where it STARTS (it may
    straddle the boundary — the packing used when pretraining corpora are
    chunked with document concatenation).

    Shape at scale: one window per shard (a running token sum in doc_id
    order — streaming, no buffering); ``shards`` is the packing parallelism
    knob: at 10^12 docs set it to the cluster's write parallelism and each
    shard packs independently. Deterministic: shard = doc_id % shards, so
    the layout is a pure function of the input relation.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            "doc_id",
            F.expr(f"pmod(doc_id, {shards})").alias("shard"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .withColumn("start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id", "shard", "n_tokens",
            F.expr(f"start div {budget}").alias("seq_id"),
            F.expr(f"start % {budget}").alias("offset_tokens"),
        )
    )


def pack_interleaved(
    spans: DataFrame, budget: int = 512, image_tokens: int = 64, shards: int = 8
) -> DataFrame:
    """(doc_id, span_offset, kind, media_ref, shard, cost_tokens, seq_id,
    offset_tokens): sequence packing for INTERLEAVED text+media documents —
    the layout step for multimodal pretraining (Flamingo / MM1 style):
    text spans cost their token count, each media span costs a fixed
    ``image_tokens`` placeholder budget (the visual-embedding slots the
    model reserves per image), and the interleaved span stream concatenates
    in (doc_id, span offset) order within each shard, cut into fixed
    ``budget``-token training sequences. A span belongs to the sequence
    where it STARTS (same straddle contract as :func:`pack_sequences`).

    Same scale shape as :func:`pack_sequences`: ONE running-sum window per
    shard (streaming, no buffering); ``shards`` is the write-parallelism
    knob. The shard key parses the synthesizer's ``doc<N>`` id back to its
    numeric suffix (deterministic, engine-portable); production swaps any
    stable integer doc key in.
    """
    cost = F.when(
        F.col("kind") == "image", F.lit(image_tokens).cast("long")
    ).otherwise(F.size(F.split("text", " ")).cast("long"))
    base = spans.select(
        "doc_id",
        F.col("offset").alias("span_offset"),
        "kind", "media_ref",
        F.expr(f"pmod(cast(substring(doc_id, 4) as bigint), {shards})").alias(
            "shard"
        ),
        cost.alias("cost_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "span_offset")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.withColumn(
            "start", F.coalesce(F.sum("cost_tokens").over(w), F.lit(0).cast("long"))
        )
        .select(
            "doc_id", "span_offset", "kind", "media_ref", "shard", "cost_tokens",
            F.expr(f"start div {budget}").alias("seq_id"),
            F.expr(f"start % {budget}").alias("offset_tokens"),
        )
    )


def curation_funnel(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source, q_keep, dedup_keep, sample_keep, final_keep,
    stage): the END-TO-END curation funnel — quality gate → exact dedup →
    stratified sample — as ONE relation with per-document stage attribution
    (``stage`` names the FIRST filter that dropped the doc, or 'kept').
    This is the composition a 100 TB curation run actually executes; the
    per-stage attribution is what makes its attrition auditable (how many
    docs did each rule cost?) and re-admittable by stage.

    Composition semantics pinned for determinism: each stage is evaluated
    corpus-wide (the dedup representative is keep-first by doc_id
    regardless of the quality verdict), attribution is sequential. Shape at
    scale: all three stage relations key on doc_id, so the funnel joins
    co-partition on one exchange family; the stages themselves keep their
    own audited plans (flat codegen gate, one content-hash exchange, zero-
    shuffle hash sampling).
    """
    from . import dedup as _dedup

    q = quality_gate(docs.select("doc_id", "text")).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    dropped = _dedup.exact_duplicates(docs.select("doc_id", "text")).select(
        "doc_id", F.lit(0).cast("long").alias("dup_flag")
    )
    samp = stratified_sample(docs).select(
        "doc_id", F.lit(1).cast("long").alias("samp_flag")
    )
    return (
        docs.select("doc_id", "lang", "source")
        .join(q, "doc_id")
        .join(dropped, "doc_id", "left")
        .join(samp, "doc_id", "left")
        .select(
            "doc_id", "lang", "source", "q_keep",
            F.coalesce("dup_flag", F.lit(1).cast("long")).alias("dedup_keep"),
            F.coalesce("samp_flag", F.lit(0).cast("long")).alias("sample_keep"),
        )
        .select(
            "doc_id", "lang", "source", "q_keep", "dedup_keep", "sample_keep",
            F.expr(
                "CASE WHEN q_keep = 1 AND dedup_keep = 1 AND sample_keep = 1"
                " THEN 1L ELSE 0L END"
            ).alias("final_keep"),
            F.expr(
                "CASE WHEN q_keep = 0 THEN 'quality'"
                " WHEN dedup_keep = 0 THEN 'duplicate'"
                " WHEN sample_keep = 0 THEN 'sample'"
                " ELSE 'kept' END"
            ).alias("stage"),
        )
    )


def docs_table(spark, sf_dir: str) -> DataFrame:
    """The full documents relation (dedup.docs_table keeps only id+text)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source"
    )


# PII patterns: the RE2 ∩ java.util.regex common subset ONLY (no
# backrefs, no lookaround, ASCII \d) so the engine (Java regex) and the
# DuckDB twin (RE2) match the exact same spans. The corpus is lowercased,
# so the email class needs no A-Z.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_PHONE = r"\+1-\d{3}-\d{4}"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, n_pii, redacted): PII
    detection + redaction — the scrubbing pass every public-web
    pretraining pipeline runs before training (Dolma's pii filter,
    CCNet post-processing; reference scope: the reference never ships
    user text to disk unscrubbed either, see mm_query context assembly).

    Counts are taken on the ORIGINAL text (order-independent: the three
    patterns cannot overlap — emails have no bare ``+1-`` prefix, the
    redaction tokens contain no digits), then spans are replaced
    email → ip → phone with typed placeholders so downstream tokenizers
    see structure, not secrets.

    Shape at scale: pure per-row JVM regexp expressions (codegen, no UDF,
    no shuffle) — the scan cost IS the regex cost, linear in corpus bytes,
    and the filter/projection pushes down to the parquet scan.
    """
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0)))
        .cast("long").alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0)))
        .cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
                PII_IPV4, "<IP>",
            ),
            PII_PHONE, "<PHONE>",
        ).alias("redacted"),
    ).withColumn(
        "n_pii", F.expr("n_emails + n_ipv4 + n_phones").cast("long")
    ).select("doc_id", "n_emails", "n_ipv4", "n_phones", "n_pii", "redacted")


def pii_seeded_docs(docs: DataFrame) -> DataFrame:
    """The driver fixture for :func:`pii_scrub`: the synthetic corpus
    contains no digits, so PII spans are seeded deterministically from
    doc_id (mod-3 → email, mod-5 → ipv4, mod-7 → phone; identical integer
    arithmetic in the DuckDB twin). This keeps the cross-engine gate
    non-vacuous: every count bucket and every placeholder is exercised,
    including docs carrying 2–3 PII kinds (doc_id % 15/21/35/105 == 0)."""
    return docs.select(
        "doc_id",
        F.expr(
            "concat(text,"
            " CASE WHEN doc_id % 3 = 0 THEN concat(' contact user',"
            "   cast(doc_id AS string), '@example.com for details')"
            "   ELSE '' END,"
            " CASE WHEN doc_id % 5 = 0 THEN concat(' node at 10.',"
            "   cast(doc_id % 256 AS string), '.',"
            "   cast((doc_id div 7) % 256 AS string), '.',"
            "   cast(doc_id % 250 AS string))"
            "   ELSE '' END,"
            " CASE WHEN doc_id % 7 = 0 THEN concat(' call +1-555-',"
            "   lpad(cast(doc_id % 10000 AS string), 4, '0'), ' now')"
            "   ELSE '' END)"
        ).alias("text"),
    )


def url_seeded_docs(docs: DataFrame) -> DataFrame:
    """Driver fixture for :func:`url_normalize`: the synthetic corpus has no
    URLs, so one is seeded per doc from doc_id, deliberately covering every
    normalization rule — scheme http/https (mod 2), `www.` prefix (mod 3),
    UPPERCASE host (mod 5), default port :80 (mod 13), tracking params
    utm_source/gclid (mod 4 / mod 9, with a KEPT param `ref` on mod 6 to
    prove selective removal + reordering), fragment (mod 11), trailing
    slash (mod 7). Hosts collide mod 50 and paths mod 100, so canonical
    URLs genuinely duplicate across docs (groups of ~5 at 500 docs) and
    the keep-first rank is non-vacuous. Same integer arithmetic in the
    DuckDB twin."""
    return docs.select(
        "doc_id",
        F.expr(
            "concat("
            " CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END,"
            " CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,"
            " CASE WHEN doc_id % 5 = 0"
            "   THEN concat('SITE', cast(doc_id % 50 AS string), '.EXAMPLE.ORG')"
            "   ELSE concat('site', cast(doc_id % 50 AS string), '.example.org')"
            " END,"
            " CASE WHEN doc_id % 13 = 0 THEN ':80' ELSE '' END,"
            " '/p/', cast(doc_id % 100 AS string),"
            " CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,"
            " CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_medium=rss'"
            "   WHEN doc_id % 9 = 0 THEN '?gclid=abc&b=2&a=1'"
            "   WHEN doc_id % 6 = 0 THEN '?ref=home&utm_campaign=x'"
            "   ELSE '' END,"
            " CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END)"
        ).alias("url"),
    )


def url_normalize(urls: DataFrame) -> DataFrame:
    """(doc_id, url, canonical_url, dup_rank): URL canonicalization — the
    first pass of any crawl-dedup pipeline (the same page is fetched under
    http/https, with/without www, with tracking params, fragments, default
    ports, trailing slashes) — plus a keep-first duplicate rank per
    canonical form.

    Rules (all pure JVM regexp/string codegen, zero UDFs, zero lambdas):
    drop scheme; drop leading `www.`; lowercase the host (ONLY the host —
    paths are case-sensitive); drop default ports :80/:443; drop the
    fragment; remove tracking params (utm_*, fbclid, gclid) but KEEP other
    params, re-sorted canonically (split → native array_sort → join, no
    HOF lambda); strip one trailing slash on a non-root path. dup_rank is
    a row_number window over (canonical_url, doc_id) — rank-not-pairs, so
    dedup stays linear in corpus size at any duplicate multiplicity (the
    `dup_paragraph` lesson). The single shuffle is that window's
    hash-partition by canonical_url.
    """
    c = F.col
    step = urls.select(
        "doc_id", "url",
        F.expr("regexp_replace(url, '^https?://', '')").alias("u0"),
    ).select(
        "doc_id", "url",
        F.expr("regexp_replace(u0, '^www\\\\.', '')").alias("u1"),
    ).select(
        "doc_id", "url",
        # split into host[:port][/path...], query, fragment
        F.expr("regexp_extract(u1, '^([^/?#]*)', 1)").alias("hostport"),
        F.expr("regexp_extract(u1, '^[^/?#]*([^?#]*)', 1)").alias("path"),
        F.expr("regexp_extract(u1, '\\\\?([^#]*)', 1)").alias("query"),
    ).select(
        "doc_id", "url",
        F.lower(F.expr("regexp_replace(hostport, ':(80|443)$', '')"))
        .alias("host"),
        F.expr(
            "CASE WHEN path IN ('', '/') THEN ''"
            " ELSE regexp_replace(path, '/$', '') END"
        ).alias("path"),
        F.expr(
            "regexp_replace(regexp_replace(query,"
            " '(^|&)(utm_[a-z]+|fbclid|gclid)=[^&]*', '$1'), '&+', '&')"
        ).alias("q0"),
    ).select(
        "doc_id", "url", "host", "path",
        F.expr(
            "array_join(array_sort(split("
            "  regexp_replace(q0, '^&|&$', ''), '&')), '&')"
        ).alias("q1"),
    ).select(
        "doc_id", "url",
        F.expr(
            "concat(host, path,"
            " CASE WHEN q1 = '' THEN '' ELSE concat('?', q1) END)"
        ).alias("canonical_url"),
    )
    w = Window.partitionBy("canonical_url").orderBy("doc_id")
    return step.select(
        "doc_id", "url", "canonical_url",
        F.row_number().over(w).cast("long").alias("dup_rank"),
    )


def token_budget_mix(
    docs: DataFrame, budget_tokens: int = 500
) -> DataFrame:
    """(doc_id, source, n_tokens, cum_tokens, kept): materialize a
    token-budget-bounded mixture — per source, documents are ranked by a
    deterministic md5 shuffle and admitted while the running token total
    stays within ``budget_tokens``. This is the EXECUTION step for the
    rates domain_mix computes: mixtures are specified in tokens, not
    document counts (a source of long documents exhausts its share with
    fewer docs), and the admission must be stable under re-runs and
    incremental appends — the md5 rank is position- and partition-free.

    The boundary contract is closed-prefix: a document is kept iff the
    running sum INCLUDING it fits the budget; the first overflowing doc
    and everything ranked after it are emitted with kept = false (the
    relation carries the audit trail, filter kept for the output corpus).

    Shape: token counts are a map-only projection (split cardinality);
    one window per source orders by (md5(doc_id), doc_id) and carries the
    running sum — a single exchange on source. Source partitions are the
    mixture's strata (tens to thousands) — balanced by construction at
    10^12 docs because the window state is one running long, not a
    buffered partition.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", "source",
        F.expr("size(split(text, ' '))").cast("long").alias("n_tokens"),
        F.expr("md5(cast(doc_id AS string))").alias("rk"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("rk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    ).selectExpr(
        "doc_id", "source", "n_tokens", "cum_tokens",
        f"cum_tokens <= {budget_tokens} AS kept",
    )
