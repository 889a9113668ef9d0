"""Text analysis over the documents table: language-ID heuristic, quality
scoring, token counting, document fingerprinting.

All pure column expressions (whole-stage codegen; zero Python) with exact
DuckDB twins. Float-valued scores are emitted as 10^6-scaled integers so the
cross-engine comparison is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword profiles (public common function words);
# the heuristic is argmax hit-count with deterministic tie-break by lang code
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "de", "et", "un"),
    "de": ("der", "die", "das", "und", "ein"),
    "zh": ("的", "是", "了", "在", "和"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_alpha_tokens, n_chars, avg_token_len_ppm)."""
    w = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long").alias("n_alpha_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.expr(
            "aggregate(split(text, ' '), cast(0 as long), (a, x) -> a + length(x))"
            " * 1000000L div size(split(text, ' '))"
        ).alias("avg_token_len_ppm"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, stopword_ppm, distinct_ratio_ppm, quality_ppm).

    quality = 0.5·distinct_ratio + 0.3·(1 − stopword_ratio) + 0.2·len_norm,
    len_norm = min(n_tokens, 200)/200 — a standard heuristic mix of
    repetitiveness, boilerplate and length signals, integer-scaled.
    """
    w = F.split("text", " ")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n = F.size(w)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), x -> x in ({stop_list}))"))
    n_dist = F.size(F.array_distinct(w))
    out = docs.select(
        "doc_id",
        (n_stop * F.lit(1_000_000)).alias("_stop_num"),
        (n_dist * F.lit(1_000_000)).alias("_dist_num"),
        (F.least(n, F.lit(200)) * F.lit(1_000_000)).alias("_len_num"),
        n.alias("_n"),
    ).selectExpr(
        "doc_id",
        "_stop_num div _n AS stopword_ppm",
        "_dist_num div _n AS distinct_ratio_ppm",
        "((_dist_num div _n) * 5 + (1000000 - _stop_num div _n) * 3"
        " + (_len_num div 200) * 2) div 10 AS quality_ppm",
    )
    return out


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_guess, hits): stopword-profile argmax with tie-break by
    (hits desc, lang asc); 'und' when no profile hits."""
    w = F.split("text", " ")
    hit_structs = []
    for lang, words in sorted(LANG_PROFILES.items()):
        lst = ", ".join(f"'{s}'" for s in words)
        hit_structs.append(
            F.struct(
                F.size(F.expr(f"filter(split(text, ' '), x -> x in ({lst}))")).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax with (hits desc, lang asc) tie-break via comparator array_sort
    arr = F.array(*hit_structs)
    best = F.expr(
        "element_at(array_sort(hstructs, (l, r) -> case"
        " when l.hits > r.hits then -1 when l.hits < r.hits then 1"
        " when l.lang < r.lang then -1 when l.lang > r.lang then 1 else 0 end), 1)"
    )
    out = docs.withColumn("hstructs", arr).withColumn("best", best)
    return out.select(
        "doc_id",
        F.when(F.col("best.hits") > 0, F.col("best.lang")).otherwise(F.lit("und")).alias("lang_guess"),
        F.col("best.hits").cast("long").alias("hits"),
    )


def fingerprints(docs: DataFrame, window: int = 5) -> DataFrame:
    """(doc_id, doc_md5, winnow): winnowing-lite fingerprint — the minimum
    md5 over sliding word 5-grams (robust to local edits), plus full-doc md5."""
    return docs.select(
        "doc_id",
        F.md5("text").alias("doc_md5"),
        F.array_min(
            F.expr(
                f"transform(sequence(0, greatest(size(split(text, ' ')) - {window}, 0)),"
                f" j -> md5(concat_ws(' ', slice(split(text, ' '), j + 1, {window}))))"
            )
        ).alias("winnow"),
    )
