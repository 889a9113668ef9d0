"""DuckDB-SQL twins for the training-data pipeline operators
(dedup / similarity / textstats). Integer-scaled metrics throughout →
bit-exact cross-engine comparison. Parameters mirror the operator defaults.
"""

from __future__ import annotations

from .config import DEFAULT, PipelineConfig


def dup_exact_sql() -> str:
    return """
WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents)
SELECT doc_id, keep_id, content_hash FROM (
  SELECT doc_id, content_hash,
         min(doc_id) OVER (PARTITION BY content_hash) AS keep_id
  FROM h
) t WHERE doc_id <> keep_id
"""


def _shingle_cte(cfg: PipelineConfig) -> str:
    k = cfg.shingle_size
    return f"""
d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(list_slice(w, j + 1, j + {k}), ' ')
                        for j in range(greatest(len(w) - {k}, 0) + 1)]) AS sh
  FROM d
)"""


def dup_minhash_sql(threshold: float = 0.5, cfg: PipelineConfig = DEFAULT) -> str:
    perms, bands = cfg.minhash_perms, cfg.minhash_bands
    r = perms // bands
    t = int(threshold * 1_000_000)
    return f"""
WITH {_shingle_cte(cfg)},
mh AS (
  SELECT doc_id, CAST(p.i AS INT) AS i,
         min(md5(CAST(p.i AS VARCHAR) || '|' || u.s)) AS m
  FROM sh, UNNEST(sh.sh) AS u(s), UNNEST(range({perms})) AS p(i)
  GROUP BY doc_id, p.i
),
bands AS (
  SELECT doc_id, i // {r} AS band,
         md5(string_agg(m, '|' ORDER BY i)) AS bkey
  FROM mh GROUP BY doc_id, i // {r}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
)
SELECT c.a, c.b,
       len(list_intersect(sa.sh, sb.sh)) * 1000000
         // len(list_distinct(sa.sh || sb.sh)) AS jaccard_pm
FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
WHERE len(list_intersect(sa.sh, sb.sh)) * 1000000
      // len(list_distinct(sa.sh || sb.sh)) >= {t}
"""


def dup_clusters_sql(threshold: float = 0.5, cfg: PipelineConfig = DEFAULT) -> str:
    """Connected components over the verified minhash pair graph via a
    recursive transitive-closure CTE: cluster_rep = min doc_id reachable
    (singletons are their own representative) — the exact twin of the
    Spark min-label-propagation fixpoint."""
    perms, bands = cfg.minhash_perms, cfg.minhash_bands
    r = perms // bands
    t = int(threshold * 1_000_000)
    return f"""
WITH RECURSIVE {_shingle_cte(cfg)},
mh AS (
  SELECT doc_id, CAST(p.i AS INT) AS i,
         min(md5(CAST(p.i AS VARCHAR) || '|' || u.s)) AS m
  FROM sh, UNNEST(sh.sh) AS u(s), UNNEST(range({perms})) AS p(i)
  GROUP BY doc_id, p.i
),
bands AS (
  SELECT doc_id, i // {r} AS band,
         md5(string_agg(m, '|' ORDER BY i)) AS bkey
  FROM mh GROUP BY doc_id, i // {r}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
),
pairs AS (
  SELECT c.a, c.b
  FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
  WHERE len(list_intersect(sa.sh, sb.sh)) * 1000000
        // len(list_distinct(sa.sh || sb.sh)) >= {t}
),
edges AS (
  SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
),
reach(x, y) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
)
SELECT x AS doc_id, min(y) AS cluster_rep FROM reach GROUP BY x
"""


def _simhash_cte() -> str:
    from .operators.dedup import SIMHASH_BITS

    return f"""
st AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hv AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, {SIMHASH_BITS // 4}))::BIGINT AS hv FROM st),
votes AS (
  SELECT doc_id, CAST(r.j AS INT) AS j,
         sum(CASE WHEN (hv >> CAST(r.j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hv, UNNEST(range({SIMHASH_BITS})) AS r(j) GROUP BY doc_id, r.j
),
sim AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)"""


def dup_simhash_sql() -> str:
    return f"WITH {_simhash_cte()} SELECT doc_id, simhash FROM sim"


def dup_simhash_pairs_sql(max_hamming: int = 2) -> str:
    from .operators.dedup import SIMHASH_BLOCKS, _BLOCK_BITS, _BLOCK_MASK

    blocks = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS h,"
        f" (simhash >> {i * _BLOCK_BITS}) & {_BLOCK_MASK} AS hk FROM sim"
        for i in range(SIMHASH_BLOCKS)
    )
    return f"""
WITH {_simhash_cte()},
halves AS (
  SELECT doc_id, simhash, h, hk FROM ({blocks}) u
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         x.simhash AS sa, y.simhash AS sb
  FROM halves x JOIN halves y
    ON x.h = y.h AND x.hk = y.hk AND x.doc_id < y.doc_id
)
SELECT a, b, bit_count(xor(sa, sb)) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


_QE = """
qe AS (
  SELECT vec_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS q
  FROM embeddings
),
qn AS (
  SELECT vec_id, q, CAST(list_sum([x * x for x in q]) AS BIGINT) AS n FROM qe
)"""

def _dot_expr(qa: str, qb: str) -> str:
    """Integer dot product, dimension-dynamic (len(q) like the Spark side's
    size(q) — no hard-coded embedding width). list_sum over BIGINT products is
    exact and order-irrelevant."""
    return (
        f"CAST(coalesce(list_sum([{qa}[i + 1] * {qb}[i + 1]"
        f" for i in range(len({qa}))]), 0) AS BIGINT)"
    )


def dup_embedding_sql(
    cos_threshold: float = 0.4, tables: int = 8, planes: int = 3
) -> str:
    """LSH-bucketed candidates + exact integer verification (twin of
    dedup.embedding_near_duplicates — equi-join on (table, bucket), never
    all-pairs)."""
    t2 = int(round(cos_threshold * cos_threshold * 10_000))
    dot = _dot_expr("a.q", "b.q")
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, {_bucket_expr('q', t, planes)} AS bucket, {t} AS tbl FROM qn"
        for t in range(tables)
    )
    return f"""
WITH {_QE},
qb AS ({per_table}),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM qb x JOIN qb y
    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT c.a, c.b, {dot} AS dot, a.n AS na, b.n AS nb
FROM cand c JOIN qn a ON a.vec_id = c.a JOIN qn b ON b.vec_id = c.b
WHERE {dot} > 0 AND {dot} * {dot} * 10000 >= {t2} * a.n * b.n
"""


_RANK_SQL = (
    "(CASE WHEN {dot} >= 0 THEN 1 ELSE -1 END)"
    " * (({dot} * {dot}) // greatest((na * nb) // 1000000, 1))"
)


def ann_topk_sql(k: int = 5, n_queries: int = 10) -> str:
    dot = _dot_expr("q.q", "c.q")
    rank = _RANK_SQL.format(dot="dot")
    return f"""
WITH {_QE},
pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, {dot} AS dot,
         q.n AS na, c.n AS nb
  FROM qn q JOIN qn c ON q.vec_id < {n_queries} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT qid, cid, dot, {rank} AS rank_key,
         row_number() OVER (PARTITION BY qid
                            ORDER BY {rank} DESC, cid ASC) AS rnk
  FROM pairs
)
SELECT qid, cid, dot, rank_key, rnk FROM ranked WHERE rnk <= {k}
"""


def ann_sq8_topk_sql(k: int = 5, n_queries: int = 10) -> str:
    """Twin of similarity.ann_sq8_topk: per-dim [min,max] stats (zipped
    parallel UNNESTs -> one ordered list pair), 8-bit code + integer
    reconstruction inside a list comprehension, then the shared
    pairs/rank/top-k shape. All-integer => exact hash."""
    dot = _dot_expr("q.q", "c.q")
    rank = _RANK_SQL.format(dot="dot")
    recon = (
        "[mns[i + 1] + ((((q[i + 1] - mns[i + 1]) * 255)"
        " // greatest(mxs[i + 1] - mns[i + 1], 1))"
        " * (mxs[i + 1] - mns[i + 1])) // 255 for i in range(len(q))]"
    )
    return f"""
WITH {_QE},
sq_stats AS (
  SELECT i, MIN(x) AS mn, MAX(x) AS mx
  FROM (SELECT unnest(q) AS x, unnest(range(1, len(q) + 1)) AS i FROM qe)
  GROUP BY i
),
sq_lists AS (
  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM sq_stats
),
sqn AS (
  SELECT vec_id, q, CAST(list_sum([x * x for x in q]) AS BIGINT) AS n
  FROM (SELECT vec_id, {recon} AS q FROM qe, sq_lists)
),
pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, {dot} AS dot,
         q.n AS na, c.n AS nb
  FROM sqn q JOIN sqn c ON q.vec_id < {n_queries} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT qid, cid, dot, {rank} AS rank_key,
         row_number() OVER (PARTITION BY qid
                            ORDER BY {rank} DESC, cid ASC) AS rnk
  FROM pairs
)
SELECT qid, cid, dot, rank_key, rnk FROM ranked WHERE rnk <= {k}
"""


def _bucket_expr(q: str, table: int, planes: int = 3) -> str:
    bits = []
    for p in range(planes):
        comp = (
            f"list_sum([CASE WHEN ('0x' || substr(md5('{table}:{p}|' || CAST(d AS VARCHAR)), 1, 1))::BIGINT % 2 = 0"
            f" THEN {q}[d + 1] ELSE -{q}[d + 1] END for d in range(len({q}))])"
        )
        bits.append(f"(CASE WHEN {comp} >= 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def ann_lsh_topk_sql(
    k: int = 5, n_queries: int = 10, tables: int = 8, planes: int = 3
) -> str:
    dot = _dot_expr("qq.q", "cc.q")
    rank = _RANK_SQL.format(dot="dot")
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, {_bucket_expr('q', t, planes)} AS bucket, {t} AS tbl FROM qn"
        for t in range(tables)
    )
    return f"""
WITH {_QE},
qb AS ({per_table}),
cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
  FROM qb q JOIN qb c
    ON q.tbl = c.tbl AND q.bucket = c.bucket
   AND q.vec_id < {n_queries} AND q.vec_id <> c.vec_id
),
pairs AS (
  SELECT cand.qid, cand.cid, {dot} AS dot, qq.n AS na, cc.n AS nb
  FROM cand JOIN qn qq ON qq.vec_id = cand.qid JOIN qn cc ON cc.vec_id = cand.cid
),
ranked AS (
  SELECT qid, cid, dot, {rank} AS rank_key,
         row_number() OVER (PARTITION BY qid
                            ORDER BY {rank} DESC, cid ASC) AS rnk
  FROM pairs
)
SELECT qid, cid, dot, rank_key, rnk FROM ranked WHERE rnk <= {k}
"""


def token_stats_sql() -> str:
    return """
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       len(w) AS n_tokens,
       len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
       length(text) AS n_chars,
       CAST(list_sum([length(x) for x in w]) * 1000000 // len(w) AS BIGINT)
         AS avg_token_len_ppm
FROM d
"""


def quality_sql() -> str:
    from .operators.textstats import STOPWORDS

    lst = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id,
         len(list_filter(w, x -> x IN ({lst}))) * 1000000::BIGINT AS stop_num,
         len(list_distinct(w)) * 1000000::BIGINT AS dist_num,
         least(len(w), 200) * 1000000::BIGINT AS len_num,
         len(w) AS n
  FROM d
)
SELECT doc_id,
       stop_num // n AS stopword_ppm,
       dist_num // n AS distinct_ratio_ppm,
       ((dist_num // n) * 5 + (1000000 - stop_num // n) * 3
        + (len_num // 200) * 2) // 10 AS quality_ppm
FROM c
"""


def langid_sql() -> str:
    from .operators.textstats import LANG_PROFILES

    branches = []
    for lang, words in sorted(LANG_PROFILES.items()):
        lst = ", ".join(f"'{s}'" for s in words)
        branches.append(
            f"SELECT doc_id, '{lang}' AS lang,"
            f" len(list_filter(w, x -> x IN ({lst}))) AS hits FROM d"
        )
    union = " UNION ALL ".join(branches)
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
scores AS ({union}),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, lang ASC) AS rn
  FROM scores
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_guess,
       hits
FROM best WHERE rn = 1
"""


def fingerprints_sql(window: int = 5) -> str:
    return f"""
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, md5(text) AS doc_md5,
       list_min([md5(array_to_string(list_slice(w, j + 1, j + {window}), ' '))
                 for j in range(greatest(len(w) - {window}, 0) + 1)]) AS winnow
FROM d
"""


def ann_ivf_topk_sql(
    k: int = 5, n_queries: int = 10, n_centroids: int = 16, nprobe: int = 4
) -> str:
    """Twin of similarity.ann_ivf_topk: md5-seeded centroids, argmax list
    assignment, nprobe-list probing, exact integer scoring."""
    dot_vc = _dot_expr("v.q", "c.cv")
    dot = _dot_expr("qq.q", "cc.q")
    rank = _RANK_SQL.format(dot="dot")
    return f"""
WITH {_QE},
cents AS (
  SELECT row_number() OVER (ORDER BY mk, vec_id) AS cent_id, q AS cv, n AS cn
  FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS mk, vec_id, q, n FROM qn
        ORDER BY mk, vec_id LIMIT {n_centroids}) seeds
),
arank AS (
  SELECT v.vec_id, c.cent_id, {dot_vc} AS dot, v.n AS na, c.cn AS nb
  FROM qn v CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {rank} DESC, cent_id ASC) AS rn
    FROM arank) t WHERE rn = 1
),
probe AS (
  SELECT vec_id AS qid, cent_id FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {rank} DESC, cent_id ASC) AS rn
    FROM arank WHERE vec_id < {n_queries}) t WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.qid, a.vec_id AS cid
  FROM probe p JOIN assign a ON a.cent_id = p.cent_id
  WHERE p.qid <> a.vec_id
),
pairs AS (
  SELECT cand.qid, cand.cid, {dot} AS dot, qq.n AS na, cc.n AS nb
  FROM cand JOIN qn qq ON qq.vec_id = cand.qid
            JOIN qn cc ON cc.vec_id = cand.cid
),
ranked AS (
  SELECT qid, cid, dot, {rank} AS rank_key,
         row_number() OVER (PARTITION BY qid
                            ORDER BY {rank} DESC, cid ASC) AS rnk
  FROM pairs
)
SELECT qid, cid, dot, rank_key, rnk FROM ranked WHERE rnk <= {k}
"""


def ngram_jaccard_sql(
    threshold: float = 0.5, max_df: int = 100000, cfg: PipelineConfig = DEFAULT
) -> str:
    """Twin of dedup.ngram_jaccard_pairs: inverted-index exact Jaccard with
    the identical stop-shingle df cap; union sizes from the FULL sets."""
    t = int(threshold * 1_000_000)
    return f"""
WITH {_shingle_cte(cfg)},
posted0 AS (
  SELECT doc_id, u.s AS s FROM sh, UNNEST(sh.sh) AS u(s)
),
rare AS (
  SELECT s FROM posted0 GROUP BY s HAVING count(*) <= {max_df}
),
posted AS (
  SELECT p.doc_id, p.s FROM posted0 p JOIN rare r ON r.s = p.s
),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM posted x JOIN posted y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM posted0 GROUP BY doc_id)
SELECT i.a, i.b,
       i.inter * 1000000 // (sa.n + sb.n - i.inter) AS jaccard_pm
FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
WHERE i.inter * 1000000 // (sa.n + sb.n - i.inter) >= {t}
"""


def tfidf_sql(k: int = 5) -> str:
    """Twin of textstats.tfidf_topk: raw-ratio integer IDF, top-k per doc by
    (tfidf_ppm desc, term asc)."""
    return f"""
WITH toks AS (
  SELECT doc_id, u.t AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(w) AS u(t)
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, tfidf_ppm, rnk FROM (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * ((n.n_docs * 1000000) // d.df) AS tfidf_ppm,
         ROW_NUMBER() OVER (
           PARTITION BY t.doc_id
           ORDER BY t.tf * ((n.n_docs * 1000000) // d.df) DESC, t.term ASC
         ) AS rnk
  FROM tf t JOIN dfq d USING (term), n
) WHERE rnk <= {k}
"""


# the multiplicative doc_id hash of operators/curation.py, DuckDB spelling
# (% on non-negative operands == Spark's pmod here)
_CURATION_HASH = "((doc_id % 2147483647) * 2654435761) % 4294967296 % 1000000"


def stratified_sample_sql(
    rates_ppm: dict[str, int] | None = None, default_ppm: int = 125_000
) -> str:
    """Twin of curation.stratified_sample: hash-bucket membership per
    language stratum."""
    from .operators.curation import DEFAULT_RATES_PPM

    rates = DEFAULT_RATES_PPM if rates_ppm is None else rates_ppm
    case = "CASE lang " + " ".join(
        f"WHEN '{lang}' THEN {ppm}" for lang, ppm in sorted(rates.items())
    ) + f" ELSE {default_ppm} END"
    return f"""
SELECT doc_id, lang, source, bucket_ppm, rate_ppm FROM (
  SELECT doc_id, lang, source,
         CAST({_CURATION_HASH} AS BIGINT) AS bucket_ppm,
         CAST({case} AS BIGINT) AS rate_ppm
  FROM documents
) WHERE bucket_ppm < rate_ppm
"""


def stratified_sample_2d_sql(
    rates_2d_ppm: dict[tuple[str, str], int] | None = None,
    lang_rates_ppm: dict[str, int] | None = None,
    default_ppm: int = 125_000,
) -> str:
    """Twin of curation.stratified_sample_2d: nested CASE — (lang, source)
    override, then per-lang rate, then default — over the same hash bucket."""
    from .operators.curation import DEFAULT_RATES_2D_PPM, DEFAULT_RATES_PPM

    rates2 = DEFAULT_RATES_2D_PPM if rates_2d_ppm is None else rates_2d_ppm
    lang_rates = DEFAULT_RATES_PPM if lang_rates_ppm is None else lang_rates_ppm
    lang_case = "CASE lang " + " ".join(
        f"WHEN '{lang}' THEN {ppm}" for lang, ppm in sorted(lang_rates.items())
    ) + f" ELSE {default_ppm} END"
    pair_case = "CASE " + " ".join(
        f"WHEN lang = '{lang}' AND source = '{source}' THEN {ppm}"
        for (lang, source), ppm in sorted(rates2.items())
    ) + f" ELSE {lang_case} END"
    return f"""
SELECT doc_id, lang, source, bucket_ppm, rate_ppm FROM (
  SELECT doc_id, lang, source,
         CAST({_CURATION_HASH} AS BIGINT) AS bucket_ppm,
         CAST({pair_case} AS BIGINT) AS rate_ppm
  FROM documents
) WHERE bucket_ppm < rate_ppm
"""


def stratified_budget_sql(
    budgets: dict[str, int] | None = None, default_budget: int = 5
) -> str:
    """Twin of curation.stratified_budget: per-stratum row_number over
    (bucket_ppm, doc_id), kept while rank <= budget."""
    from .operators.curation import DEFAULT_BUDGETS

    bud = DEFAULT_BUDGETS if budgets is None else budgets
    case = "CASE lang " + " ".join(
        f"WHEN '{lang}' THEN {b}" for lang, b in sorted(bud.items())
    ) + f" ELSE {default_budget} END"
    return f"""
SELECT doc_id, lang, source, bucket_ppm, stratum_rank, budget_n FROM (
  SELECT doc_id, lang, source, bucket_ppm, budget_n,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY bucket_ppm, doc_id) AS BIGINT)
           AS stratum_rank
  FROM (
    SELECT doc_id, lang, source,
           CAST({_CURATION_HASH} AS BIGINT) AS bucket_ppm,
           CAST({case} AS BIGINT) AS budget_n
    FROM documents
  )
) WHERE stratum_rank <= budget_n
"""


def decontaminate_sql(
    n: int = 4, eval_from_ppm: int = 950_000, min_hits: int = 1
) -> str:
    """Twin of curation.decontaminate: md5 word n-grams, eval stratum =
    top hash slice, hit positions counted against the DISTINCT eval set."""
    return f"""
WITH d AS (
  SELECT doc_id,
         CAST({_CURATION_HASH} AS BIGINT) AS bucket_ppm,
         string_split(text, ' ') AS w
  FROM documents
),
g AS (
  SELECT doc_id, bucket_ppm,
         [md5(array_to_string(list_slice(w, j + 1, j + {n}), ' '))
          for j in range(greatest(len(w) - {n}, 0) + 1)] AS grams
  FROM d
),
ev AS (
  SELECT DISTINCT u.g AS gram
  FROM g, UNNEST(grams) AS u(g) WHERE bucket_ppm >= {eval_from_ppm}
),
tr AS (
  SELECT doc_id, len(grams) AS n_grams, u.g AS gram
  FROM g, UNNEST(grams) AS u(g) WHERE bucket_ppm < {eval_from_ppm}
),
h AS (
  SELECT tr.doc_id, count(*) AS hit_grams, min(tr.n_grams) AS n_grams
  FROM tr JOIN ev ON ev.gram = tr.gram GROUP BY tr.doc_id
)
SELECT doc_id,
       CAST(hit_grams AS BIGINT) AS hit_grams,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(hit_grams * 1000000 // n_grams AS BIGINT) AS contam_ppm
FROM h WHERE hit_grams >= {min_hits}
"""


def repetition_sql() -> str:
    """Twin of textstats.repetition_scores: most-frequent 2-gram share +
    duplicated 3-gram position fraction, exact integers."""
    return """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g2 AS (
  SELECT doc_id, u.g AS gram FROM (
    SELECT doc_id,
           [array_to_string(list_slice(w, j + 1, j + 2), ' ')
            for j in range(greatest(len(w) - 2, 0) + 1)] AS gs
    FROM d), UNNEST(gs) AS u(g)
),
c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY doc_id, gram),
top2 AS (
  SELECT doc_id, gram AS top_2gram, cnt FROM (
    SELECT doc_id, gram, cnt,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, gram ASC) AS rn
    FROM c2) WHERE rn = 1
),
g3 AS (
  SELECT doc_id, u.g AS gram FROM (
    SELECT doc_id,
           [array_to_string(list_slice(w, j + 1, j + 3), ' ')
            for j in range(greatest(len(w) - 3, 0) + 1)] AS gs
    FROM d), UNNEST(gs) AS u(g)
),
c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY doc_id, gram),
dup3 AS (
  SELECT doc_id,
         COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt END), 0) AS dup_pos,
         SUM(cnt) AS tot3
  FROM c3 GROUP BY doc_id
),
sz AS (SELECT doc_id, greatest(len(w) - 2, 0) + 1 AS tot2 FROM d)
SELECT t.doc_id, t.top_2gram,
       CAST(t.cnt * 1000000 // s.tot2 AS BIGINT) AS top2gram_ppm,
       CAST(d3.dup_pos * 1000000 // d3.tot3 AS BIGINT) AS dup3gram_ppm
FROM top2 t JOIN sz s USING (doc_id) JOIN dup3 d3 USING (doc_id)
"""


def crossdoc_span_sql(n: int = 8, min_docs: int = 2, max_df: int = 100_000) -> str:
    """Twin of dedup.crossdoc_span_coverage: cross-document duplicated
    k-gram interval-union coverage per doc, exact integers."""
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
occ AS (
  SELECT doc_id, u.o.j AS j, u.o.g AS g FROM (
    SELECT doc_id,
           CASE WHEN len(w) >= {n} THEN
             [{{'j': j,
                'g': md5(array_to_string(list_slice(w, j + 1, j + {n}), ' '))}}
              for j in range(len(w) - {n} + 1)]
           ELSE [] END AS os
    FROM d), UNNEST(os) AS u(o)
),
dup AS (
  SELECT g FROM occ GROUP BY g
  HAVING count(DISTINCT doc_id) >= {min_docs}
     AND count(DISTINCT doc_id) <= {max_df}
),
hit AS (SELECT doc_id, j FROM occ WHERE g IN (SELECT g FROM dup)),
cov AS (
  SELECT doc_id, count(*) AS dup_starts,
         SUM(CASE WHEN prev IS NULL THEN {n}
                  ELSE least({n}, j - prev) END) AS covered
  FROM (SELECT doc_id, j,
               lag(j) OVER (PARTITION BY doc_id ORDER BY j) AS prev
        FROM hit)
  GROUP BY doc_id
),
sz AS (SELECT doc_id, len(w) AS n_tokens FROM d)
SELECT s.doc_id,
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.dup_starts, 0) AS BIGINT) AS dup_starts,
       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_tokens,
       CAST(COALESCE(c.covered, 0) * 1000000 // s.n_tokens AS BIGINT) AS dup_ppm
FROM sz s LEFT JOIN cov c USING (doc_id)
"""


def quality_gate_sql() -> str:
    """Twin of curation.quality_gate: Gopher-rule composite filter with
    named violation reasons."""
    from .operators.curation import (
        GATE_MAX_DUP3GRAM_PPM,
        GATE_MAX_TOKENS,
        GATE_MAX_TOP2GRAM_PPM,
        GATE_MAX_AVG_TOKEN_LEN_PPM,
        GATE_MIN_AVG_TOKEN_LEN_PPM,
        GATE_MIN_DISTINCT_PPM,
        GATE_MIN_TOKENS,
    )
    from .operators.textstats import STOPWORDS

    lst = ", ".join(f"'{s}'" for s in STOPWORDS)
    rules = [
        ("too_short", f"n_tokens < {GATE_MIN_TOKENS}"),
        ("too_long", f"n_tokens > {GATE_MAX_TOKENS}"),
        (
            "bad_token_len",
            f"avg_len_ppm < {GATE_MIN_AVG_TOKEN_LEN_PPM}"
            f" OR avg_len_ppm > {GATE_MAX_AVG_TOKEN_LEN_PPM}",
        ),
        ("no_stopwords", "stopword_ppm = 0"),
        ("low_diversity", f"distinct_ratio_ppm < {GATE_MIN_DISTINCT_PPM}"),
        ("top2gram", f"top2gram_ppm > {GATE_MAX_TOP2GRAM_PPM}"),
        ("dup3gram", f"dup3gram_ppm > {GATE_MAX_DUP3GRAM_PPM}"),
    ]
    reason_cols = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' END" for name, cond in rules
    )
    any_bad = " OR ".join(c for _, c in rules)
    return f"""
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
base AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         len(list_filter(w, x -> x IN ({lst}))) * 1000000::BIGINT // len(w)
           AS stopword_ppm,
         len(list_distinct(w)) * 1000000::BIGINT // len(w)
           AS distinct_ratio_ppm,
         (length(text) - len(w) + 1) * 1000000::BIGINT // len(w)
           AS avg_len_ppm
  FROM d
),
g2 AS (
  SELECT doc_id, u.g AS gram FROM (
    SELECT doc_id,
           [array_to_string(list_slice(w, j + 1, j + 2), ' ')
            for j in range(greatest(len(w) - 2, 0) + 1)] AS gs
    FROM d), UNNEST(gs) AS u(g)
),
c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY doc_id, gram),
top2 AS (
  SELECT doc_id, cnt FROM (
    SELECT doc_id, cnt,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, gram ASC) AS rn
    FROM c2) WHERE rn = 1
),
g3 AS (
  SELECT doc_id, u.g AS gram FROM (
    SELECT doc_id,
           [array_to_string(list_slice(w, j + 1, j + 3), ' ')
            for j in range(greatest(len(w) - 3, 0) + 1)] AS gs
    FROM d), UNNEST(gs) AS u(g)
),
c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY doc_id, gram),
dup3 AS (
  SELECT doc_id,
         COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt END), 0) AS dup_pos,
         SUM(cnt) AS tot3
  FROM c3 GROUP BY doc_id
),
sz AS (SELECT doc_id, greatest(len(w) - 2, 0) + 1 AS tot2 FROM d),
rep AS (
  SELECT t.doc_id,
         CAST(t.cnt * 1000000 // s.tot2 AS BIGINT) AS top2gram_ppm,
         CAST(d3.dup_pos * 1000000 // d3.tot3 AS BIGINT) AS dup3gram_ppm
  FROM top2 t JOIN sz s USING (doc_id) JOIN dup3 d3 USING (doc_id)
),
j AS (SELECT * FROM base JOIN rep USING (doc_id))
SELECT doc_id, n_tokens, stopword_ppm, distinct_ratio_ppm,
       top2gram_ppm, dup3gram_ppm,
       CAST(CASE WHEN {any_bad} THEN 0 ELSE 1 END AS BIGINT) AS keep,
       concat_ws(',', {reason_cols}) AS reasons
FROM j
"""


def sessionize_sql(gap_us: int = 1_800_000_000) -> str:
    """Twin of events.sessionize: gap sessions via lag + running flag sum."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
t AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT user_id, event_id, ts_us,
               lag(ts_us) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS prev_us
        FROM e)
),
s AS (
  SELECT user_id, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM t
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ts_us) AS BIGINT) AS first_us,
       CAST(max(ts_us) AS BIGINT) AS last_us,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us
FROM s GROUP BY user_id, session_idx
"""


def tumbling_rollup_sql(width_us: int = 3_600_000_000) -> str:
    """Twin of events.tumbling_rollup: tumbling window counts + cent sums."""
    return f"""
SELECT CAST(epoch_us(ts) - epoch_us(ts) % {width_us} AS BIGINT) AS bucket_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events
GROUP BY 1, 2
"""


def pack_interleaved_sql(
    budget: int = 512, image_tokens: int = 64, shards: int = 8
) -> str:
    """Twin of curation.pack_interleaved: interleaved text+media packing
    over the spans relation (oracle.py's shared CTE prefix)."""
    from .oracle import q

    return q(f"""
SELECT doc_id, span_offset, kind, media_ref, shard, cost_tokens,
       CAST(start // {budget} AS BIGINT) AS seq_id,
       CAST(start % {budget} AS BIGINT) AS offset_tokens
FROM (
  SELECT doc_id, span_offset, kind, media_ref, shard, cost_tokens,
         COALESCE(SUM(cost_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id, span_offset
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM (
    SELECT doc_id, "offset" AS span_offset, kind, media_ref,
           CAST(substr(doc_id, 4) AS BIGINT) % {shards} AS shard,
           CAST(CASE WHEN kind = 'image' THEN {image_tokens}
                     ELSE len(string_split(text, ' ')) END AS BIGINT)
             AS cost_tokens
    FROM spans))
""")


def pack_sequences_sql(budget: int = 256, shards: int = 8) -> str:
    """Twin of curation.pack_sequences: per-shard running token sum in
    doc_id order, cut into fixed-budget sequences."""
    return f"""
SELECT doc_id, shard, n_tokens,
       start // {budget} AS seq_id,
       start % {budget} AS offset_tokens
FROM (
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start
  FROM (
    SELECT doc_id, doc_id % {shards} AS shard,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
  )
)
"""


def bm25_sql(k: int = 10, n_query_terms: int = 3) -> str:
    """Twin of textstats.bm25_topk: rarest-terms query set, raw-ratio integer
    IDF, integer-cleared tf saturation (k1=1.2, b=0.75). All-integer => exact
    hash; `//` on non-negative operands == Spark's `div` here."""
    score = (
        "(((2 * (n.n_docs - t.df) + 1) * 1000000) // (2 * t.df + 1))"
        " * ((22 * t2.tf * n.total_len * 1000000)"
        "    // (10 * t2.tf * n.total_len + 3 * n.total_len + 9 * l.dl * n.n_docs))"
        " // 1000000"
    )
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
toks AS (
  SELECT doc_id, u.t AS term FROM base, UNNEST(w) AS u(t)
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(w)) AS BIGINT) AS total_len FROM base),
dls AS (SELECT doc_id, len(w) AS dl FROM base),
qterms AS (SELECT term, df FROM dfq ORDER BY df ASC, term ASC LIMIT {n_query_terms})
SELECT term, doc_id, tf, df, score_ppm, rnk FROM (
  SELECT t2.term, t2.doc_id, t2.tf, t.df, {score} AS score_ppm,
         ROW_NUMBER() OVER (
           PARTITION BY t2.term ORDER BY {score} DESC, t2.doc_id ASC
         ) AS rnk
  FROM tf t2 JOIN qterms t USING (term) JOIN dls l USING (doc_id), n
) WHERE rnk <= {k}
"""


def asof_join_sql(left_type: str = "purchase", right_type: str = "click") -> str:
    """Twin of events.asof_join: the identical union + carry-forward window
    (not DuckDB's native ASOF JOIN, whose duplicate-timestamp tie-break is
    unspecified — the shared window order pins it). All-integer outputs."""
    return f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         CASE WHEN event_type = '{left_type}' THEN 1 ELSE 0 END AS side
  FROM events WHERE event_type IN ('{left_type}', '{right_type}')
),
filled AS (
  SELECT event_id, user_id, ts_us, value_cents, side,
         last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w
           AS click_event_id,
         last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS) OVER w
           AS click_ts_us
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_event_id, user_id, ts_us AS purchase_ts_us,
       value_cents, click_event_id, click_ts_us,
       ts_us - click_ts_us AS lag_us
FROM filled WHERE side = 1
"""


def hll_distinct_sql(group_col: str = "event_type", key_col: str = "user_id") -> str:
    """Twin of sketches.hll_distinct over the events table: identical md5
    hash, bucket split, capped leading-zero rank, and integer estimator."""
    from .operators.sketches import ALPHA_PPM, M, RHO_CAP

    return f"""
WITH hashed AS (
  SELECT {group_col} AS grp,
         ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
regs AS (
  SELECT grp, h % {M} AS j,
         MAX(least(54 - length(bin(h // {M})), {RHO_CAP})) AS m_j
  FROM hashed GROUP BY grp, h % {M}
),
folded AS (
  SELECT grp,
         CAST(SUM(1::BIGINT << ({RHO_CAP} - m_j)) AS BIGINT) AS t_present,
         COUNT(*) AS v
  FROM regs GROUP BY grp
),
est AS (
  SELECT grp,
         (({ALPHA_PPM * M * M * (1 << RHO_CAP)}
          // (t_present + ({M} - v) * {1 << RHO_CAP}))) // 1000000
           AS hll_estimate
  FROM folded
),
exact AS (
  SELECT {group_col} AS grp, COUNT(DISTINCT {key_col}) AS n_exact FROM events
  GROUP BY {group_col}
)
SELECT e.grp AS {group_col}, e.n_exact, s.hll_estimate,
       abs(s.hll_estimate - e.n_exact) * 1000000 // greatest(e.n_exact, 1)
         AS err_pm
FROM exact e JOIN est s ON e.grp = s.grp
"""


def value_quantiles_sql(quantiles_pm=(500_000, 900_000, 990_000)) -> str:
    """Twin of events.value_quantiles: identical rank arithmetic (row_number
    over (cents, event_id), integer ceil-division rank target)."""
    labels = {500_000: "p50_cents", 900_000: "p90_cents", 990_000: "p99_cents"}
    aggs = ",\n       ".join(
        f"MAX(CASE WHEN r = (n * {q} + 999999) // 1000000 THEN cents END)"
        f" AS {labels.get(q, f'p{q}_cents')}"
        for q in quantiles_pm
    )
    return f"""
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents, event_id
  FROM events
),
ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM base
)
SELECT event_type, MAX(n) AS n,
       {aggs}
FROM ranked GROUP BY event_type
"""


def funnel_sql(stages: tuple[str, str, str] = ("view", "click", "purchase")) -> str:
    """Twin of events.funnel: three chained whole-partition min windows —
    each stage's earliest timestamp strictly after the previous stage's."""
    s0, s1, s2 = stages
    return f"""
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
  WHERE event_type IN ('{s0}', '{s1}', '{s2}')
),
v AS (
  SELECT user_id, event_type, ts_us,
         MIN(CASE WHEN event_type = '{s0}' THEN ts_us END)
           OVER (PARTITION BY user_id) AS view_us
  FROM base
),
c AS (
  SELECT user_id, event_type, ts_us, view_us,
         MIN(CASE WHEN event_type = '{s1}' AND ts_us > view_us THEN ts_us END)
           OVER (PARTITION BY user_id) AS click_us
  FROM v
),
p AS (
  SELECT user_id, view_us, click_us,
         MIN(CASE WHEN event_type = '{s2}' AND ts_us > click_us THEN ts_us END)
           OVER (PARTITION BY user_id) AS purchase_us
  FROM c
)
SELECT user_id,
       MAX(view_us) AS view_us,
       MAX(click_us) AS click_us,
       MAX(purchase_us) AS purchase_us,
       CAST(CASE WHEN MAX(purchase_us) IS NOT NULL THEN 3
                 WHEN MAX(click_us) IS NOT NULL THEN 2
                 WHEN MAX(view_us) IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage
FROM p GROUP BY user_id
"""


def retention_sql(grain_us: int = 86_400_000_000) -> str:
    """Twin of events.retention: first-day window + distinct + count."""
    return f"""
WITH days AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(ts) % {grain_us} AS day_us
  FROM events
),
tagged AS (
  SELECT user_id, day_us,
         MIN(day_us) OVER (PARTITION BY user_id) AS cohort_us
  FROM days
),
d AS (
  SELECT DISTINCT cohort_us,
         CAST((day_us - cohort_us) // {grain_us} AS BIGINT) AS day_offset,
         user_id
  FROM tagged
)
SELECT cohort_us, day_offset, CAST(COUNT(*) AS BIGINT) AS n_users
FROM d GROUP BY cohort_us, day_offset
"""


def domain_mix_sql() -> str:
    """Twin of curation.domain_mix: rank-proportional target shares, exact
    integer ppm resampling rates (`//` == Spark `div` on non-negatives)."""
    return """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
ranked AS (
  SELECT source, n_docs, n_tokens,
         ROW_NUMBER() OVER (ORDER BY source) AS rnk,
         COUNT(*) OVER () AS k,
         SUM(n_tokens) OVER () AS total_tokens
  FROM per
)
SELECT source, n_docs, n_tokens,
       CAST(rnk * 2000000 // (k * (k + 1)) AS BIGINT) AS target_ppm,
       CAST(total_tokens * (rnk * 2000000 // (k * (k + 1))) // 1000000
            AS BIGINT) AS target_tokens,
       CAST(least(1000000, total_tokens * (rnk * 2000000 // (k * (k + 1)))
            // 1000000 * 1000000 // n_tokens) AS BIGINT) AS rate_ppm,
       CAST(total_tokens * (rnk * 2000000 // (k * (k + 1)))
            // 1000000 * 1000000 // n_tokens AS BIGINT) AS epochs_ppm
FROM ranked
"""


def paragraph_dedup_sql(para_words: int = 16) -> str:
    """Twin of dedup.paragraph_dedup: identical block split, md5 hash, and
    keep-first occurrence rank by (doc_id, para_idx)."""
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
paras AS (
  SELECT doc_id, g.i AS para_idx,
         md5(array_to_string(
           w[g.i * {para_words} + 1 : g.i * {para_words} + {para_words}],
           ' ')) AS para_hash
  FROM base, UNNEST(generate_series(0, (len(w) - 1) // {para_words})) AS g(i)
),
flagged AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY para_hash
                            ORDER BY doc_id, para_idx) AS rn
  FROM paras
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS dup_ppm
FROM flagged GROUP BY doc_id
"""


def dsir_sql(n: int = 2, buckets: int = 4096, target_lang: str = "en") -> str:
    """Twin of curation.dsir_weights: identical md5 bucket hash, add-one
    smoothed importance ratios in integer ppm, per-doc mean."""
    return f"""
WITH base AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(array_to_string(
            w[g.j + 1 : g.j + {n}], ' ')), 1, 15))::BIGINT % {buckets} AS b
  FROM base, UNNEST(generate_series(0, len(w) - {n})) AS g(j)
  WHERE len(w) >= {n}
),
stats AS (
  SELECT b,
         COUNT(*) AS cr,
         SUM(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS ct,
         SUM(COUNT(*)) OVER () AS r_tot,
         SUM(SUM(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END))
           OVER () AS t_tot
  FROM grams GROUP BY b
),
ratios AS (
  SELECT b,
         (ct + 1) * (r_tot + {buckets}) * 1000000
           // ((cr + 1) * (t_tot + {buckets})) AS ratio_ppm
  FROM stats
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(ratio_ppm) AS BIGINT) AS sum_ratio_ppm
  FROM grams JOIN ratios USING (b) GROUP BY doc_id
),
mean AS (
  SELECT SUM(sum_ratio_ppm) // SUM(n_grams) AS mean_ppm FROM per_doc
)
SELECT d.doc_id, d.lang,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(p.sum_ratio_ppm, 0) AS sum_ratio_ppm,
       CAST(COALESCE(p.sum_ratio_ppm, 0)
            // greatest(COALESCE(p.n_grams, 0), 1) AS BIGINT)
         AS avg_ratio_ppm,
       CAST(CASE WHEN COALESCE(p.sum_ratio_ppm, 0)
                      // greatest(COALESCE(p.n_grams, 0), 1) >= m.mean_ppm
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM (SELECT doc_id, lang FROM documents) d
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
CROSS JOIN mean m
"""


def hopping_rollup_sql(
    width_us: int = 3_600_000_000, hop_us: int = 900_000_000
) -> str:
    """Twin of events.hopping_rollup: window-instance explode via
    generate_series, identical integer bucket arithmetic."""
    return f"""
WITH inst AS (
  SELECT g.s AS win_start_us, event_type, user_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events,
       UNNEST(generate_series(
         epoch_us(ts) - epoch_us(ts) % {hop_us} - {width_us - hop_us},
         epoch_us(ts) - epoch_us(ts) % {hop_us},
         {hop_us})) AS g(s)
)
SELECT win_start_us, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(cents) AS BIGINT) AS sum_value_cents
FROM inst GROUP BY win_start_us, event_type
"""


def winnow_sql(k: int = 5, window: int = 4) -> str:
    """Twin of textstats.winnow_fingerprints: identical md5-int64 gram hash,
    strict trailing-window minimum selector, fp sharing count."""
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, g.j AS pos,
         ('0x' || substr(md5(array_to_string(
            w[g.j + 1 : g.j + {k}], ' ')), 1, 15))::BIGINT AS h
  FROM base, UNNEST(generate_series(0, len(w) - {k})) AS g(j)
  WHERE len(w) >= {k}
),
sel AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos, h AS fp
  FROM (
    SELECT doc_id, pos, h,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {window - 1} PRECEDING AND 1 PRECEDING)
             AS prev_min
    FROM grams)
  WHERE prev_min IS NULL OR h < prev_min
),
sharing AS (
  SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM sel GROUP BY fp
)
SELECT s.doc_id, s.pos, s.fp, sh.n_docs
FROM sel s JOIN sharing sh USING (fp)
"""


def lm_scores_sql() -> str:
    """Twin of textstats.lm_scores: per-(doc,bigram) tf, corpus conditional
    ratios in integer ppm, per-doc occurrence-weighted mean."""
    return """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
occ AS (
  SELECT doc_id, w[g.j + 1] AS w1, w[g.j + 2] AS w2
  FROM base, UNNEST(generate_series(0, len(w) - 2)) AS g(j)
  WHERE len(w) >= 2
),
tf AS (
  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
  FROM occ GROUP BY doc_id, w1, w2
),
big AS (SELECT w1, w2, SUM(tf) AS c2 FROM tf GROUP BY w1, w2),
pre AS (SELECT w1, SUM(c2) AS c1 FROM big GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT w) AS v FROM (
    SELECT w2 AS w FROM big UNION ALL SELECT w1 AS w FROM big)
),
ratios AS (
  SELECT b.w1, b.w2, b.c2 * 1000000 // (p.c1 + vb.v) AS ratio_ppm
  FROM big b JOIN pre p USING (w1) CROSS JOIN vocab vb
)
SELECT t.doc_id,
       CAST(SUM(t.tf) AS BIGINT) AS n_bigrams,
       CAST(SUM(t.tf * r.ratio_ppm) AS BIGINT) AS sum_ppm,
       CAST(SUM(t.tf * r.ratio_ppm) // SUM(t.tf) AS BIGINT) AS avg_ppm
FROM tf t JOIN ratios r ON t.w1 = r.w1 AND t.w2 = r.w2
GROUP BY t.doc_id
"""


def anomalies_sql(k: int = 2) -> str:
    """Twin of events.anomalies: exact rank-median + rank-MAD, identical
    lower-median rank target (n+1)//2 and integer ppm deviation."""
    return f"""
WITH base AS (
  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, v AS med_cents FROM (
    SELECT event_type, cents AS v,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY cents, event_id) AS r,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM base)
  WHERE r = (n + 1) // 2
),
dev AS (
  SELECT b.event_id, b.event_type, b.cents, m.med_cents,
         abs(b.cents - m.med_cents) AS adev
  FROM base b JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, v AS mad_cents FROM (
    SELECT event_type, adev AS v,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY adev, event_id) AS r,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM dev)
  WHERE r = (n + 1) // 2
)
SELECT d.event_id, d.event_type, d.cents, d.med_cents, md.mad_cents,
       CAST(d.adev * 1000000 // greatest(md.mad_cents, 1) AS BIGINT)
         AS dev_ppm,
       CAST(CASE WHEN d.adev > {k} * md.mad_cents THEN 1 ELSE 0 END
            AS BIGINT) AS is_anomaly
FROM dev d JOIN mad md USING (event_type)
"""


def markov_sql() -> str:
    """Twin of events.markov_transitions: identical lag order and integer
    ppm row-normalization; '^' marks sequence starts."""
    return """
WITH seq AS (
  SELECT COALESCE(lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id),
                  '^') AS prev_type,
         event_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
         AS p_ppm
FROM pairs
"""


def gini_sql() -> str:
    """Twin of textstats.gini_diversity: exact integer Gini impurity."""
    return """
WITH counts AS (
  SELECT doc_id, u.w AS word, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       UNNEST(ws) AS u(w)
  GROUP BY doc_id, u.w
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(c * c) AS BIGINT) AS sum_sq,
       CAST(1000000 - SUM(c * c) * 1000000 // (SUM(c) * SUM(c)) AS BIGINT)
         AS gini_ppm
FROM counts GROUP BY doc_id
"""


def curation_funnel_sql() -> str:
    """Twin of curation.curation_funnel: the three stage twins composed as
    CTEs (each stage's own oracle SQL verbatim), sequential attribution."""
    return f"""
WITH q AS ({quality_gate_sql()}),
dd AS ({dup_exact_sql()}),
samp AS ({stratified_sample_sql()})
SELECT d.doc_id, d.lang, d.source,
       q.keep AS q_keep,
       CAST(CASE WHEN dd.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS dedup_keep,
       CAST(CASE WHEN samp.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS sample_keep,
       CAST(CASE WHEN q.keep = 1 AND dd.doc_id IS NULL
                      AND samp.doc_id IS NOT NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS final_keep,
       CASE WHEN q.keep = 0 THEN 'quality'
            WHEN dd.doc_id IS NOT NULL THEN 'duplicate'
            WHEN samp.doc_id IS NULL THEN 'sample'
            ELSE 'kept' END AS stage
FROM documents d
JOIN q ON d.doc_id = q.doc_id
LEFT JOIN dd ON d.doc_id = dd.doc_id
LEFT JOIN samp ON d.doc_id = samp.doc_id
"""


def countmin_sql(d: int = 4, w: int = 256) -> str:
    """Twin of sketches.countmin_heavy_hitters over (user_id:event_type)
    keys: identical md5 row hashes, cell build, and min-probe."""
    return f"""
WITH keyed AS (
  SELECT concat(user_id, ':', event_type) AS k FROM events
),
rows_ AS (
  SELECT k, g.i AS i,
         ('0x' || substr(md5(concat(g.i, ':', k)), 1, 15))::BIGINT % {w}
           AS bucket
  FROM keyed, UNNEST(generate_series(0, {d - 1})) AS g(i)
),
cells AS (
  SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM rows_ GROUP BY i, bucket
),
exact AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_exact FROM keyed GROUP BY k),
probes AS (
  SELECT p.k, MIN(c.c) AS cm_estimate
  FROM (
    SELECT e.k, g.i AS i,
           ('0x' || substr(md5(concat(g.i, ':', e.k)), 1, 15))::BIGINT % {w}
             AS bucket
    FROM exact e, UNNEST(generate_series(0, {d - 1})) AS g(i)
  ) p JOIN cells c ON p.i = c.i AND p.bucket = c.bucket
  GROUP BY p.k
)
SELECT e.k AS key, e.n_exact, p.cm_estimate,
       CAST((p.cm_estimate - e.n_exact) * 1000000
            // greatest(e.n_exact, 1) AS BIGINT) AS over_pm
FROM exact e JOIN probes p ON e.k = p.k
"""


def pii_sql() -> str:
    """Twin of curation.pii_scrub over curation.pii_seeded_docs: identical
    doc_id-seeded PII spans, RE2 patterns from the same Java∩RE2 subset,
    and the same email → ip → phone redaction order ('g' = global, the
    Java-regexp_replace default)."""
    from .operators.curation import PII_EMAIL, PII_IPV4, PII_PHONE

    return f"""
WITH seeded AS (
  SELECT doc_id,
         concat(text,
           CASE WHEN doc_id % 3 = 0
                THEN concat(' contact user', CAST(doc_id AS VARCHAR),
                            '@example.com for details') ELSE '' END,
           CASE WHEN doc_id % 5 = 0
                THEN concat(' node at 10.', CAST(doc_id % 256 AS VARCHAR),
                            '.', CAST((doc_id // 7) % 256 AS VARCHAR),
                            '.', CAST(doc_id % 250 AS VARCHAR)) ELSE '' END,
           CASE WHEN doc_id % 7 = 0
                THEN concat(' call +1-555-',
                            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                            ' now') ELSE '' END) AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS BIGINT)
         AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
         AS n_phones,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
            + len(regexp_extract_all(text, '{PII_IPV4}'))
            + len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
         AS n_pii,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_IPV4}', '<IP>', 'g'),
         '{PII_PHONE}', '<PHONE>', 'g') AS redacted
FROM seeded
"""


def containment_sql(
    threshold: float = 0.5, max_df: int = 100_000, cfg: PipelineConfig = DEFAULT
) -> str:
    """Twin of dedup.containment_pairs: directed shingle containment
    |S_src ∩ S_dst| / |S_src| with the identical stop-shingle df cap;
    denominators from the FULL sets."""
    t = int(threshold * 1_000_000)
    return f"""
WITH {_shingle_cte(cfg)},
posted0 AS (
  SELECT doc_id, u.s AS s FROM sh, UNNEST(sh.sh) AS u(s)
),
rare AS (
  SELECT s FROM posted0 GROUP BY s HAVING count(*) <= {max_df}
),
posted AS (
  SELECT p.doc_id, p.s FROM posted0 p JOIN rare r ON r.s = p.s
),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM posted x JOIN posted y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
dirs AS (
  SELECT a AS src, b AS dst, inter FROM inter
  UNION ALL
  SELECT b AS src, a AS dst, inter FROM inter
),
sizes AS (SELECT doc_id, count(*) AS n FROM posted0 GROUP BY doc_id)
SELECT b.src, b.dst, b.inter * 1000000 // s.n AS containment_pm
FROM dirs b JOIN sizes s ON s.doc_id = b.src
WHERE b.inter * 1000000 // s.n >= {t}
"""


def readability_sql() -> str:
    """Twin of textstats.readability: integer LIX with the same greedy
    `[^ ]{{7,}}` long-word regex and min-1 sentence floor."""
    return """
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(text, '[^ ]{7,}')) AS BIGINT) AS n_long
  FROM documents
)
SELECT doc_id, n_words, n_sentences,
       n_words * 1000000 // n_sentences AS wps_ppm,
       n_long * 1000000 // n_words AS long_ppm,
       n_words * 1000000 // n_sentences
         + 100 * (n_long * 1000000 // n_words) AS lix_ppm
FROM base
"""


def cooccurrence_sql(max_basket: int = 10_000, min_users: int = 1) -> str:
    """Twin of events.cooccurrence_lift: per-user event-type baskets with
    the identical basket-size cap on the pair join; marginals and N from
    ALL users."""
    return f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type AS item FROM events
),
small AS (
  SELECT user_id FROM ut GROUP BY user_id HAVING count(*) <= {max_basket}
),
basket AS (
  SELECT u.user_id, u.item FROM ut u JOIN small s ON s.user_id = u.user_id
),
pairs AS (
  SELECT p.item AS a, q.item AS b, count(*) AS n_xy
  FROM basket p JOIN basket q
    ON p.user_id = q.user_id AND p.item < q.item
  GROUP BY p.item, q.item
  HAVING count(*) >= {min_users}
),
dirs AS (
  SELECT a AS x, b AS y, n_xy FROM pairs
  UNION ALL
  SELECT b AS x, a AS y, n_xy FROM pairs
),
marg AS (SELECT item, count(*) AS n FROM ut GROUP BY item),
total AS (SELECT count(DISTINCT user_id) AS n_users FROM ut)
SELECT b.x, b.y, mx.n AS n_x, my.n AS n_y, b.n_xy,
       b.n_xy * 1000000 // t.n_users AS support_ppm,
       b.n_xy * 1000000 // mx.n AS confidence_ppm,
       b.n_xy * t.n_users * 1000000 // (mx.n * my.n) AS lift_ppm
FROM dirs b
JOIN marg mx ON mx.item = b.x
JOIN marg my ON my.item = b.y
CROSS JOIN total t
"""


def semantic_clusters_sql(
    cos_threshold: float = 0.4, tables: int = 8, planes: int = 3
) -> str:
    """Twin of dedup.semantic_clusters: the dup_embedding_sql pair relation
    verbatim, closed under a recursive min-reachability CTE over vec_ids."""
    t2 = int(round(cos_threshold * cos_threshold * 10_000))
    dot = _dot_expr("a.q", "b.q")
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, {_bucket_expr('q', t, planes)} AS bucket, {t} AS tbl FROM qn"
        for t in range(tables)
    )
    return f"""
WITH RECURSIVE {_QE},
qb AS ({per_table}),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM qb x JOIN qb y
    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
pairs AS (
  SELECT c.a, c.b
  FROM cand c JOIN qn a ON a.vec_id = c.a JOIN qn b ON b.vec_id = c.b
  WHERE {dot} > 0 AND {dot} * {dot} * 10000 >= {t2} * a.n * b.n
),
edges AS (
  SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
),
reach(x, y) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
)
SELECT x AS vec_id, min(y) AS cluster_rep FROM reach GROUP BY x
"""


def url_normalize_sql() -> str:
    """Twin of curation.url_normalize over curation.url_seeded_docs:
    identical seeded URLs (same doc_id arithmetic and CASE precedence) and
    the same canonicalization chain. DuckDB regexp_replace needs the 'g'
    flag (Spark's is global by default) and \\1 backrefs (Spark: $1)."""
    return r"""
WITH seeded AS (
  SELECT doc_id,
         concat(
           CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END,
           CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
           CASE WHEN doc_id % 5 = 0
             THEN concat('SITE', CAST(doc_id % 50 AS VARCHAR), '.EXAMPLE.ORG')
             ELSE concat('site', CAST(doc_id % 50 AS VARCHAR), '.example.org')
           END,
           CASE WHEN doc_id % 13 = 0 THEN ':80' ELSE '' END,
           '/p/', CAST(doc_id % 100 AS VARCHAR),
           CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,
           CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_medium=rss'
                WHEN doc_id % 9 = 0 THEN '?gclid=abc&b=2&a=1'
                WHEN doc_id % 6 = 0 THEN '?ref=home&utm_campaign=x'
                ELSE '' END,
           CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END) AS url
  FROM documents
),
s1 AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(url, '^https?://', ''),
                        '^www\.', '') AS u1
  FROM seeded
),
s2 AS (
  SELECT doc_id, url,
         regexp_extract(u1, '^([^/?#]*)', 1) AS hostport,
         regexp_extract(u1, '^[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(u1, '\?([^#]*)', 1) AS query
  FROM s1
),
s3 AS (
  SELECT doc_id, url,
         lower(regexp_replace(hostport, ':(80|443)$', '')) AS host,
         CASE WHEN path IN ('', '/') THEN ''
              ELSE regexp_replace(path, '/$', '') END AS path,
         regexp_replace(
           regexp_replace(query, '(^|&)(utm_[a-z]+|fbclid|gclid)=[^&]*',
                          '\1', 'g'),
           '&+', '&', 'g') AS q0
  FROM s2
),
s4 AS (
  SELECT doc_id, url, host, path,
         array_to_string(
           list_sort(string_split(
             regexp_replace(q0, '^&|&$', '', 'g'), '&')), '&') AS q1
  FROM s3
),
canon AS (
  SELECT doc_id, url,
         concat(host, path,
                CASE WHEN q1 = '' THEN '' ELSE concat('?', q1) END)
           AS canonical_url
  FROM s4
)
SELECT doc_id, url, canonical_url,
       CAST(row_number() OVER (PARTITION BY canonical_url ORDER BY doc_id)
            AS BIGINT) AS dup_rank
FROM canon
"""


def stickiness_sql(window_days: int = 7) -> str:
    """Twin of events.stickiness: same hopping explode and integer day
    buckets (DAY_US microseconds)."""
    day = 86_400_000_000
    return f"""
WITH base AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // {day}) * {day} AS day_us
  FROM events
),
dau AS (
  SELECT day_us, count(DISTINCT user_id) AS dau FROM base GROUP BY day_us
),
contrib AS (
  SELECT DISTINCT b.user_id, b.day_us + {day} * u.k AS day_us
  FROM base b, UNNEST(range({window_days})) AS u(k)
),
wau AS (
  SELECT day_us, count(DISTINCT user_id) AS wau FROM contrib GROUP BY day_us
)
SELECT d.day_us, d.dau, w.wau,
       d.dau * 1000000 // w.wau AS stickiness_ppm
FROM dau d JOIN wau w ON w.day_us = d.day_us
"""


def interarrival_sql() -> str:
    """Twin of events.interarrival: lag over (ts, event_id), percentile_disc
    rank-rule median, exact integers."""
    return """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
gaps AS (
  SELECT user_id,
         ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS gap
  FROM base
  QUALIFY gap IS NOT NULL
),
ranked AS (
  SELECT user_id, gap,
         row_number() OVER (PARTITION BY user_id ORDER BY gap) AS r,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM gaps
)
SELECT user_id,
       max(n) AS n_gaps,
       min(gap) AS min_gap_us,
       max(CASE WHEN r = (n * 500000 + 999999) // 1000000 THEN gap END)
         AS median_gap_us,
       max(gap) AS max_gap_us
FROM ranked GROUP BY user_id
"""


def hapax_sql() -> str:
    """Twin of textstats.hapax_stats."""
    return """
WITH tok AS (
  SELECT doc_id, u.t AS t
  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
),
per AS (
  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS hapax_ppm,
       CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_ppm
FROM per GROUP BY doc_id
"""


def docsim_sql(k: int = 3, max_df: int = 200, tf_cap: int = 1000) -> str:
    """Twin of textstats.docsim_topk: identical df-capped feature space,
    integer idf_mil weights, unnormalized dot, per-doc top-k with
    (dot DESC, other_id ASC) ties."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
total AS (SELECT COUNT(*) AS n_docs FROM documents),
feat AS (
  SELECT t.term, t.doc_id,
         least(t.tf, {tf_cap}) * ((x.n_docs * 1000) // f.df) AS w
  FROM tf t JOIN dfreq f ON t.term = f.term AND f.df <= {max_df}
  CROSS JOIN total x
),
pairs AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS other_id,
         SUM(CAST(a.w AS HUGEINT) * b.w) AS dot_x,
         CAST(COUNT(*) AS BIGINT) AS shared_terms
  FROM feat a JOIN feat b
    ON a.term = b.term AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_id, other_id, CAST(dot_x AS DOUBLE) AS dot_w, shared_terms, rnk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY dot_x DESC, other_id ASC) AS BIGINT) AS rnk
  FROM pairs
) WHERE rnk <= {k}
"""


def source_drift_sql() -> str:
    """Twin of textstats.source_drift: identical ppm floor-div
    distributions and total-variation halving."""
    return """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
sc AS (SELECT source, term, COUNT(*) AS c FROM toks GROUP BY source, term),
stot AS (SELECT source, SUM(c) AS tot_s FROM sc GROUP BY source),
corpus AS (SELECT term, COUNT(*) AS cc FROM toks GROUP BY term),
ctot AS (SELECT SUM(cc) AS tot FROM corpus),
corpus_p AS (
  SELECT term, cc * 1000000 // tot AS p_ppm FROM corpus CROSS JOIN ctot
),
aligned AS (
  SELECT s.source, p.term, p.p_ppm,
         COALESCE(c.c, 0) * 1000000 // s.tot_s AS ps_ppm,
         CASE WHEN c.c IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM corpus_p p
  CROSS JOIN stot s
  LEFT JOIN sc c ON c.source = s.source AND c.term = p.term
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(hit) AS BIGINT) AS n_overlap,
       CAST(SUM(abs(ps_ppm - p_ppm)) // 2 AS BIGINT) AS tv_ppm
FROM aligned GROUP BY source
"""


def cusum_sql(
    slack_pct: int = 25, threshold_x: int = 3, grain_us: int = 86_400_000_000
) -> str:
    """Twin of events.cusum_changepoints: the same densified day grid and
    prefix-sum/prefix-min rewrite of the one-sided CUSUM recurrence."""
    return f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // {grain_us} AS day, COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1, SUM(x) AS total
  FROM daily GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(range(d0, d1 + 1)) AS day,
         (total * 1000000) // (d1 - d0 + 1) AS mean_ppm
  FROM span
),
dense AS (
  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x, g.mean_ppm,
         COALESCE(d.x, 0) * 1000000 - g.mean_ppm
           - (g.mean_ppm * {slack_pct}) // 100 AS dd
  FROM grid g LEFT JOIN daily d
    ON d.event_type = g.event_type AND d.day = g.day
),
pref AS (
  SELECT event_type, day, x, mean_ppm,
         SUM(dd) OVER wp AS ct
  FROM dense
  WINDOW wp AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cum AS (
  SELECT event_type, day, x, mean_ppm,
         ct - least(MIN(ct) OVER wp, 0) AS cusum_ppm
  FROM pref
  WINDOW wp AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(x AS BIGINT) AS x,
       CAST(cusum_ppm AS BIGINT) AS cusum_ppm,
       cusum_ppm > {threshold_x} * mean_ppm AS alarm
FROM cum
"""


def bpe_pairs_sql(k: int = 32) -> str:
    """Twin of textstats.bpe_pair_counts: identical in-word adjacent
    char-pair rule and (count DESC, left, right) top-k."""
    return f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
pairs AS (
  SELECT substr(word, i, 1) AS "left", substr(word, i + 1, 1) AS "right"
  FROM (SELECT word, unnest(range(1, length(word))) AS i
        FROM words WHERE length(word) >= 2)
),
counts AS (
  SELECT "left", "right", CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1, 2
)
SELECT "left", "right", n_pairs, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY n_pairs DESC, "left", "right")
                 AS BIGINT) AS rnk
  FROM counts
) WHERE rnk <= {k}
"""


def token_budget_mix_sql(budget_tokens: int = 500) -> str:
    """Twin of curation.token_budget_mix: identical md5 shuffle rank and
    closed-prefix running-sum admission."""
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS rk
  FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens,
       SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         <= {budget_tokens} AS kept
FROM toks
"""


def rfm_sql(quantiles: int = 4) -> str:
    """Twin of events.rfm_segments: identical per-user collapse, day floor
    division, and total-ordered ntile tie contract."""
    return f"""
WITH per_user AS (
  SELECT user_id, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS frequency,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events GROUP BY user_id
),
mark AS (SELECT MAX(last_us) AS mark_us FROM per_user),
base AS (
  SELECT user_id, (mark_us - last_us) // 86400000000 AS recency_days,
         frequency, monetary_cents
  FROM per_user CROSS JOIN mark
)
SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency, monetary_cents,
       CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
       CAST(m_q AS BIGINT) AS m_q,
       CAST(100 * r_q + 10 * f_q + m_q AS BIGINT) AS rfm_code
FROM (
  SELECT *,
         ntile({quantiles}) OVER (ORDER BY recency_days ASC, user_id ASC) AS r_q,
         ntile({quantiles}) OVER (ORDER BY frequency DESC, user_id ASC) AS f_q,
         ntile({quantiles}) OVER (ORDER BY monetary_cents DESC, user_id ASC) AS m_q
  FROM base
)
"""


def canonical_docs_sql() -> str:
    """Twin of dedup.canonical_documents: the dup_clusters and quality
    stage twins composed verbatim, then one full-frame first_value window
    per cluster with the identical (quality DESC, doc_id ASC) election."""
    return f"""
WITH cl AS ({dup_clusters_sql()}),
q AS ({quality_sql()})
SELECT doc_id, cluster_rep, quality_ppm,
       FIRST_VALUE(doc_id) OVER (
         PARTITION BY cluster_rep
         ORDER BY quality_ppm DESC, doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS canonical_id,
       doc_id = FIRST_VALUE(doc_id) OVER (
         PARTITION BY cluster_rep
         ORDER BY quality_ppm DESC, doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS kept
FROM (
  SELECT cl.doc_id, cl.cluster_rep, q.quality_ppm
  FROM cl JOIN q USING (doc_id)
)
"""
