"""DuckDB-SQL twins of every SQL-expressible pipeline stage.

The driver registers the testdata parquet files as DuckDB views (``documents``
etc.) and compares each ``queries()`` DataFrame against the matching SQL here
(row count + schema + order-insensitive value hash). The CTE chain below
re-derives, in pure ANSI-ish SQL, exactly what the Spark operators compute:

    documents -> spans -> chunks -> mentions/triples -> nodes/edges
                       -> media spans -> image nodes/edges -> unified graph

Keeping this in one place guarantees all oracles share one definition of the
synthetic derivation rules (mmgraphrag_spark.synth / config.py).
"""

from __future__ import annotations

from .config import DEFAULT, PipelineConfig


def cte_prefix(cfg: PipelineConfig = DEFAULT) -> str:
    w = cfg.span_words
    every = cfg.media_every
    mod = cfg.media_doc_mod
    cap = cfg.caption_words
    step = cfg.chunk_max_tokens - cfg.chunk_overlap_tokens
    mx = cfg.chunk_max_tokens
    mlen = cfg.mention_min_len
    clen = cfg.concept_min_len
    K = cfg.fusion_window
    return f"""
WITH toks AS (
  SELECT doc_id AS orig_id,
         'doc' || CAST(doc_id AS VARCHAR) AS doc_id,
         string_split(text, ' ') AS w,
         CAST(ceil(len(string_split(text, ' ')) / {w}.0) AS INT) AS n_spans
  FROM documents
),
idx AS (
  SELECT orig_id, doc_id, w, CAST(u.i AS INT) AS i
  FROM toks, UNNEST(range(n_spans)) AS u(i)
),
tspans AS (
  SELECT doc_id, i, 0 AS sub, 'text' AS kind,
         array_to_string(list_slice(w, i*{w}+1, i*{w}+{w}), ' ') AS text,
         '' AS media_ref
  FROM idx
),
mspans AS (
  SELECT doc_id, i, 1 AS sub, 'image' AS kind,
         array_to_string(list_slice(w, i*{w}+1, i*{w}+{cap}), ' ') AS text,
         doc_id || '/image_' || CAST((i+1)//{every} AS VARCHAR) AS media_ref
  FROM idx WHERE orig_id % {mod} = 0 AND (i+1) % {every} = 0
),
spans AS (
  SELECT doc_id, kind, text, media_ref,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i, sub) - 1 AS INT) AS "offset"
  FROM (SELECT * FROM tspans UNION ALL SELECT * FROM mspans) u
),
chunk_raw AS (
  SELECT doc_id,
         CAST(u.i AS INT) AS chunk_order_index,
         array_to_string(list_slice(w, i*{step}+1, i*{step}+{mx}), ' ') AS content,
         CAST(len(list_slice(w, i*{step}+1, i*{step}+{mx})) AS INT) AS tokens
  FROM (SELECT doc_id, w, CAST(ceil(len(w)/{step}.0) AS INT) AS n_chunks FROM toks) c,
       UNNEST(range(n_chunks)) AS u(i)
),
chunks AS (
  SELECT chunk_id, doc_id, chunk_order_index, tokens, content FROM (
    SELECT 'chunk-' || md5(content) AS chunk_id, doc_id, chunk_order_index, tokens, content,
           row_number() OVER (PARTITION BY md5(content)
                              ORDER BY doc_id, chunk_order_index) AS rn
    FROM chunk_raw
  ) d WHERE rn = 1
),
ctoks AS (
  SELECT doc_id, chunk_id, CAST(u.i AS INT) AS pos,
         string_split(content, ' ')[CAST(u.i AS INT) + 1] AS tok
  FROM chunks, UNNEST(range(len(string_split(content, ' ')))) AS u(i)
),
ments AS (
  SELECT doc_id, chunk_id, pos,
         upper(tok) AS entity_name,
         CASE WHEN len(tok) >= {clen} THEN 'CONCEPT'
              WHEN pos % 2 = 0 THEN 'TERM' ELSE 'LABEL' END AS entity_type,
         tok || ' in ' || chunk_id AS description,
         chunk_id AS source_id
  FROM ctoks WHERE len(tok) >= {mlen}
),
mentions AS (
  SELECT DISTINCT doc_id, chunk_id, entity_name, entity_type, description, source_id
  FROM ments
),
mseq AS (
  SELECT *, row_number() OVER (PARTITION BY chunk_id ORDER BY pos) AS rnk FROM ments
),
triples AS (
  SELECT a.doc_id, a.chunk_id,
         least(a.entity_name, b.entity_name) AS subj,
         greatest(a.entity_name, b.entity_name) AS obj,
         'co-occurs' AS description,
         CAST(1.0 AS DOUBLE) AS weight,
         a.chunk_id AS source_id,
         1 AS "order"
  FROM mseq a JOIN mseq b ON a.chunk_id = b.chunk_id AND b.rnk = a.rnk + 1
  WHERE a.entity_name <> b.entity_name
),
media AS (
  SELECT doc_id, media_ref, text AS context, "offset" AS media_offset
  FROM spans WHERE kind = 'image'
),
img_scene_raw AS (
  SELECT m.doc_id, m.media_ref, CAST(u.i AS INT) AS pos,
         string_split(m.context, ' ')[CAST(u.i AS INT) + 1] AS tok
  FROM media m, UNNEST(range(len(string_split(m.context, ' ')))) AS u(i)
),
img_scene AS (
  SELECT DISTINCT doc_id, media_ref,
         upper(tok) || '@' || upper(media_ref) AS entity_name,
         CASE WHEN len(tok) >= {clen} THEN 'CONCEPT'
              WHEN pos % 2 = 0 THEN 'TERM' ELSE 'LABEL' END AS entity_type,
         tok || ' in ' || media_ref AS description,
         media_ref AS source_id
  FROM img_scene_raw WHERE len(tok) >= {mlen}
),
img_objects AS (
  SELECT DISTINCT doc_id, media_ref,
         upper(media_ref) || '/' || upper(tok) AS entity_name,
         'IMG' AS entity_type,
         'object ' || tok AS description,
         media_ref AS source_id
  FROM img_scene_raw WHERE len(tok) >= 4 AND len(tok) < {mlen}
),
ori_img AS (
  SELECT doc_id, upper(media_ref) AS entity_name, 'ORI_IMG' AS entity_type,
         'image ' || media_ref || ': ' || context AS description,
         media_ref AS source_id, media_ref
  FROM media
),
img_mentions AS (
  SELECT doc_id, entity_name, entity_type, description, source_id FROM img_scene
  UNION ALL
  SELECT doc_id, entity_name, entity_type, description, source_id FROM img_objects
  UNION ALL
  SELECT doc_id, entity_name, entity_type, description, source_id FROM ori_img
),
img_triples AS (
  SELECT doc_id,
         least(entity_name, upper(media_ref)) AS subj,
         greatest(entity_name, upper(media_ref)) AS obj,
         'contained in image' AS description,
         CAST(10.0 AS DOUBLE) AS weight,
         media_ref AS source_id,
         1 AS "order"
  FROM (
    SELECT doc_id, media_ref, entity_name FROM img_scene
    UNION ALL
    SELECT doc_id, media_ref, entity_name FROM img_objects
  ) e
),
all_mentions AS (
  SELECT entity_name, entity_type, description, source_id FROM mentions
  UNION ALL
  SELECT entity_name, entity_type, description, source_id FROM img_mentions
),
all_triples AS (
  SELECT subj, obj, description, weight, source_id, "order" FROM triples
  UNION ALL
  SELECT subj, obj, description, weight, source_id, "order" FROM img_triples
),
typecnt AS (
  SELECT entity_name, entity_type, count(*) AS cnt FROM all_mentions GROUP BY 1, 2
),
toptype AS (
  SELECT entity_name, entity_type FROM (
    SELECT *, row_number() OVER (PARTITION BY entity_name
                                 ORDER BY cnt DESC, entity_type ASC) AS rn
    FROM typecnt
  ) t WHERE rn = 1
),
nodes AS (
  SELECT n.entity_name, t.entity_type,
         string_agg(DISTINCT n.description, '<SEP>' ORDER BY n.description) AS description,
         string_agg(DISTINCT n.source_id, '<SEP>' ORDER BY n.source_id) AS source_id
  FROM all_mentions n JOIN toptype t USING (entity_name)
  GROUP BY n.entity_name, t.entity_type
),
edges AS (
  SELECT subj AS src, obj AS dst,
         sum(weight) AS weight,
         string_agg(DISTINCT description, '<SEP>' ORDER BY description) AS description,
         string_agg(DISTINCT source_id, '<SEP>' ORDER BY source_id) AS source_id,
         min("order") AS "order"
  FROM all_triples GROUP BY 1, 2
),
wordpos AS (
  SELECT doc_id, CAST(u.i AS INT) AS wpos, w[CAST(u.i AS INT) + 1] AS tok
  FROM toks, UNNEST(range(len(w))) AS u(i)
),
media_anchor AS (
  SELECT doc_id, media_ref,
         (CAST(regexp_extract(media_ref, '_(\\d+)$', 1) AS INT) * {every} - 1) * {w} AS anchor
  FROM media
),
nearby AS (
  SELECT DISTINCT a.doc_id, a.media_ref, upper(t.tok) AS entity_name
  FROM media_anchor a JOIN wordpos t ON a.doc_id = t.doc_id
   AND t.wpos >= a.anchor - {K} AND t.wpos < a.anchor + {K}
  WHERE len(t.tok) >= {mlen}
),
-- fusion reduction on the synthetic corpus: the spectral+kNN+judge pipeline
-- merges an image scene entity into exactly the nearby text entity with an
-- identical surface form (hash embeddings: cosine 1 iff equal strings)
merge_map AS (
  SELECT DISTINCT s.doc_id, s.media_ref,
         s.entity_name AS old_name, n.entity_name AS new_name
  FROM img_scene s JOIN nearby n
    ON s.doc_id = n.doc_id AND s.media_ref = n.media_ref
   AND split_part(s.entity_name, '@', 1) = n.entity_name
),
mmap AS (SELECT DISTINCT old_name, new_name FROM merge_map),
fused_mentions AS (
  SELECT coalesce(mm.new_name, a.entity_name) AS entity_name,
         a.entity_type, a.description, a.source_id
  FROM all_mentions a LEFT JOIN mmap mm ON a.entity_name = mm.old_name
),
fused_triples AS (
  SELECT least(s2, o2) AS subj, greatest(s2, o2) AS obj,
         description, weight, source_id, "order"
  FROM (
    SELECT coalesce(m1.new_name, t.subj) AS s2,
           coalesce(m2.new_name, t.obj) AS o2,
           t.description, t.weight, t.source_id, t."order"
    FROM all_triples t
    LEFT JOIN mmap m1 ON t.subj = m1.old_name
    LEFT JOIN mmap m2 ON t.obj = m2.old_name
  ) x
),
fused_typecnt AS (
  SELECT entity_name, entity_type, count(*) AS cnt FROM fused_mentions GROUP BY 1, 2
),
fused_toptype AS (
  SELECT entity_name, entity_type FROM (
    SELECT *, row_number() OVER (PARTITION BY entity_name
                                 ORDER BY cnt DESC, entity_type ASC) AS rn
    FROM fused_typecnt
  ) t WHERE rn = 1
),
fused_nodes AS (
  SELECT n.entity_name, t.entity_type,
         string_agg(DISTINCT n.description, '<SEP>' ORDER BY n.description) AS description,
         string_agg(DISTINCT n.source_id, '<SEP>' ORDER BY n.source_id) AS source_id
  FROM fused_mentions n JOIN fused_toptype t USING (entity_name)
  GROUP BY n.entity_name, t.entity_type
),
fused_edges AS (
  SELECT subj AS src, obj AS dst,
         sum(weight) AS weight,
         string_agg(DISTINCT description, '<SEP>' ORDER BY description) AS description,
         string_agg(DISTINCT source_id, '<SEP>' ORDER BY source_id) AS source_id,
         min("order") AS "order"
  FROM fused_triples GROUP BY 1, 2
),
enh_map AS (
  SELECT s.media_ref, s.entity_name AS old_name,
         'ENH:' || split_part(s.entity_name, '@', 1) || '@' || upper(s.media_ref) AS new_name,
         coalesce(n.ctx_entity, 'none') AS ctx_entity
  FROM (SELECT DISTINCT entity_name, source_id AS media_ref FROM img_scene) s
  LEFT JOIN (SELECT media_ref, min(entity_name) AS ctx_entity
             FROM nearby GROUP BY 1) n USING (media_ref)
  WHERE NOT EXISTS (SELECT 1 FROM mmap m WHERE m.old_name = s.entity_name)
),
enh_mentions AS (
  SELECT coalesce(e.new_name, fm.entity_name) AS entity_name, fm.entity_type,
         CASE WHEN e.new_name IS NOT NULL
              THEN fm.description || ' | context: ' || e.ctx_entity
              ELSE fm.description END AS description,
         fm.source_id
  FROM fused_mentions fm LEFT JOIN enh_map e ON fm.entity_name = e.old_name
),
enh_triples AS (
  SELECT least(s2, o2) AS subj, greatest(s2, o2) AS obj,
         description, weight, source_id, "order"
  FROM (
    SELECT coalesce(m1.new_name, t.subj) AS s2,
           coalesce(m2.new_name, t.obj) AS o2,
           t.description, t.weight, t.source_id, t."order"
    FROM fused_triples t
    LEFT JOIN enh_map m1 ON t.subj = m1.old_name
    LEFT JOIN enh_map m2 ON t.obj = m2.old_name
  ) x
),
enh_typecnt AS (
  SELECT entity_name, entity_type, count(*) AS cnt FROM enh_mentions GROUP BY 1, 2
),
enh_toptype AS (
  SELECT entity_name, entity_type FROM (
    SELECT *, row_number() OVER (PARTITION BY entity_name
                                 ORDER BY cnt DESC, entity_type ASC) AS rn
    FROM enh_typecnt
  ) t WHERE rn = 1
),
enh_nodes AS (
  SELECT n.entity_name, t.entity_type,
         string_agg(DISTINCT n.description, '<SEP>' ORDER BY n.description) AS description,
         string_agg(DISTINCT n.source_id, '<SEP>' ORDER BY n.source_id) AS source_id
  FROM enh_mentions n JOIN enh_toptype t USING (entity_name)
  GROUP BY n.entity_name, t.entity_type
),
enh_edges AS (
  SELECT subj AS src, obj AS dst,
         sum(weight) AS weight,
         string_agg(DISTINCT description, '<SEP>' ORDER BY description) AS description,
         string_agg(DISTINCT source_id, '<SEP>' ORDER BY source_id) AS source_id,
         min("order") AS "order"
  FROM enh_triples GROUP BY 1, 2
)
"""


# ---- final SELECTs, one per driver-checked query ---------------------------

def spans_select() -> str:
    return 'SELECT doc_id, kind, text, media_ref, "offset" FROM spans'


def chunks_select() -> str:
    return "SELECT chunk_id, doc_id, chunk_order_index, tokens, content FROM chunks"


def mentions_select() -> str:
    return (
        "SELECT doc_id, chunk_id, entity_name, entity_type, description, source_id"
        " FROM mentions"
    )


def triples_select() -> str:
    return (
        'SELECT doc_id, chunk_id, subj, obj, description, weight, source_id, "order"'
        " FROM triples"
    )


def nodes_select() -> str:
    return "SELECT entity_name, entity_type, description, source_id FROM nodes"


def edges_select() -> str:
    return 'SELECT src, dst, weight, description, source_id, "order" FROM edges'


def img_mentions_select() -> str:
    return (
        "SELECT doc_id, entity_name, entity_type, description, source_id"
        " FROM img_mentions"
    )


def img_triples_select() -> str:
    return (
        'SELECT doc_id, subj, obj, description, weight, source_id, "order"'
        " FROM img_triples"
    )


def media_chunk_match_select(cfg: PipelineConfig = DEFAULT) -> str:
    return """
SELECT doc_id, media_ref, chunk_id, score FROM (
  SELECT s.doc_id, s.media_ref, s.chunk_id, s.score,
         row_number() OVER (PARTITION BY s.media_ref
                            ORDER BY s.score DESC, s.chunk_order_index ASC,
                                     s.chunk_id ASC) AS rn
  FROM (
    SELECT c.doc_id, c.media_ref, v.chunk_id, v.chunk_order_index,
           count(*) AS score
    FROM (
      SELECT m.doc_id, m.media_ref,
             string_split(m.context, ' ')[CAST(u.i AS INT) + 1] AS tok
      FROM media m, UNNEST(range(len(string_split(m.context, ' ')))) AS u(i)
    ) c
    JOIN (
      SELECT doc_id, chunk_id, chunk_order_index,
             unnest(list_distinct(string_split(content, ' '))) AS tok
      FROM chunks
    ) v ON c.doc_id = v.doc_id AND c.tok = v.tok
    GROUP BY 1, 2, 3, 4
  ) s
) b WHERE rn = 1
"""


def _qctx_ctes(cfg: PipelineConfig = DEFAULT) -> str:
    toks = ", ".join(f"'{t.upper()}'" for t in cfg.qctx_query.split())
    return f"""
deg AS (
  SELECT entity_name, count(*) AS degree FROM (
    SELECT src AS entity_name FROM edges
    UNION ALL SELECT dst AS entity_name FROM edges
  ) u GROUP BY 1
),
seeds AS (
  SELECT entity_name, entity_type, degree, rnk FROM (
    SELECT n.entity_name, n.entity_type,
           coalesce(d.degree, 0) AS degree,
           row_number() OVER (ORDER BY coalesce(d.degree, 0) DESC,
                              n.entity_name ASC) AS rnk
    FROM nodes n LEFT JOIN deg d USING (entity_name)
    WHERE n.entity_name IN ({toks})
  ) s WHERE rnk <= {cfg.qctx_k}
),
touching AS (
  SELECT e.* FROM edges e
  WHERE EXISTS (SELECT 1 FROM seeds s
                WHERE s.entity_name = e.src OR s.entity_name = e.dst)
)"""


def qctx_seeds_sql(cfg: PipelineConfig = DEFAULT) -> str:
    return (
        cte_prefix(cfg) + "," + _qctx_ctes(cfg)
        + "\nSELECT entity_name, entity_type, degree, rnk FROM seeds"
    )


def qctx_edges_sql(cfg: PipelineConfig = DEFAULT) -> str:
    return (
        cte_prefix(cfg) + "," + _qctx_ctes(cfg) + f""",
ranked AS (
  SELECT t.src, t.dst, t.weight, t.description,
         CAST(ds.degree + dd.degree AS BIGINT) AS edge_rank
  FROM touching t
  JOIN deg ds ON ds.entity_name = t.src
  JOIN deg dd ON dd.entity_name = t.dst
),
runn AS (
  SELECT src, dst, weight, description, edge_rank,
         sum(length(description)) OVER (
           ORDER BY edge_rank DESC, weight DESC, src ASC, dst ASC
           ROWS UNBOUNDED PRECEDING) AS running_tokens
  FROM ranked
)
SELECT src, dst, weight, description, edge_rank,
       CAST(running_tokens AS BIGINT) AS running_tokens
FROM runn WHERE running_tokens <= {cfg.qctx_token_budget}
"""
    )


def qctx_chunks_sql(cfg: PipelineConfig = DEFAULT, token_budget: int = 400) -> str:
    return (
        cte_prefix(cfg) + "," + _qctx_ctes(cfg) + f""",
seed_chunks AS (
  SELECT DISTINCT cid AS chunk_id FROM (
    SELECT unnest(string_split(n.source_id, '<SEP>')) AS cid
    FROM nodes n WHERE EXISTS (SELECT 1 FROM seeds s WHERE s.entity_name = n.entity_name)
  ) u WHERE cid LIKE 'chunk-%'
),
edge_cites AS (
  SELECT cid AS chunk_id, count(*) AS relation_counts FROM (
    SELECT unnest(string_split(source_id, '<SEP>')) AS cid FROM touching
  ) u GROUP BY 1
),
ranked_chunks AS (
  SELECT c.chunk_id, c.doc_id, c.chunk_order_index,
         CAST(c.tokens AS BIGINT) AS tokens,
         CAST(coalesce(e.relation_counts, 0) AS BIGINT) AS relation_counts
  FROM seed_chunks s JOIN chunks c USING (chunk_id)
  LEFT JOIN edge_cites e ON e.chunk_id = c.chunk_id
),
runn_chunks AS (
  SELECT *, sum(tokens) OVER (
           ORDER BY chunk_order_index ASC, relation_counts DESC, chunk_id ASC
           ROWS UNBOUNDED PRECEDING) AS running_tokens
  FROM ranked_chunks
)
SELECT chunk_id, doc_id, chunk_order_index, tokens, relation_counts,
       CAST(running_tokens AS BIGINT) AS running_tokens
FROM runn_chunks WHERE running_tokens <= {token_budget}
"""
    )


def top_media_sql(cfg: PipelineConfig = DEFAULT, n: int = 3) -> str:
    return (
        cte_prefix(cfg)
        + f"""
SELECT entity_name, entity_type, source_id FROM nodes
WHERE entity_type = 'ORI_IMG' ORDER BY entity_name LIMIT {n}
"""
    )


def qctx_onehop_sql(cfg: PipelineConfig = DEFAULT) -> str:
    return (
        cte_prefix(cfg) + "," + _qctx_ctes(cfg) + """
SELECT h.entity_name, n.entity_type FROM (
  SELECT DISTINCT entity_name FROM (
    SELECT src AS entity_name FROM touching
    UNION ALL SELECT dst AS entity_name FROM touching
  ) u
) h JOIN nodes n USING (entity_name)
"""
    )


def mm_decode_select() -> str:
    return """
SELECT media_ref,
       CAST(length(media_ref || ':' || context) AS BIGINT) AS byte_len,
       CAST(16 + length(media_ref || ':' || context) % 64 AS BIGINT) AS width,
       CAST(16 + (length(media_ref || ':' || context) * 7) % 64 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS n_channels
FROM media
"""


def mm_frames_select(n_frames: int = 3, frame_bytes: int = 16) -> str:
    return f"""
SELECT media_ref, CAST(u.k AS BIGINT) AS frame_idx,
       md5(substr(media_ref || ':' || context,
                  CAST(u.k AS INT) * {frame_bytes} + 1, {frame_bytes})) AS frame_md5
FROM media, UNNEST(range({n_frames})) AS u(k)
WHERE length(media_ref || ':' || context) > CAST(u.k AS INT) * {frame_bytes}
"""


def merge_map_select() -> str:
    return "SELECT doc_id, media_ref, old_name, new_name FROM merge_map"


def fused_nodes_select() -> str:
    return "SELECT entity_name, entity_type, description, source_id FROM fused_nodes"


def fused_edges_select() -> str:
    return 'SELECT src, dst, weight, description, source_id, "order" FROM fused_edges'


def enh_nodes_select() -> str:
    return "SELECT entity_name, entity_type, description, source_id FROM enh_nodes"


def enh_edges_select() -> str:
    return 'SELECT src, dst, weight, description, source_id, "order" FROM enh_edges'


def q(select: str, cfg: PipelineConfig = DEFAULT) -> str:
    """Full oracle query: shared CTE prefix + a final SELECT."""
    return cte_prefix(cfg) + select
