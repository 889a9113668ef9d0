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
    dims = cfg.trigram_dims
    knn = cfg.fusion_knn
    SC = 10**8   # fusion.TRIGRAM_SCALE
    RS = 10**12  # fusion.RANK_SCALE
    merge_t2 = int(round(cfg.merge_cos * cfg.merge_cos * SC))
    cluster_t2 = int(round(cfg.cluster_cos * cfg.cluster_cos * SC))

    def _sum(desc_expr: str) -> str:
        """A1/A2 summarization twin (canonicalize.summarize_description)."""
        toks = f"string_split({desc_expr}, ' ')"
        return (
            f"CASE WHEN len({toks}) >= {cfg.summary_max_tokens}"
            f" THEN array_to_string(list_slice({toks}, 1, {cfg.summary_keep_tokens}), ' ')"
            f" || ' <SUMMARY ' || CAST(len({toks}) AS VARCHAR) || ' tokens>'"
            f" ELSE {desc_expr} END"
        )

    desc_agg = "string_agg(DISTINCT {t}description, '<SEP>' ORDER BY {t}description)"
    node_desc = _sum(desc_agg.format(t="n.")) + " AS description"
    edge_desc = _sum(desc_agg.format(t="")) + " AS description"
    return f"""
WITH RECURSIVE toks AS (
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
-- E9 alignment twin (media.alignment_triples): per object crop, the scene
-- entity with max exact trigram cosine (ties -> min scene name), weight 10
al_objs AS (
  SELECT DISTINCT doc_id, media_ref,
         upper(media_ref) || '/' || upper(tok) AS obj_name, upper(tok) AS osurf
  FROM img_scene_raw WHERE len(tok) >= 4 AND len(tok) < {mlen}
),
al_scns AS (
  SELECT DISTINCT doc_id, media_ref,
         upper(tok) || '@' || upper(media_ref) AS scn_name, upper(tok) AS ssurf
  FROM img_scene_raw WHERE len(tok) >= {mlen}
),
al_surf AS (
  SELECT DISTINCT s FROM (
    SELECT osurf AS s FROM al_objs UNION SELECT ssurf AS s FROM al_scns
  ) u
),
al_vec AS (
  SELECT s, ('0x' || substr(md5(t), 1, 4))::BIGINT % {dims} AS bucket,
         CAST(sum(CASE WHEN ('0x' || substr(md5(t), 5, 1))::BIGINT % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS v
  FROM (
    SELECT s, unnest([substr(s, i + 1, 3) for i in range(greatest(length(s) - 2, 1))]) AS t
    FROM al_surf
  ) g GROUP BY 1, 2
),
al_norm AS (SELECT s, CAST(sum(v * v) AS BIGINT) AS n2 FROM al_vec GROUP BY 1),
al_need AS (
  SELECT DISTINCT o.osurf, s.ssurf FROM al_objs o JOIN al_scns s USING (doc_id, media_ref)
),
al_dots AS (
  SELECT n.osurf, n.ssurf, CAST(coalesce(sum(a.v * b.v), 0) AS BIGINT) AS dot
  FROM al_need n
  LEFT JOIN al_vec a ON a.s = n.osurf
  LEFT JOIN al_vec b ON b.s = n.ssurf AND b.bucket = a.bucket
  GROUP BY 1, 2
),
al_best AS (
  SELECT doc_id, media_ref, obj_name, scn_name FROM (
    SELECT p.doc_id, p.media_ref, p.obj_name, p.scn_name,
           row_number() OVER (PARTITION BY p.doc_id, p.media_ref, p.obj_name
             ORDER BY (CASE WHEN d.dot >= 0 THEN 1 ELSE -1 END)
                      * ((d.dot * d.dot * 1000000000000) // greatest(na.n2 * nb.n2, 1)) DESC,
                      p.scn_name ASC) AS rn
    FROM (
      SELECT o.doc_id, o.media_ref, o.obj_name, o.osurf, s.scn_name, s.ssurf
      FROM al_objs o JOIN al_scns s USING (doc_id, media_ref)
    ) p
    JOIN al_dots d ON d.osurf = p.osurf AND d.ssurf = p.ssurf
    JOIN al_norm na ON na.s = p.osurf
    JOIN al_norm nb ON nb.s = p.ssurf
  ) t WHERE rn = 1
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
  UNION ALL
  SELECT doc_id, least(obj_name, scn_name) AS subj,
         greatest(obj_name, scn_name) AS obj,
         'depicts' AS description, CAST(10.0 AS DOUBLE) AS weight,
         media_ref AS source_id, 1 AS "order"
  FROM al_best
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
         {node_desc},
         string_agg(DISTINCT n.source_id, '<SEP>' ORDER BY n.source_id) AS source_id
  FROM all_mentions n JOIN toptype t USING (entity_name)
  GROUP BY n.entity_name, t.entity_type
),
edges AS (
  SELECT subj AS src, obj AS dst,
         sum(weight) AS weight,
         {edge_desc},
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
-- trigram-embedding fusion twin (fusion.py trigram_vector/_fuse_block, exact
-- int64 fixed-point throughout): signed feature-hashed char-3-gram vectors,
-- M6 clusters = connected components of the cos>=cluster_cos affinity
-- (recursive min-label propagation), M5 = kNN majority-label transfer over
-- the exact cosine order, M7 = merge iff nearest in-cluster text entity
-- clears merge_cos
img_fuse AS (
  -- one row per scene entity name (img_scene keeps per-type variants; the
  -- fusion block input dedups to names, fusion.py fusion_blocks 'scene')
  SELECT DISTINCT doc_id, media_ref, entity_name,
         split_part(entity_name, '@', 1) AS surface
  FROM img_scene
),
tri_names AS (
  SELECT DISTINCT s FROM (
    SELECT surface AS s FROM img_fuse
    UNION
    SELECT entity_name AS s FROM nearby
  ) u
),
tri_grams AS (
  SELECT s, unnest([substr(s, i + 1, 3) for i in range(greatest(length(s) - 2, 1))]) AS t
  FROM tri_names
),
tri_vecs AS (
  SELECT s, d, v FROM (
    SELECT s, ('0x' || substr(md5(t), 1, 4))::BIGINT % {dims} AS d,
           CAST(sum(CASE WHEN ('0x' || substr(md5(t), 5, 1))::BIGINT % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS v
    FROM tri_grams GROUP BY 1, 2
  ) z WHERE v <> 0
),
tri_norms AS (SELECT s, CAST(sum(v * v) AS BIGINT) AS n2 FROM tri_vecs GROUP BY 1),
need_pairs AS (
  SELECT DISTINCT sa, sb FROM (
    SELECT a.entity_name AS sa, b.entity_name AS sb
    FROM nearby a JOIN nearby b
      ON a.doc_id = b.doc_id AND a.media_ref = b.media_ref
     AND a.entity_name < b.entity_name
    UNION
    SELECT s.surface AS sa, n.entity_name AS sb
    FROM img_fuse s JOIN nearby n
      ON s.doc_id = n.doc_id AND s.media_ref = n.media_ref
  ) u
),
tri_dots AS (
  SELECT p.sa, p.sb, CAST(coalesce(sum(va.v * vb.v), 0) AS BIGINT) AS dot
  FROM need_pairs p
  LEFT JOIN tri_vecs va ON va.s = p.sa
  LEFT JOIN tri_vecs vb ON vb.s = p.sb AND vb.d = va.d
  GROUP BY 1, 2
),
tt_edges AS (
  SELECT a.doc_id, a.media_ref, a.entity_name AS x, b.entity_name AS y
  FROM nearby a
  JOIN nearby b ON a.doc_id = b.doc_id AND a.media_ref = b.media_ref
              AND a.entity_name < b.entity_name
  JOIN tri_dots d ON d.sa = a.entity_name AND d.sb = b.entity_name
  JOIN tri_norms nx ON nx.s = a.entity_name
  JOIN tri_norms ny ON ny.s = b.entity_name
  WHERE d.dot > 0 AND d.dot * d.dot * {SC} >= {cluster_t2} * nx.n2 * ny.n2
),
tt_bi AS (
  SELECT doc_id, media_ref, x, y FROM tt_edges
  UNION ALL
  SELECT doc_id, media_ref, y AS x, x AS y FROM tt_edges
),
reach AS (
  SELECT doc_id, media_ref, entity_name AS nm, entity_name AS rep FROM nearby
  UNION
  SELECT e.doc_id, e.media_ref, e.y AS nm, r.rep
  FROM reach r JOIN tt_bi e
    ON e.doc_id = r.doc_id AND e.media_ref = r.media_ref AND e.x = r.nm
),
comp AS (
  SELECT doc_id, media_ref, nm, min(rep) AS rep FROM reach GROUP BY 1, 2, 3
),
comp_lbl AS (
  SELECT doc_id, media_ref, nm, rep,
         CAST(dense_rank() OVER (PARTITION BY doc_id, media_ref ORDER BY rep)
              - 1 AS BIGINT) AS label
  FROM comp
),
img_cand AS (
  SELECT s.doc_id, s.media_ref, s.entity_name AS img_name,
         n.entity_name AS txt_name, d.dot, ni.n2 AS ni2, nt.n2 AS nt2,
         CAST(CASE WHEN d.dot >= 0 THEN 1 ELSE -1 END
              * ((d.dot * d.dot * {RS}) // greatest(ni.n2 * nt.n2, 1))
              AS BIGINT) AS rank_key
  FROM img_fuse s
  JOIN nearby n ON s.doc_id = n.doc_id AND s.media_ref = n.media_ref
  JOIN tri_dots d ON d.sa = s.surface AND d.sb = n.entity_name
  JOIN tri_norms ni ON ni.s = s.surface
  JOIN tri_norms nt ON nt.s = n.entity_name
),
knn_top AS (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (PARTITION BY doc_id, media_ref, img_name
                                   ORDER BY rank_key DESC, txt_name ASC) AS rn
    FROM img_cand c
  ) t WHERE rn <= {knn}
),
maj AS (
  -- majority component over the k nearest; ties -> component of the nearest
  -- candidate (min rn), mirroring _fuse_block
  SELECT doc_id, media_ref, img_name, rep FROM (
    SELECT g.*, row_number() OVER (PARTITION BY doc_id, media_ref, img_name
                                   ORDER BY cnt DESC, best_rn ASC) AS rn
    FROM (
      SELECT k.doc_id, k.media_ref, k.img_name, c.rep, count(*) AS cnt,
             min(k.rn) AS best_rn
      FROM knn_top k JOIN comp c
        ON c.doc_id = k.doc_id AND c.media_ref = k.media_ref
       AND c.nm = k.txt_name
      GROUP BY 1, 2, 3, 4
    ) g
  ) t WHERE rn = 1
),
tgt AS (
  SELECT doc_id, media_ref, img_name, txt_name, dot, ni2, nt2 FROM (
    SELECT c.doc_id, c.media_ref, c.img_name, c.txt_name, c.dot, c.ni2, c.nt2,
           row_number() OVER (PARTITION BY c.doc_id, c.media_ref, c.img_name
                              ORDER BY c.rank_key DESC, c.txt_name ASC) AS rn
    FROM img_cand c
    JOIN comp cc ON cc.doc_id = c.doc_id AND cc.media_ref = c.media_ref
                AND cc.nm = c.txt_name
    JOIN maj m ON m.doc_id = c.doc_id AND m.media_ref = c.media_ref
              AND m.img_name = c.img_name AND cc.rep = m.rep
  ) t WHERE rn = 1
),
merge_map AS (
  SELECT DISTINCT doc_id, media_ref, img_name AS old_name, txt_name AS new_name
  FROM tgt WHERE dot > 0 AND dot * dot * {SC} >= {merge_t2} * ni2 * nt2
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
         {node_desc},
         string_agg(DISTINCT n.source_id, '<SEP>' ORDER BY n.source_id) AS source_id
  FROM fused_mentions n JOIN fused_toptype t USING (entity_name)
  GROUP BY n.entity_name, t.entity_type
),
fused_edges AS (
  SELECT subj AS src, obj AS dst,
         sum(weight) AS weight,
         {edge_desc},
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
         {node_desc},
         string_agg(DISTINCT n.source_id, '<SEP>' ORDER BY n.source_id) AS source_id
  FROM enh_mentions n JOIN enh_toptype t USING (entity_name)
  GROUP BY n.entity_name, t.entity_type
),
enh_edges AS (
  SELECT subj AS src, obj AS dst,
         sum(weight) AS weight,
         {edge_desc},
         string_agg(DISTINCT source_id, '<SEP>' ORDER BY source_id) AS source_id,
         min("order") AS "order"
  FROM enh_triples GROUP BY 1, 2
)
"""


# ---- final SELECTs, one per driver-checked query ---------------------------

def spans_select() -> str:
    return 'SELECT doc_id, kind, text, media_ref, "offset" FROM spans'


def media_context_select(n_words: int) -> str:
    """S3 media-context walk (reference pdf2md_preprocessing.py:416-440):
    before = last n words of all preceding text spans, after = first n of
    all following; context = trim(before || ' ' || after)."""
    return f"""
SELECT doc_id, media_ref,
       trim(concat_ws(' ',
         array_to_string(list_slice(bw, greatest(len(bw) - {n_words} + 1, 1),
                                    len(bw)), ' '),
         array_to_string(list_slice(aw, 1, {n_words}), ' '))) AS context
FROM (
  SELECT doc_id, media_ref, kind,
         string_split(coalesce(string_agg(CASE WHEN kind = 'text' THEN text END,
                                          ' ') OVER w_b, ''), ' ') AS bw,
         string_split(coalesce(string_agg(CASE WHEN kind = 'text' THEN text END,
                                          ' ') OVER w_a, ''), ' ') AS aw
  FROM spans
  WINDOW
    w_b AS (PARTITION BY doc_id ORDER BY "offset"
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    w_a AS (PARTITION BY doc_id ORDER BY "offset"
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
) t WHERE kind = 'image'
"""


def roundtrip_spans_select(n_chars: int = 100) -> str:
    """S1/S2 serialize∘parse twin (docx.py / pdf.py round-trip queries).

    A real .docx/.pdf carries no caption column, so the parsers re-derive
    each image's context as the reference does (preprocessing.py:215-236):
    before = last n CHARS of the concatenation of all preceding paragraph
    texts (no separator), after = first n chars of the following ones,
    context = trim(trim(before) || ' ' || trim(after)). Text spans and
    media_ref/offset round-trip identically."""
    return f"""
SELECT doc_id, kind,
       CASE WHEN kind = 'text' THEN text
            ELSE trim(trim(right(bc, {n_chars})) || ' ' ||
                      trim(left(ac, {n_chars}))) END AS text,
       media_ref, "offset"
FROM (
  SELECT doc_id, kind, text, media_ref, "offset",
         coalesce(string_agg(CASE WHEN kind = 'text' THEN text END, '')
                  OVER w_b, '') AS bc,
         coalesce(string_agg(CASE WHEN kind = 'text' THEN text END, '')
                  OVER w_a, '') AS ac
  FROM spans
  WINDOW
    w_b AS (PARTITION BY doc_id ORDER BY "offset"
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    w_a AS (PARTITION BY doc_id ORDER BY "offset"
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
) t
"""


def chunks_select() -> str:
    return "SELECT chunk_id, doc_id, chunk_order_index, tokens, content FROM chunks"


def mentions_select() -> str:
    return (
        "SELECT doc_id, chunk_id, entity_name, entity_type, description, source_id"
        " FROM mentions"
    )


def mentions_gleaned_select(cfg: PipelineConfig = DEFAULT, rounds: int = 1) -> str:
    """E1 gleaning twin: base mentions plus every gleaning round's recovered
    tokens — round r digs up tokens of length mention_min_len-1-r (floored
    at the extractor's GLEAN_FLOOR), tagged '(gleaned)'."""
    from .operators.extractor import GLEAN_FLOOR

    mlen, clen = cfg.mention_min_len, cfg.concept_min_len
    lo = max(mlen - rounds, GLEAN_FLOOR)
    return f"""
SELECT doc_id, chunk_id, entity_name, entity_type, description, source_id
FROM mentions
UNION
SELECT DISTINCT doc_id, chunk_id, upper(tok) AS entity_name,
       CASE WHEN len(tok) >= {clen} THEN 'CONCEPT'
            WHEN pos % 2 = 0 THEN 'TERM' ELSE 'LABEL' END AS entity_type,
       tok || ' in ' || chunk_id || ' (gleaned)' AS description,
       chunk_id AS source_id
FROM ctoks WHERE len(tok) BETWEEN {lo} AND {mlen - 1}
"""


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


# ---- context rendering + answer prompt (the final query deliverable) ------

# the full character set Python's str.strip() removes (str.isspace() == True):
# ASCII ws incl. \v \f and the C1 separators, then the Unicode space family
_PY_STRIP_WS = (
    "' ' || "
    + " || ".join(
        f"chr({c})"
        for c in (
            9, 10, 11, 12, 13, 28, 29, 30, 31, 133, 160, 5760,
            *range(0x2000, 0x200B), 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
        )
    )
)


def _stripq(x: str) -> str:
    """SQL twin of query_ctx._enclose's string normalization:
    str(v).strip().strip("'").strip('"') — whitespace, then single quotes,
    then double quotes, each stripped repeatedly from both ends. The
    whitespace set is Python's full str.strip() set (incl. \\v, \\f and the
    Unicode spaces), so both sides normalize identically on any content."""
    return f"trim(trim(trim({x}, {_PY_STRIP_WS}), chr(39)), '\"')"


def _qcell(x: str) -> str:
    """A string CSV cell: normalized then double-quote-wrapped."""
    return f"'\"' || {_stripq(x)} || '\"'"


def _csv_line(cells: list[str]) -> str:
    """Join cell expressions with the reference's ',\\t' separator
    (base.py:226-233 list_of_list_to_csv)."""
    return " || ',' || chr(9) || ".join(cells)


def _hdr(names: list[str]) -> str:
    """Header line: every header cell is a string, so it is quote-wrapped."""
    return ",\t".join(f'"{n}"' for n in names)


def _render_block_ctes(cfg: PipelineConfig, token_budget: int = 400) -> str:
    """CTEs producing one-row bodies for the three context CSV blocks
    (entities / relationships / sources), byte-identical to
    query_ctx.context_blocks over the same context sets."""
    ent_line = _csv_line([
        "CAST(rnk - 1 AS VARCHAR)",
        _qcell("entity_name"),
        _qcell("entity_type"),
        "'\"UNKNOWN\"'",
        "CAST(degree AS VARCHAR)",
    ])
    rel_line = _csv_line([
        "CAST(rid AS VARCHAR)",
        _qcell("src"),
        _qcell("dst"),
        _qcell("description"),
        "CAST(weight AS VARCHAR)",
        "CAST(edge_rank AS VARCHAR)",
    ])
    src_line = _csv_line([
        "CAST(sid AS VARCHAR)",
        _qcell("content"),
    ])
    ent_hdr = _hdr(["id", "entity", "type", "description", "rank"])
    rel_hdr = _hdr(["id", "source", "target", "description", "weight", "rank"])
    src_hdr = _hdr(["id", "content"])
    return f""",
rel_ranked AS (
  SELECT t.src, t.dst, t.weight, t.description,
         CAST(ds.degree + dd.degree AS BIGINT) AS edge_rank
  FROM touching t
  JOIN deg ds ON ds.entity_name = t.src
  JOIN deg dd ON dd.entity_name = t.dst
),
rel_kept AS (
  SELECT * FROM (
    SELECT src, dst, weight, description, edge_rank,
           sum(length(description)) OVER (
             ORDER BY edge_rank DESC, weight DESC, src ASC, dst ASC
             ROWS UNBOUNDED PRECEDING) AS running_tokens
    FROM rel_ranked
  ) WHERE running_tokens <= {cfg.qctx_token_budget}
),
rel_ids AS (
  SELECT row_number() OVER (ORDER BY edge_rank DESC, weight DESC,
                            src ASC, dst ASC) - 1 AS rid, *
  FROM rel_kept
),
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
chunk_kept AS (
  SELECT * FROM (
    SELECT c.chunk_id, c.chunk_order_index, c.content,
           CAST(coalesce(e.relation_counts, 0) AS BIGINT) AS relation_counts,
           sum(c.tokens) OVER (
             ORDER BY c.chunk_order_index ASC,
                      coalesce(e.relation_counts, 0) DESC, c.chunk_id ASC
             ROWS UNBOUNDED PRECEDING) AS running_tokens
    FROM seed_chunks s JOIN chunks c USING (chunk_id)
    LEFT JOIN edge_cites e ON e.chunk_id = c.chunk_id
  ) WHERE running_tokens <= {token_budget}
),
chunk_ids AS (
  SELECT row_number() OVER (ORDER BY chunk_order_index ASC,
                            relation_counts DESC, chunk_id ASC) - 1 AS sid,
         content
  FROM chunk_kept
),
ent_body AS (
  SELECT coalesce('{ent_hdr}' || chr(10)
           || string_agg({ent_line}, chr(10) ORDER BY rnk),
           '{ent_hdr}') AS body
  FROM seeds
),
rel_body AS (
  SELECT coalesce('{rel_hdr}' || chr(10)
           || string_agg({rel_line}, chr(10) ORDER BY rid),
           '{rel_hdr}') AS body
  FROM rel_ids
),
src_body AS (
  SELECT coalesce('{src_hdr}' || chr(10)
           || string_agg({src_line}, chr(10) ORDER BY sid),
           '{src_hdr}') AS body
  FROM chunk_ids
)"""


def qctx_render_sql(cfg: PipelineConfig = DEFAULT, token_budget: int = 400) -> str:
    """Twin of api.qctx_render: the three rendered context CSV blocks."""
    return (
        cte_prefix(cfg) + "," + _qctx_ctes(cfg)
        + _render_block_ctes(cfg, token_budget) + """
SELECT 'entities' AS block, (SELECT body FROM ent_body) AS body
UNION ALL
SELECT 'relationships' AS block, (SELECT body FROM rel_body) AS body
UNION ALL
SELECT 'sources' AS block, (SELECT body FROM src_body) AS body
"""
    )


def qctx_prompt_sql(
    cfg: PipelineConfig = DEFAULT, token_budget: int = 400,
    response_type: str | None = None,
) -> str:
    """Twin of api.qctx_prompt: the filled local_rag_response_augmented
    system prompt — the reference's final text-LLM deliverable
    (query.py:402-405). The template and section wrapper are shared
    constants (functions/prompt_templates.py mirrors prompt.py); the oracle
    value-checks the entire context derivation feeding them."""
    from .functions import prompt_templates as T
    from .operators.query_ctx import CONTEXT_WRAPPER

    rt = response_type or T.DEFAULT_RESPONSE_TYPE
    tpl = T.LOCAL_RAG_RESPONSE_AUGMENTED.replace("'", "''")
    w1, w2, w3, w4 = (p.replace("'", "''") for p in CONTEXT_WRAPPER)
    ctx = (
        f"'{w1}' || (SELECT body FROM ent_body) || "
        f"'{w2}' || (SELECT body FROM rel_body) || "
        f"'{w3}' || (SELECT body FROM src_body) || '{w4}'"
    )
    return (
        cte_prefix(cfg) + "," + _qctx_ctes(cfg)
        + _render_block_ctes(cfg, token_budget) + f"""
SELECT replace(replace('{tpl}', '{{response_type}}', '{rt.replace("'", "''")}'),
               '{{context_data}}', {ctx}) AS prompt
"""
    )


def qctx_prompt_chain_sql(
    cfg: PipelineConfig = DEFAULT, token_budget: int = 400,
    response_type: str | None = None,
) -> str:
    """Twin of api.qctx_prompt_chain: the full deterministic answer-prompt
    chain (reference query.py:395-470) as (step, prompt) rows — the
    augmented text prompt, one multimodal prompt per scraped ORI_IMG seed
    (caption joined from the media relation, image_information =
    '{caption}, {footnote}' with the empty footnote), and the needs_merge
    flag. The ORI_IMG scrape twin reads the same seed rows the entities CSV
    is rendered from (type cell == ORI_IMG, CSV order == rnk, lowercased,
    first NUM_MM_ENTITIES)."""
    from .functions import prompt_templates as T
    from .operators.query_ctx import CONTEXT_WRAPPER

    rt = (response_type or T.DEFAULT_RESPONSE_TYPE).replace("'", "''")
    tpl = T.LOCAL_RAG_RESPONSE_AUGMENTED.replace("'", "''")
    tpl_mm = T.LOCAL_RAG_RESPONSE_MULTIMODAL.replace("'", "''")
    w1, w2, w3, w4 = (p.replace("'", "''") for p in CONTEXT_WRAPPER)
    ctx = (
        f"'{w1}' || (SELECT body FROM ent_body) || "
        f"'{w2}' || (SELECT body FROM rel_body) || "
        f"'{w3}' || (SELECT body FROM src_body) || '{w4}'"
    )
    return (
        cte_prefix(cfg) + "," + _qctx_ctes(cfg)
        + _render_block_ctes(cfg, token_budget) + f""",
mm AS (
  SELECT lower(entity_name) AS name, rnk FROM seeds
  WHERE entity_type = 'ORI_IMG' ORDER BY rnk LIMIT {T.NUM_MM_ENTITIES}
),
mmjoin AS (
  SELECT m.name, m.rnk, s.text AS caption
  FROM mm m JOIN spans s ON s.kind = 'image' AND lower(s.media_ref) = m.name
)
SELECT 'augmented' AS step,
       replace(replace('{tpl}', '{{response_type}}', '{rt}'),
               '{{context_data}}', {ctx}) AS prompt
UNION ALL
SELECT 'multimodal:' || name AS step,
       replace(replace(replace('{tpl_mm}',
               '{{response_type}}', '{rt}'),
               '{{image_information}}', caption || ', '),
               '{{context_data}}', {ctx}) AS prompt
FROM mmjoin
UNION ALL
SELECT 'needs_merge' AS step,
       CASE WHEN (SELECT count(*) FROM mmjoin) > 0
            THEN 'true' ELSE 'false' END AS prompt
"""
    )


def entity_vdb_topk_sql(
    cfg: PipelineConfig = DEFAULT, k: int = 5, threshold: float = 0.2,
    query: str | None = None,
) -> str:
    """T1 twin: trigram-embedded entity VDB top-k with better_than_threshold
    (entity_vdb.entity_vdb_topk). Query vector inlined from the same Python
    encoder both engines mirror."""
    from .operators.fusion import trigram_vector

    query = query or cfg.qctx_query
    dims = cfg.trigram_dims
    qv = trigram_vector(query, dims)
    nq2 = int((qv * qv).sum())
    t2 = int(round(threshold * threshold * 10_000))
    qlit = "[" + ", ".join(str(int(x)) for x in qv) + "]"
    return cte_prefix(cfg) + f""",
ev AS (SELECT entity_name, entity_name || description AS content FROM nodes),
evg AS (
  SELECT entity_name,
         unnest([substr(content, i + 1, 3) for i in range(greatest(length(content) - 2, 1))]) AS t
  FROM ev
),
evv AS (
  SELECT entity_name, ('0x' || substr(md5(t), 1, 4))::BIGINT % {dims} AS bucket,
         CAST(sum(CASE WHEN ('0x' || substr(md5(t), 5, 1))::BIGINT % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS v
  FROM evg GROUP BY 1, 2
),
score AS (
  SELECT entity_name,
         CAST(sum(v * ({qlit})[bucket + 1]) AS BIGINT) AS dot,
         CAST(sum(v * v) AS BIGINT) AS n2
  FROM evv GROUP BY 1
),
gated AS (
  SELECT 'ent-' || md5(entity_name) AS id, entity_name, dot, n2,
         CAST(CASE WHEN dot >= 0 THEN 1 ELSE -1 END
              * ((dot * dot) // greatest((n2 * {nq2}) // 1000000, 1)) AS BIGINT) AS rank_key
  FROM score
  WHERE dot > 0 AND dot * dot * 10000 >= {t2 * nq2} * n2
)
SELECT id, entity_name, rank_key, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY rank_key DESC, entity_name ASC) AS rnk
  FROM gated
) t WHERE rnk <= {k}
"""


def qctx_seeds_vdb_sql(
    cfg: PipelineConfig = DEFAULT, k: int = 5, threshold: float = 0.2,
) -> str:
    """Vector-seeded qctx twin: entity_vdb top-k joined to node attrs +
    degrees (query_ctx.seed_entities_vdb)."""
    base = entity_vdb_topk_sql(cfg, k=k, threshold=threshold)
    # strip the final SELECT, keep the CTE chain + gated, re-select with joins
    head, _, _ = base.rpartition("SELECT id, entity_name, rank_key, rnk FROM (")
    return head + f"""
, vdb_hits AS (
  SELECT id, entity_name, rank_key, rnk FROM (
    SELECT *, row_number() OVER (ORDER BY rank_key DESC, entity_name ASC) AS rnk
    FROM gated
  ) t WHERE rnk <= {k}
),
deg2 AS (
  SELECT entity_name, count(*) AS degree FROM (
    SELECT src AS entity_name FROM edges
    UNION ALL SELECT dst AS entity_name FROM edges
  ) u GROUP BY 1
)
SELECT h.entity_name, n.entity_type,
       CAST(coalesce(d.degree, 0) AS BIGINT) AS degree,
       CAST(h.rnk AS BIGINT) AS rnk
FROM vdb_hits h
JOIN nodes n USING (entity_name)
LEFT JOIN deg2 d USING (entity_name)
"""


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


def clusters_select() -> str:
    """M6 cluster components twin (value check for kg_clusters)."""
    return (
        "SELECT doc_id, media_ref, nm AS entity_name, label,"
        " rep AS cluster_rep FROM comp_lbl"
    )


def fused_nodes_select() -> str:
    return "SELECT entity_name, entity_type, description, source_id FROM fused_nodes"


def fused_edges_select() -> str:
    return 'SELECT src, dst, weight, description, source_id, "order" FROM fused_edges'


def _pagerank_ctes(
    iters: int = 5, damping_pct: int = 85, scale: int = 1_000_000_000
) -> str:
    """CTE chain of the pagerank twin (ends at pr_r{iters}) — shared by
    pagerank_select and community_reps_select so composition never parses
    rendered SQL (the _random_walk_ctes pattern).

    Twin of operators/graphalgo.pagerank: the same fixed-point integer
    recurrence unrolled as chained CTEs (one per iteration). Integer sums
    are order-independent, so the value-hash match is exact.

    Every pagerank CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    iteration references the previous one twice (plus pr_edges, which sits
    on top of the ENTIRE fused-graph pipeline twin) — inlined, the plan
    expands exponentially in `iters` and exhausts file handles re-scanning
    the base parquet; materialized, each relation is computed once, exactly
    like the engine's reused edge+degree DataFrame."""
    base = (100 - damping_pct) * scale // 100
    s = f"""
, pr_edges AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
), pr_deg AS MATERIALIZED (
  SELECT u, COUNT(*) AS deg FROM pr_edges GROUP BY u
), pr_r0 AS MATERIALIZED (
  SELECT entity_name AS name, CAST({scale} AS BIGINT) AS rank FROM fused_nodes
)"""
    for i in range(iters):
        s += f"""
, pr_r{i + 1} AS MATERIALIZED (
  SELECT n.name,
         CAST({base} AS BIGINT)
           + CAST(({damping_pct} * COALESCE(s.contrib, 0)) // 100
                  AS BIGINT) AS rank
  FROM pr_r{i} n LEFT JOIN (
    SELECT e.v AS name, SUM(r.rank // d.deg) AS contrib
    FROM pr_edges e
    JOIN pr_r{i} r ON e.u = r.name
    JOIN pr_deg d ON e.u = d.u
    GROUP BY e.v
  ) s ON n.name = s.name
)"""
    return s


def pagerank_select(
    iters: int = 5, damping_pct: int = 85, scale: int = 1_000_000_000
) -> str:
    """Twin of operators/graphalgo.pagerank (see _pagerank_ctes)."""
    return (
        _pagerank_ctes(iters, damping_pct, scale)
        + f"\nSELECT name AS entity_name, rank AS rank_scaled FROM pr_r{iters}"
    )


def triangles_select() -> str:
    """Twin of operators/graphalgo.triangle_counts: degree-orientation
    triangle enumeration (orient low->high by (deg, name), wedge self-join
    on the center, closure against the symmetric edge set), each triangle
    charged to all three corners. All-integer => exact hash."""
    return """
, tr_edges AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
), tr_deg AS MATERIALIZED (
  SELECT u, COUNT(*) AS deg FROM tr_edges GROUP BY u
), tr_or AS MATERIALIZED (
  SELECT e.u, e.v
  FROM tr_edges e JOIN tr_deg a ON e.u = a.u JOIN tr_deg b ON e.v = b.u
  WHERE (a.deg < b.deg) OR (a.deg = b.deg AND e.u < e.v)
), tr AS (
  SELECT w1.u AS a, w1.v AS b, w2.v AS c
  FROM tr_or w1
  JOIN tr_or w2 ON w1.u = w2.u AND w1.v < w2.v
  JOIN tr_edges s ON s.u = w1.v AND s.v = w2.v
), tr_pn AS (
  SELECT name, COUNT(*) AS t FROM (
    SELECT a AS name FROM tr
    UNION ALL SELECT b FROM tr
    UNION ALL SELECT c FROM tr
  ) GROUP BY name
)
SELECT n.entity_name, COALESCE(p.t, 0) AS triangles
FROM fused_nodes n LEFT JOIN tr_pn p ON n.entity_name = p.name"""


def _ppr_chain(
    iters: int = 5, damping_pct: int = 85, scale: int = 1_000_000_000
) -> str:
    """The unrolled personalized-PageRank CTE chain (seed-indicator base,
    exact-integer recurrence) over the pipeline twin's nodes/edges and the
    shared qctx ``seeds`` CTE; the final relation is ``ppr_r{iters}``
    (name, seed, rank). Shared by qctx_ppr_sql and qctx_edges_ppr_sql."""
    base = (100 - damping_pct) * scale // 100
    s = f""",
ppr_edges AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM edges
  UNION
  SELECT dst AS u, src AS v FROM edges
), ppr_deg AS MATERIALIZED (
  SELECT u, COUNT(*) AS deg FROM ppr_edges GROUP BY u
), ppr_r0 AS MATERIALIZED (
  SELECT n.entity_name AS name,
         CASE WHEN s.entity_name IS NULL THEN 0 ELSE 1 END AS seed,
         CAST({scale} AS BIGINT)
           * CASE WHEN s.entity_name IS NULL THEN 0 ELSE 1 END AS rank
  FROM nodes n LEFT JOIN seeds s ON n.entity_name = s.entity_name
)"""
    for i in range(iters):
        s += f""",
ppr_r{i + 1} AS MATERIALIZED (
  SELECT n.name, n.seed,
         CAST({base} AS BIGINT) * n.seed
           + CAST(({damping_pct} * COALESCE(c.contrib, 0)) // 100
                  AS BIGINT) AS rank
  FROM ppr_r{i} n LEFT JOIN (
    SELECT e.v AS name, SUM(r.rank // d.deg) AS contrib
    FROM ppr_edges e
    JOIN ppr_r{i} r ON e.u = r.name
    JOIN ppr_deg d ON e.u = d.u
    GROUP BY e.v
  ) c ON n.name = c.name
)"""
    return s


def qctx_ppr_sql(
    cfg: PipelineConfig = DEFAULT,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
) -> str:
    """Twin of operators/graphalgo.personalized_pagerank seeded by the qctx
    seed set: the pagerank recurrence with the teleport restricted to seeds
    (seed-indicator base), unrolled as MATERIALIZED CTEs over the pipeline
    twin's nodes/edges + the shared qctx seeds CTE."""
    return (
        cte_prefix(cfg) + "," + _qctx_ctes(cfg)
        + _ppr_chain(iters, damping_pct, scale)
        + f"\nSELECT name AS entity_name, rank AS rank_scaled FROM ppr_r{iters}"
    )


def qctx_edges_ppr_sql(cfg: PipelineConfig = DEFAULT, iters: int = 5) -> str:
    """Twin of operators/query_ctx.context_edges_ppr: the qctx_edges ranking
    with edge_rank = ppr(src) + ppr(dst) from the unrolled PPR chain instead
    of the degree sum."""
    return (
        cte_prefix(cfg) + "," + _qctx_ctes(cfg) + _ppr_chain(iters) + f""",
ppr_ranked AS (
  SELECT t.src, t.dst, t.weight, t.description,
         CAST(ps.rank + pd.rank AS BIGINT) AS edge_rank
  FROM touching t
  JOIN ppr_r{iters} ps ON ps.name = t.src
  JOIN ppr_r{iters} pd ON pd.name = t.dst
),
ppr_runn AS (
  SELECT src, dst, weight, description, edge_rank,
         sum(length(description)) OVER (
           ORDER BY edge_rank DESC, weight DESC, src ASC, dst ASC
           ROWS UNBOUNDED PRECEDING) AS running_tokens
  FROM ppr_ranked
)
SELECT src, dst, weight, description, edge_rank,
       CAST(running_tokens AS BIGINT) AS running_tokens
FROM ppr_runn WHERE running_tokens <= {cfg.qctx_token_budget}
"""
    )


def components_select() -> str:
    """Twin of operators/graphalgo.connected_components: min reachable name
    per node via a recursive label-spread CTE (cte_prefix opens WITH
    RECURSIVE, so recursion composes with the pipeline chain). UNION set
    semantics bound the recursion at |V|·|component| rows — fine at oracle
    scale; the engine side is the O(log diameter) pointer-jumping fixpoint."""
    return """
, cc_edges AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
), cc_reach AS (
  SELECT entity_name AS name, entity_name AS lbl FROM fused_nodes
  UNION
  SELECT e.v AS name, r.lbl
  FROM cc_reach r JOIN cc_edges e ON e.u = r.name
)
SELECT name AS entity_name, MIN(lbl) AS component
FROM cc_reach GROUP BY name"""


def neighbor_sim_select(
    threshold_pm: int = 200_000, max_center_deg: int = 10_000
) -> str:
    """Twin of operators/graphalgo.neighbor_similarity: wedge counting on
    the shared-neighbor posting key, exact integer Jaccard of the open
    neighborhoods. Applies the identical hub-center cap (deg <=
    max_center_deg before the wedge self-join; full degrees in the
    denominator) so parity is bit-exact at any setting."""
    return f"""
, ns_edges AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
), ns_deg AS MATERIALIZED (
  SELECT u, COUNT(*) AS deg FROM ns_edges GROUP BY u
), ns_posted AS MATERIALIZED (
  SELECT e.u, e.v FROM ns_edges e
  JOIN ns_deg d ON e.u = d.u AND d.deg <= {max_center_deg}
), ns_common AS (
  SELECT x.v AS a, y.v AS b, COUNT(*) AS common
  FROM ns_posted x JOIN ns_posted y ON x.u = y.u AND x.v < y.v
  GROUP BY x.v, y.v
)
SELECT c.a, c.b, c.common,
       c.common * 1000000 // (da.deg + db.deg - c.common) AS jaccard_pm
FROM ns_common c
JOIN ns_deg da ON c.a = da.u
JOIN ns_deg db ON c.b = db.u
WHERE c.common * 1000000 // (da.deg + db.deg - c.common) >= {threshold_pm}"""


def _communities_ctes(iters: int = 4) -> str:
    """CTE chain of the LPA twin (ends at lp_r{iters}) — shared by
    communities_select and community_reps_select.

    Twin of operators/graphalgo.label_propagation: synchronous LPA
    unrolled as one (count, argmax) CTE pair per round. The argmax is a
    ROW_NUMBER window ordered (count DESC, label ASC) — the identical
    deterministic tie-break the engine uses — and nodes with no neighbors
    COALESCE to their previous label, so the value hash is exact at any
    fixed round count. MATERIALIZED for the same reason as pagerank: each
    round references the previous relation and the shared edge set."""
    s = """
, lp_edges AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
), lp_r0 AS MATERIALIZED (
  SELECT entity_name AS name, entity_name AS lbl FROM fused_nodes
)"""
    for i in range(iters):
        s += f"""
, lp_c{i} AS (
  SELECT e.v AS name, r.lbl, COUNT(*) AS c
  FROM lp_edges e JOIN lp_r{i} r ON e.u = r.name
  GROUP BY e.v, r.lbl
), lp_b{i} AS (
  SELECT name, lbl FROM (
    SELECT name, lbl,
           ROW_NUMBER() OVER (PARTITION BY name ORDER BY c DESC, lbl ASC) AS rn
    FROM lp_c{i}
  ) WHERE rn = 1
), lp_r{i + 1} AS MATERIALIZED (
  SELECT r.name, COALESCE(b.lbl, r.lbl) AS lbl
  FROM lp_r{i} r LEFT JOIN lp_b{i} b ON r.name = b.name
)"""
    return s


def communities_select(iters: int = 4) -> str:
    """Twin of operators/graphalgo.label_propagation (see _communities_ctes)."""
    return (
        _communities_ctes(iters)
        + f"\nSELECT name AS entity_name, lbl AS community FROM lp_r{iters}"
    )


def pagerank_weighted_select(
    iters: int = 5, damping_pct: int = 85, scale: int = 1_000_000_000
) -> str:
    """Twin of operators/graphalgo.pagerank_weighted: milli-unit integer
    weights, weight-proportional contributions, the same unrolled
    MATERIALIZED recurrence as pagerank_select."""
    base = (100 - damping_pct) * scale // 100
    s = f"""
, wpr_edges AS MATERIALIZED (
  SELECT src AS u, dst AS v, CAST(round(weight * 1000) AS BIGINT) AS w
  FROM fused_edges
  UNION
  SELECT dst AS u, src AS v, CAST(round(weight * 1000) AS BIGINT) AS w
  FROM fused_edges
), wpr_deg AS MATERIALIZED (
  SELECT u, CAST(SUM(w) AS BIGINT) AS wsum FROM wpr_edges GROUP BY u
), wpr_r0 AS MATERIALIZED (
  SELECT entity_name AS name, CAST({scale} AS BIGINT) AS rank FROM fused_nodes
)"""
    for i in range(iters):
        s += f"""
, wpr_r{i + 1} AS MATERIALIZED (
  SELECT n.name,
         CAST({base} AS BIGINT)
           + CAST(({damping_pct} * COALESCE(s.contrib, 0)) // 100
                  AS BIGINT) AS rank
  FROM wpr_r{i} n LEFT JOIN (
    SELECT e.v AS name, SUM((r.rank * e.w) // d.wsum) AS contrib
    FROM wpr_edges e
    JOIN wpr_r{i} r ON e.u = r.name
    JOIN wpr_deg d ON e.u = d.u
    GROUP BY e.v
  ) s ON n.name = s.name
)"""
    return s + f"\nSELECT name AS entity_name, rank AS rank_scaled FROM wpr_r{iters}"


def kcore_select(k: int = 2, max_rounds: int = 12) -> str:
    """Twin of operators/graphalgo.kcore: the peeling recurrence unrolled as
    one (degree-filter, edge-restrict) CTE pair per round. Peeling is
    monotone — once the fixpoint is reached every further round is a no-op —
    so unrolling exactly ``max_rounds`` rounds hashes the identical
    surviving relation as the engine's converge-early loop (the engine
    raises before returning anything unconverged)."""
    s = """
, kc_e0 AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
)"""
    for i in range(max_rounds):
        s += f"""
, kc_k{i} AS (
  SELECT u FROM kc_e{i} GROUP BY u HAVING COUNT(*) >= {k}
), kc_e{i + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM kc_e{i} e
  JOIN kc_k{i} a ON e.u = a.u
  JOIN kc_k{i} b ON e.v = b.u
)"""
    return (
        s
        + f"\nSELECT u AS entity_name, COUNT(*) AS core_deg"
        f" FROM kc_e{max_rounds} GROUP BY u"
    )


def enh_nodes_select() -> str:
    return "SELECT entity_name, entity_type, description, source_id FROM enh_nodes"


def enh_edges_select() -> str:
    return 'SELECT src, dst, weight, description, source_id, "order" FROM enh_edges'


def q(select: str, cfg: PipelineConfig = DEFAULT) -> str:
    """Full oracle query: shared CTE prefix + a final SELECT."""
    return cte_prefix(cfg) + select


def linkpred_ra_select(k: int = 50, max_center_deg: int = 10_000) -> str:
    """Twin of operators/graphalgo.linkpred_ra: wedge generation with
    center 10^6 div deg weights, existing edges anti-joined out, global
    top-k by (ra_pm DESC, a, b)."""
    return f"""
, lp_sym AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
), lp_deg AS MATERIALIZED (
  SELECT u, COUNT(*) AS deg FROM lp_sym GROUP BY u
), lp_posted AS MATERIALIZED (
  SELECT e.u, e.v, 1000000 // d.deg AS cw
  FROM lp_sym e JOIN lp_deg d ON e.u = d.u AND d.deg <= {max_center_deg}
), lp_scored AS (
  SELECT x.v AS a, y.v AS b,
         CAST(COUNT(*) AS BIGINT) AS common,
         CAST(SUM(x.cw) AS BIGINT) AS ra_pm
  FROM lp_posted x JOIN lp_posted y ON x.u = y.u AND x.v < y.v
  GROUP BY x.v, y.v
), lp_nonadj AS (
  SELECT s.* FROM lp_scored s
  ANTI JOIN lp_sym e ON s.a = e.u AND s.b = e.v
)
SELECT a, b, common, ra_pm, rnk FROM (
  SELECT a, b, common, ra_pm,
         CAST(ROW_NUMBER() OVER (ORDER BY ra_pm DESC, a, b) AS BIGINT) AS rnk
  FROM lp_nonadj
) WHERE rnk <= {k}"""


def degree_dist_select() -> str:
    """Twin of operators/graphalgo.degree_distribution: log2 degree buckets
    via integer bit length (length(bin(deg)) - 1 in both engines)."""
    return """
, dd_sym AS (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
), dd_deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM dd_sym GROUP BY u
)
SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(deg) AS min_deg,
       MAX(deg) AS max_deg
FROM dd_deg GROUP BY 1"""


def truss_select(k: int = 3, max_rounds: int = 12) -> str:
    """Twin of operators/graphalgo.truss: support-peeling unrolled as one
    (wedge-support, edge-filter) CTE pair per round. Peeling is monotone,
    so unrolling exactly ``max_rounds`` rounds hashes the identical
    surviving relation as the engine's converge-early loop (the engine
    raises before returning anything unconverged). MATERIALIZED for the
    same exponential-inlining reason as pagerank_select."""
    ms = k - 2
    s = """
, tr_e0 AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges WHERE src < dst
  UNION
  SELECT dst AS u, src AS v FROM fused_edges WHERE dst < src
)"""
    for i in range(max_rounds):
        s += f"""
, tr_s{i} AS MATERIALIZED (
  SELECT u, v FROM tr_e{i} UNION ALL SELECT v, u FROM tr_e{i}
), tr_e{i + 1} AS MATERIALIZED (
  SELECT a AS u, b AS v FROM (
    SELECT x.v AS a, y.v AS b, COUNT(*) AS support
    FROM tr_s{i} x
    JOIN tr_s{i} y ON x.u = y.u AND x.v < y.v
    JOIN tr_e{i} e ON e.u = x.v AND e.v = y.v
    GROUP BY x.v, y.v
  ) WHERE support >= {ms}
)"""
    return (
        s
        + f"""
, tr_sf AS (
  SELECT u, v FROM tr_e{max_rounds} UNION ALL SELECT v, u FROM tr_e{max_rounds}
)
SELECT x.v AS u, y.v AS v, CAST(COUNT(*) AS BIGINT) AS support
FROM tr_sf x
JOIN tr_sf y ON x.u = y.u AND x.v < y.v
JOIN tr_e{max_rounds} e ON e.u = x.v AND e.v = y.v
GROUP BY x.v, y.v"""
    )


def closeness_select(n_landmarks: int = 8, max_rounds: int = 12) -> str:
    """Twin of operators/graphalgo.closeness_landmarks: the synchronous
    min-relaxation unrolled as one CTE per BFS round (the recursive-CTE
    form would need WITH RECURSIVE at the prefix head). Monotone + the
    engine's raise-on-non-convergence ⇒ identical fixpoint at
    ``max_rounds``. Landmark pick is the same total order (deg DESC,
    name ASC)."""
    s = f"""
, cl_sym AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
), cl_deg AS (
  SELECT u, COUNT(*) AS deg FROM cl_sym GROUP BY u
), cl_seeds AS MATERIALIZED (
  SELECT u AS seed FROM cl_deg ORDER BY deg DESC, u ASC LIMIT {n_landmarks}
), cl_d0 AS MATERIALIZED (
  SELECT seed, seed AS name, CAST(0 AS BIGINT) AS dist FROM cl_seeds
)"""
    for i in range(max_rounds):
        s += f"""
, cl_d{i + 1} AS MATERIALIZED (
  SELECT seed, name, MIN(dist) AS dist FROM (
    SELECT seed, name, dist FROM cl_d{i}
    UNION ALL
    SELECT d.seed, s.v AS name, d.dist + 1 AS dist
    FROM cl_d{i} d JOIN cl_sym s ON d.name = s.u
  ) GROUP BY seed, name
)"""
    return (
        s
        + f"""
, cl_pn AS (
  SELECT name, CAST(COUNT(*) AS BIGINT) AS reached,
         CAST(SUM(dist) AS BIGINT) AS dist_sum
  FROM cl_d{max_rounds} GROUP BY name
)
SELECT n.entity_name,
       CAST(COALESCE(p.reached, 0) AS BIGINT) AS reached,
       CAST(COALESCE(p.dist_sum, 0) AS BIGINT) AS dist_sum,
       CAST(CASE WHEN COALESCE(p.dist_sum, 0) = 0 THEN 0
            ELSE COALESCE(p.reached, 0) * 1000000 // p.dist_sum END AS BIGINT)
         AS closeness_pm
FROM fused_nodes n LEFT JOIN cl_pn p ON n.entity_name = p.name"""
    )


def scc_select() -> str:
    """Twin of operators/graphalgo.strongly_connected_components: closed-
    form mutual reachability — reach(u,v) via a recursive CTE over the
    directed edges, SCC(u) = {v : reach(u,v) AND reach(v,u)}, label =
    MIN over that set (u itself is in it via the base rows). No unroll
    depth to keep in sync with the engine's peeling loop."""
    return """
, scc_edges AS MATERIALIZED (
  SELECT DISTINCT src AS u, dst AS v FROM fused_edges WHERE src <> dst
), scc_reach AS (
  SELECT entity_name AS u, entity_name AS v FROM fused_nodes
  UNION
  SELECT r.u, e.v FROM scc_reach r JOIN scc_edges e ON e.u = r.v
)
SELECT r1.u AS entity_name, MIN(r1.v) AS scc
FROM scc_reach r1 JOIN scc_reach r2 ON r1.u = r2.v AND r1.v = r2.u
GROUP BY r1.u"""


def hits_select(iters: int = 5, scale: int = 1_000_000_000) -> str:
    """Twin of operators/graphalgo.hits: the max-normalized integer HITS
    recurrence unrolled as chained MATERIALIZED CTEs (the pagerank_select
    inlining lesson applies — each round references the previous twice)."""
    s = """
, ht_edges AS MATERIALIZED (
  SELECT DISTINCT src AS u, dst AS v FROM fused_edges WHERE src <> dst
), ht_s0 AS MATERIALIZED (
  SELECT entity_name AS name,
         CAST({sc} AS BIGINT) AS h, CAST({sc} AS BIGINT) AS a
  FROM fused_nodes
)""".format(sc=scale)
    for i in range(iters):
        s += f"""
, ht_ra{i} AS MATERIALIZED (
  SELECT e.v AS name, SUM(p.h) AS raw
  FROM ht_edges e JOIN ht_s{i} p ON e.u = p.name GROUP BY e.v
), ht_a{i} AS MATERIALIZED (
  SELECT n.name,
         CAST(COALESCE(r.raw, 0)::HUGEINT * {scale}
              // greatest((SELECT MAX(raw) FROM ht_ra{i}), 1)
              AS BIGINT) AS a
  FROM ht_s{i} n LEFT JOIN ht_ra{i} r ON n.name = r.name
), ht_rh{i} AS MATERIALIZED (
  SELECT e.u AS name, SUM(p.a) AS raw
  FROM ht_edges e JOIN ht_a{i} p ON e.v = p.name GROUP BY e.u
), ht_s{i + 1} AS MATERIALIZED (
  SELECT n.name,
         CAST(COALESCE(r.raw, 0)::HUGEINT * {scale}
              // greatest((SELECT MAX(raw) FROM ht_rh{i}), 1)
              AS BIGINT) AS h,
         a.a AS a
  FROM ht_s{i} n
  LEFT JOIN ht_rh{i} r ON n.name = r.name
  JOIN ht_a{i} a ON n.name = a.name
)"""
    return s + (
        f"\nSELECT name AS entity_name, h AS hub_scaled, a AS auth_scaled"
        f" FROM ht_s{iters}"
    )


def frame_dedup_select(n_frames: int = 3, frame_bytes: int = 16) -> str:
    """Twin of operators/multimodal.frame_dedup over the mm_frames frame
    relation (embedded verbatim as a CTE)."""
    return f"""
, fd_frames AS (
  SELECT media_ref,
         md5(substr(media_ref || ':' || context,
                    CAST(u.k AS INT) * {frame_bytes} + 1, {frame_bytes}))
           AS frame_md5
  FROM media, UNNEST(range({n_frames})) AS u(k)
  WHERE length(media_ref || ':' || context) > CAST(u.k AS INT) * {frame_bytes}
), fd_sharing AS (
  SELECT frame_md5, count(DISTINCT media_ref) AS n_media
  FROM fd_frames GROUP BY frame_md5
)
SELECT f.media_ref,
       count(*) AS n_frames,
       CAST(sum(CASE WHEN s.n_media >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       CAST(sum(CASE WHEN s.n_media >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         * 1000000 // count(*) AS shared_ppm
FROM fd_frames f JOIN fd_sharing s ON s.frame_md5 = f.frame_md5
GROUP BY f.media_ref
"""


def _phash_ctes() -> str:
    """Shared CTE chain reproducing multimodal.perceptual_hashes bit-for-bit
    via ascii-code list arithmetic (the stand-in 'pixels' are the payload
    characters, which are ASCII by construction). The hex string is built
    per 16-bit part (%04x of h3..h0) — identical to %016x of the combined
    64-bit value without ever forming it (bit 63 would overflow BIGINT)."""
    return """
, ph_base AS (
  SELECT media_ref, media_ref || ':' || context AS t FROM media
), ph_codes AS (
  SELECT media_ref,
         [ascii(substring(t, i + 1, 1)) for i in range(length(t))] AS codes
  FROM ph_base
), ph_bits AS (
  SELECT media_ref,
         [CASE WHEN ((j + 1) * len(codes)) // 64 - (j * len(codes)) // 64 > 0
               AND list_sum(list_slice(codes, (j * len(codes)) // 64 + 1,
                                       ((j + 1) * len(codes)) // 64))
                     * len(codes)
                   >= list_sum(codes)
                     * (((j + 1) * len(codes)) // 64 - (j * len(codes)) // 64)
               THEN 1 ELSE 0 END for j in range(64)] AS bits
  FROM ph_codes
), ph_h AS (
  SELECT media_ref,
         CAST(list_sum([bits[t + 1] * (1 << t) for t in range(16)]) AS BIGINT) AS h0,
         CAST(list_sum([bits[16 + t + 1] * (1 << t) for t in range(16)]) AS BIGINT) AS h1,
         CAST(list_sum([bits[32 + t + 1] * (1 << t) for t in range(16)]) AS BIGINT) AS h2,
         CAST(list_sum([bits[48 + t + 1] * (1 << t) for t in range(16)]) AS BIGINT) AS h3
  FROM ph_bits
)"""


def phash_select() -> str:
    """Twin of operators/multimodal.perceptual_hashes."""
    return _phash_ctes() + """
SELECT media_ref, h0, h1, h2, h3,
       printf('%04x%04x%04x%04x', h3, h2, h1, h0) AS phash
FROM ph_h
"""


def phash_pairs_select(max_hamming: int = 3) -> str:
    """Twin of operators/multimodal.phash_pairs: block-equal candidates
    (complete for hamming <= 3 with 4 blocks) + exact xor popcount."""
    return _phash_ctes() + f"""
, ph_blocks AS (
  SELECT media_ref, u.k AS k,
         CASE u.k WHEN 0 THEN h0 WHEN 1 THEN h1 WHEN 2 THEN h2 ELSE h3 END AS v
  FROM ph_h, UNNEST(range(4)) AS u(k)
), ph_cand AS (
  SELECT DISTINCT x.media_ref AS a, y.media_ref AS b
  FROM ph_blocks x JOIN ph_blocks y
    ON x.k = y.k AND x.v = y.v AND x.media_ref < y.media_ref
)
SELECT c.a, c.b,
       CAST(bit_count(xor(ha.h0, hb.h0)) + bit_count(xor(ha.h1, hb.h1))
            + bit_count(xor(ha.h2, hb.h2)) + bit_count(xor(ha.h3, hb.h3))
            AS BIGINT) AS hamming
FROM ph_cand c
JOIN ph_h ha ON ha.media_ref = c.a
JOIN ph_h hb ON hb.media_ref = c.b
WHERE bit_count(xor(ha.h0, hb.h0)) + bit_count(xor(ha.h1, hb.h1))
      + bit_count(xor(ha.h2, hb.h2)) + bit_count(xor(ha.h3, hb.h3))
      <= {max_hamming}
"""


def reciprocity_select() -> str:
    """Twin of operators/graphalgo.reciprocity."""
    return """
, rc_e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM fused_edges WHERE src <> dst
), rc_out AS (
  SELECT src AS name, count(*) AS n_out FROM rc_e GROUP BY src
), rc_rec AS (
  SELECT e.src AS name, count(*) AS n_reciprocal
  FROM rc_e e JOIN rc_e r ON r.src = e.dst AND r.dst = e.src
  GROUP BY e.src
)
SELECT n.entity_name,
       COALESCE(o.n_out, 0) AS n_out,
       COALESCE(r.n_reciprocal, 0) AS n_reciprocal,
       COALESCE(r.n_reciprocal, 0) * 1000000
         // greatest(COALESCE(o.n_out, 0), 1) AS reciprocity_ppm
FROM (SELECT DISTINCT entity_name FROM fused_nodes) n
LEFT JOIN rc_out o ON o.name = n.entity_name
LEFT JOIN rc_rec r ON r.name = n.entity_name
"""


def clustering_select() -> str:
    """Twin of operators/graphalgo.clustering_coefficients: the
    triangles_select chain joined back to degrees, ratio in exact ppm."""
    return triangles_select().replace(
        """
SELECT n.entity_name, COALESCE(p.t, 0) AS triangles
FROM fused_nodes n LEFT JOIN tr_pn p ON n.entity_name = p.name""",
        """
SELECT n.entity_name,
       COALESCE(d.deg, 0) AS deg,
       COALESCE(p.t, 0) AS triangles,
       CASE WHEN COALESCE(d.deg, 0) >= 2
            THEN 2 * COALESCE(p.t, 0) * 1000000
                 // (d.deg * (d.deg - 1))
            ELSE 0 END AS clustering_ppm
FROM fused_nodes n
LEFT JOIN tr_pn p ON n.entity_name = p.name
LEFT JOIN tr_deg d ON n.entity_name = d.u""")


def _random_walk_ctes(walks_per_node: int = 2, length: int = 3) -> str:
    """Shared CTE chain for the walk-corpus twins (random_walks_select and
    walk_pairs_select): identical md5-rank hop rule over the rank-indexed
    symmetric adjacency, one MATERIALIZED CTE per step (each step
    references the previous frontier; materialization keeps the plan
    linear in ``length``, the pagerank_select lesson). Ends with ``rw_out``
    = the (walk_id, step, node) corpus relation."""
    s = f"""
, rw_sym AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM fused_edges
  UNION
  SELECT dst AS u, src AS v FROM fused_edges
), rw_deg AS MATERIALIZED (
  SELECT u, COUNT(*) AS deg FROM rw_sym GROUP BY u
), rw_adj AS MATERIALIZED (
  SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) - 1 AS r
  FROM rw_sym
), rw_f0 AS MATERIALIZED (
  SELECT n.entity_name || '#' || CAST(w.w AS VARCHAR) AS walk_id,
         n.entity_name AS cur
  FROM fused_nodes n
  CROSS JOIN (SELECT unnest(range(0, {walks_per_node})) AS w) w
)"""
    for step in range(1, length + 1):
        s += f"""
, rw_f{step} AS MATERIALIZED (
  SELECT f.walk_id, a.v AS cur
  FROM rw_f{step - 1} f
  JOIN rw_deg d ON d.u = f.cur
  JOIN rw_adj a ON a.u = f.cur
   AND a.r = ('0x' || substr(md5(f.walk_id || ':{step}'), 1, 15))::BIGINT
              % d.deg
)"""
    parts = [
        f"SELECT walk_id, CAST({i} AS BIGINT) AS step, cur AS node FROM rw_f{i}"
        for i in range(0, length + 1)
    ]
    return (
        s
        + "\n, rw_out AS MATERIALIZED (\n"
        + "\nUNION ALL\n".join(parts)
        + "\n)"
    )


def random_walks_select(walks_per_node: int = 2, length: int = 3) -> str:
    """Twin of operators/graphalgo.random_walks (see _random_walk_ctes)."""
    return (
        _random_walk_ctes(walks_per_node, length)
        + "\nSELECT walk_id, step, node FROM rw_out"
    )


def walk_pairs_select(
    walks_per_node: int = 2, length: int = 3, window: int = 2
) -> str:
    """Twin of operators/graphalgo.walk_skipgram_pairs: self-join of the
    walk corpus on walk_id with |Δstep| ∈ [1, window], global pair count."""
    return (
        _random_walk_ctes(walks_per_node, length)
        + f"""
SELECT a.node AS center, b.node AS context,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM rw_out a JOIN rw_out b
  ON a.walk_id = b.walk_id
 AND a.step <> b.step
 AND abs(a.step - b.step) <= {window}
GROUP BY 1, 2"""
    )


def cooccurrence_graph_select(
    max_chunk_entities: int = 1000, min_chunks: int = 1
) -> str:
    """Twin of operators/graphalgo.cooccurrence_graph: chunk-basket pair
    join capped pre-join, marginals over ALL chunks, exact ppm lift."""
    return f"""
, co_inc AS (
  SELECT DISTINCT chunk_id, entity_name AS item FROM mentions
), co_small AS (
  SELECT chunk_id FROM co_inc GROUP BY chunk_id
  HAVING COUNT(*) <= {max_chunk_entities}
), co_basket AS (
  SELECT i.chunk_id, i.item FROM co_inc i JOIN co_small s USING (chunk_id)
), co_pairs AS (
  SELECT a.item AS src, b.item AS dst, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM co_basket a JOIN co_basket b
    ON a.chunk_id = b.chunk_id AND a.item < b.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_chunks}
), co_marg AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM co_inc GROUP BY item
), co_tot AS (
  SELECT CAST(COUNT(DISTINCT chunk_id) AS BIGINT) AS n_chunks FROM co_inc
)
SELECT p.src, p.dst, p.n_xy, x.n AS n_x, y.n AS n_y, t.n_chunks,
       CAST(CAST(p.n_xy AS HUGEINT) * t.n_chunks * 1000000
            // (CAST(x.n AS HUGEINT) * y.n) AS BIGINT) AS lift_ppm
FROM co_pairs p
JOIN co_marg x ON p.src = x.item
JOIN co_marg y ON p.dst = y.item
CROSS JOIN co_tot t"""


def community_reps_select(iters: int = 4, pr_iters: int = 5) -> str:
    """Twin of operators/graphalgo.community_representatives: the
    _pagerank_ctes and _communities_ctes chains composed verbatim (no
    parsing of rendered SQL), then one argmax window per community."""
    return (
        _pagerank_ctes(pr_iters)
        + _communities_ctes(iters)
        + f"""
, cr AS (
  SELECT r.lbl AS community, r.name, p.rank
  FROM lp_r{iters} r JOIN pr_r{pr_iters} p ON r.name = p.name
)
SELECT community, name AS rep, rank AS rep_rank_scaled, n_members FROM (
  SELECT community, name, rank,
         ROW_NUMBER() OVER (PARTITION BY community
                            ORDER BY rank DESC, name ASC) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY community) AS BIGINT) AS n_members
  FROM cr
) WHERE rn = 1"""
    )
