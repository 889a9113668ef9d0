"""M2–M7 + J5/J6 — spectral-clustering fusion of image and text entities.

Reference lifecycle (/root/reference/mmgraphrag/fusion.py): per image, collect
nearby text entities (J2 range join :141-179), build a cosine affinity matrix
weighted by relation strength (M2 :212-226), unnormalized Laplacian +
eigendecomposition with k = max(2, ceil(sqrt(n))) (M3 :228-243), DBSCAN
(eps=0.5, min_samples=max(1, ceil(n/10))) on the spectral embedding (M4
:245-251), kNN label transfer to image entities (M5 :256-267), LLM judge picks
merges (M7 :387-464), then the merge-map rewires the graph (J6 :757-801).

Spark-first re-architecture:

* the neighborhood is a **word-window** around each media span's anchor (the
  reference's ±1-chunk window, expressed in word offsets so it is independent
  of chunk dedup) — built with one range-condition join;
* embeddings are JVM-side deterministic hash embeddings (operators/embedding);
* each media block (media_ref) is one ``applyInPandas`` group: numpy affinity,
  ``eigh`` on the symmetrized Laplacian (§4.2 determinism: the reference's
  ``eig``+abs on a non-symmetric matrix is numerically unstable across
  BLAS builds), a small self-contained DBSCAN, top-1 cosine label transfer;
* the judge (M7) is the deterministic rule *merge iff nearest text entity has
  surface-form cosine ≥ merge_cos and shares the DBSCAN label* — with hash
  embeddings this fires exactly on surface-form equality, the property the
  DuckDB oracle replicates;
* J6 rewiring = broadcast merge-map join + re-canonicalization (A1/A2) —
  the salted/AQE path of canonicalize.py handles hub skew.

Blocks are small (≤ ~2·fusion_window/min_len + scene entities), so per-block
O(n³) eigendecomposition is microseconds; the stage parallelizes over blocks
(one shuffle on media_ref).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT, PipelineConfig
from . import canonicalize as canon
from .embedding import with_embedding

MERGE_SCHEMA = "doc_id string, media_ref string, old_name string, new_name string"
# one applyInPandas pass emits both products of the block computation:
#   kind='cluster': (entity_name, label) — M3/M4 spectral clustering + M6 groups
#   kind='merge'  : (entity_name=old, new_name) — M5 transfer + M7 judge
FUSION_SCHEMA = (
    "doc_id string, media_ref string, kind string, entity_name string,"
    " label long, new_name string"
)


def word_positions(flat_spans: DataFrame, cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """(doc_id, wpos, tok): global word offsets from the text spans.

    Text spans partition the doc's words losslessly (synth contract), so
    global position = span_index * span_words + position-in-span. We recover
    the span index from the span's text-rank within the doc rather than trust
    ``offset`` (media spans interleave).
    """
    # text spans ordered by offset == ordered by span index
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("offset")
    t = (
        flat_spans.filter(F.col("kind") == "text")
        .withColumn("span_idx", F.row_number().over(w) - 1)
    )
    return t.select(
        "doc_id", "span_idx",
        F.posexplode(F.split("text", " ")).alias("j", "tok"),
    ).select(
        "doc_id",
        (F.col("span_idx") * F.lit(cfg.span_words) + F.col("j")).alias("wpos"),
        "tok",
    )


def media_anchors(media: DataFrame, cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """(doc_id, media_ref, anchor): word offset the media span interleaves at.

    media_ref = '<doc>/image_<k>' is emitted after text span i = k*every - 1
    (synth contract), so anchor = i * span_words.
    """
    # try_cast: ANSI constant folding would otherwise evaluate the cast on
    # the union branch whose media_ref is the literal '' (text spans) before
    # the kind-filter prunes it.
    k = F.expr(r"try_cast(regexp_extract(media_ref, '_(\\d+)$', 1) AS int)")
    i = k * cfg.media_every - 1
    return media.select(
        "doc_id", "media_ref", (i * cfg.span_words).alias("anchor")
    )


def nearby_text_entities(
    flat_spans: DataFrame, media: DataFrame, cfg: PipelineConfig = DEFAULT
) -> DataFrame:
    """J2 analogue: distinct text entity surface forms within ±fusion_window
    words of each media anchor."""
    words = word_positions(flat_spans, cfg)
    anchors = media_anchors(media, cfg)
    K = cfg.fusion_window
    return (
        anchors.join(words, "doc_id")
        .filter(
            (F.col("wpos") >= F.col("anchor") - K)
            & (F.col("wpos") < F.col("anchor") + K)
            & (F.length("tok") >= cfg.mention_min_len)
        )
        .select(
            "doc_id", "media_ref", F.upper("tok").alias("entity_name"),
        )
        .distinct()
    )


def _dbscan(X, eps: float, min_samples: int):
    """Self-contained deterministic DBSCAN (euclidean), index-ordered BFS."""
    import numpy as np

    n = len(X)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    nbr = d2 <= eps * eps
    core = nbr.sum(1) >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cur = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        stack = [i]
        labels[i] = cur
        while stack:
            p = stack.pop()
            if not core[p]:
                continue
            for q in np.nonzero(nbr[p])[0]:
                if labels[q] == -1:
                    labels[q] = cur
                    if core[q]:
                        stack.append(q)
        cur += 1
    return labels


def _fuse_block(pdf, eps: float, merge_cos: float):
    """One media block: spectral clustering + kNN transfer + merge rule.

    Returns FUSION_SCHEMA rows: one 'cluster' row per text entity and one
    'merge' row per accepted image→text merge.
    """
    import numpy as np
    import pandas as pd

    txt = pdf[pdf["side"] == "text"].reset_index(drop=True)
    img = pdf[pdf["side"] == "image"].reset_index(drop=True)
    empty = pd.DataFrame({
        "doc_id": pd.Series(dtype=object), "media_ref": pd.Series(dtype=object),
        "kind": pd.Series(dtype=object), "entity_name": pd.Series(dtype=object),
        "label": pd.Series(dtype="int64"), "new_name": pd.Series(dtype=object),
    })
    if len(txt) == 0:
        return empty

    E_txt = np.vstack(txt["embedding"].to_numpy())

    # M2 affinity over text entities (image entities are transferred onto the
    # text clustering, reference fusion.py:256-267)
    A = E_txt @ E_txt.T
    A = np.clip(A, 0.0, None)
    np.fill_diagonal(A, 0.0)

    n = len(txt)
    if n >= 2:
        # M3: unnormalized Laplacian, k = max(2, ceil(sqrt(n))) smallest
        # eigenvectors of the symmetrized L (fusion.py:228-243)
        L = np.diag(A.sum(1)) - A
        vals, vecs = np.linalg.eigh((L + L.T) / 2.0)
        k = min(n, max(2, math.ceil(math.sqrt(n))))
        Y = vecs[:, :k]
        # M4: DBSCAN on the spectral embedding (fusion.py:245-251)
        labels = _dbscan(Y, eps, max(1, math.ceil(n / 10)))
    else:
        labels = np.zeros(n, dtype=np.int64)

    clusters = pd.DataFrame({
        "doc_id": txt["doc_id"], "media_ref": txt["media_ref"],
        "kind": "cluster", "entity_name": txt["entity_name"],
        "label": labels.astype("int64"), "new_name": None,
    })
    if len(img) == 0:
        return clusters

    E_img = np.vstack(img["embedding"].to_numpy())

    # M5: top-1 cosine label transfer (fusion.py:256-267 semantics, with the
    # documented n-capping bug replaced by well-defined top-1). The image
    # entity inherits labels[nearest]; under top-1 transfer the reference's
    # "judge within the shared cluster" step reduces to the cosine threshold
    # (the transferred label IS the nearest text entity's label), so the
    # deterministic judge is: merge iff surface-form cosine ≥ τ.
    S = E_img @ E_txt.T
    nearest = S.argmax(1)
    best = S[np.arange(len(img)), nearest]
    keep = best >= merge_cos
    merges = pd.DataFrame({
        "doc_id": img["doc_id"], "media_ref": img["media_ref"],
        "kind": "merge", "entity_name": img["entity_name"],
        "label": labels[nearest].astype("int64"),
        "new_name": txt["entity_name"].to_numpy()[nearest],
    })[keep]
    return pd.concat([clusters, merges], ignore_index=True)


def fusion_blocks(
    flat_spans: DataFrame,
    media: DataFrame,
    img_mentions: DataFrame,
    cfg: PipelineConfig = DEFAULT,
) -> DataFrame:
    """M2–M7 in one pass per media block: FUSION_SCHEMA rows (clusters +
    merge decisions). Deterministic; one shuffle on media_ref."""
    scene = (
        img_mentions.filter(~F.col("entity_type").isin("ORI_IMG", "IMG"))  # P7
        .select("doc_id", "entity_name", "source_id")
        .withColumnRenamed("source_id", "media_ref")
        .distinct()
        .withColumn("side", F.lit("image"))
        # surface form = the part the mm-extractor saw (before the block tag)
        .withColumn("surface", F.expr("split(entity_name, '@')[0]"))
    )
    nearby = (
        nearby_text_entities(flat_spans, media, cfg)
        .withColumn("side", F.lit("text"))
        .withColumn("surface", F.col("entity_name"))
    )
    both = with_embedding(
        nearby.unionByName(
            scene.select("doc_id", "media_ref", "entity_name", "side", "surface")
        ),
        "surface", cfg=cfg,
    )

    eps, tau = cfg.fusion_eps, cfg.merge_cos
    return both.repartition("media_ref").groupBy("media_ref").applyInPandas(
        lambda pdf: _fuse_block(pdf, eps, tau), schema=FUSION_SCHEMA
    )


def merge_map_from_blocks(blocks: DataFrame) -> DataFrame:
    """(doc_id, media_ref, old_name, new_name) merge decisions."""
    return blocks.filter(F.col("kind") == "merge").select(
        "doc_id", "media_ref",
        F.col("entity_name").alias("old_name"), "new_name",
    )


def cluster_assignments(blocks: DataFrame) -> DataFrame:
    """(doc_id, media_ref, entity_name, label) spectral clusters (M3/M4/M6)."""
    return blocks.filter(F.col("kind") == "cluster").select(
        "doc_id", "media_ref", "entity_name", "label"
    )


def merge_map(
    flat_spans: DataFrame,
    media: DataFrame,
    img_mentions: DataFrame,
    cfg: PipelineConfig = DEFAULT,
) -> DataFrame:
    return merge_map_from_blocks(fusion_blocks(flat_spans, media, img_mentions, cfg))


def enhance_map(
    flat_spans: DataFrame,
    media: DataFrame,
    img_mentions: DataFrame,
    mm: DataFrame,
    cfg: PipelineConfig = DEFAULT,
) -> DataFrame:
    """M9 — enhancement of image entities that fusion did NOT merge.

    Reference semantics (/root/reference/mmgraphrag/fusion.py:504-594): image
    entities with no text match get LLM-enriched names/descriptions from
    nearby chunks, then the graph is relabeled. Deterministic analogue: every
    unmerged scene entity is renamed to ``ENH:<surface>@<REF>`` and its
    description is extended with its lexicographically-first nearby text
    entity (the deterministic stand-in for "enrich from nearby context");
    entities with no nearby text keep ``none`` as context. Output columns
    (old_name, new_name, new_description) feed the same J6 rename machinery
    as the merge map.
    """
    scene = (
        img_mentions.filter(~F.col("entity_type").isin("ORI_IMG", "IMG"))
        .select("doc_id", "entity_name", F.col("source_id").alias("media_ref"))
        .distinct()
    )
    unmerged = scene.join(
        mm.select(F.col("old_name").alias("entity_name")).distinct(),
        "entity_name", "left_anti",
    )
    nearest = (
        nearby_text_entities(flat_spans, media, cfg)
        .groupBy("media_ref")
        .agg(F.min("entity_name").alias("ctx_entity"))
    )
    surface = F.expr("split(entity_name, '@')[0]")
    return (
        unmerged.join(nearest, "media_ref", "left")
        .select(
            "doc_id", "media_ref",
            F.col("entity_name").alias("old_name"),
            F.concat(
                F.lit("ENH:"), surface, F.lit("@"), F.upper("media_ref")
            ).alias("new_name"),
            F.coalesce(F.col("ctx_entity"), F.lit("none")).alias("ctx_entity"),
        )
    )


def enhanced_graph(
    all_mentions: DataFrame,
    all_triples: DataFrame,
    mm: DataFrame,
    em: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """M9 composition: J6 merge rewiring, then rename unmerged image entities
    and append their context to descriptions, then re-canonicalize."""
    m2 = apply_merge_map(all_mentions, mm, ["entity_name"])
    t2 = apply_merge_map(all_triples, mm, ["subj", "obj"])

    e = F.broadcast(em.select("old_name", "new_name", "ctx_entity").distinct())
    m3 = (
        m2.join(e, m2["entity_name"] == e["old_name"], "left")
        .select(
            F.coalesce("new_name", "entity_name").alias("entity_name"),
            "entity_type",
            F.when(
                F.col("new_name").isNotNull(),
                F.concat("description", F.lit(" | context: "), "ctx_entity"),
            ).otherwise(F.col("description")).alias("description"),
            "source_id",
        )
    )
    names = F.broadcast(em.select("old_name", "new_name").distinct())
    t3 = t2
    for c in ["subj", "obj"]:
        t3 = (
            t3.join(names, t3[c] == names["old_name"], "left")
            .withColumn(c, F.coalesce("new_name", c))
            .drop("old_name", "new_name")
        )
    t3 = t3.select(
        F.least("subj", "obj").alias("subj"),
        F.greatest("subj", "obj").alias("obj"),
        "description", "weight", "source_id", "order",
    )
    nodes = canon.build_nodes(m3)
    edges = canon.build_edges(t3)
    return canon.add_stub_nodes(nodes, edges), edges


def apply_merge_map(df: DataFrame, mm: DataFrame, cols: list[str]) -> DataFrame:
    """J6 rewiring: replace every occurrence of an old name in ``cols`` with
    its canonical name. The merge map is small (≤ scene entities) →
    broadcast; old names are globally unique (block-tagged) so the map join
    is unambiguous."""
    m = F.broadcast(
        mm.select("old_name", "new_name").distinct()
    )
    out = df
    for c in cols:
        out = (
            out.join(m, out[c] == m["old_name"], "left")
            .withColumn(c, F.coalesce("new_name", c))
            .drop("old_name", "new_name")
        )
    return out


def fuse_graph(
    all_mentions: DataFrame,
    all_triples: DataFrame,
    mm: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """J5/J6 + final A1/A2: the unified graph after fusion.

    Rewrites mention/triple endpoints through the merge map, then
    re-canonicalizes — equivalent to the reference's compose + rewire +
    merge (fusion.py:707-807) but order-independent (scored on triples)."""
    # the map is joined three times (entity_name, subj, obj); persist so the
    # spectral applyInPandas subtree runs once, not per join (the pipeline
    # runner gets the same effect from its checkpoint)
    mm = mm.persist()
    m2 = apply_merge_map(all_mentions, mm, ["entity_name"])
    t2 = apply_merge_map(all_triples, mm, ["subj", "obj"])
    t2 = t2.select(
        F.least("subj", "obj").alias("subj"),
        F.greatest("subj", "obj").alias("obj"),
        "description", "weight", "source_id", "order",
    )
    nodes = canon.build_nodes(m2)
    edges = canon.build_edges(t2)
    return canon.add_stub_nodes(nodes, edges), edges
