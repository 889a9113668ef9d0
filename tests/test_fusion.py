"""M2–M7 fusion: embeddings, DBSCAN, block determinism, merge semantics."""

from __future__ import annotations

import math

import numpy as np
from conftest import SF_TINY, make_docs

from mmgraphrag_spark import api, synth
from mmgraphrag_spark.config import DEFAULT
from mmgraphrag_spark.operators import fusion, media
from mmgraphrag_spark.operators.embedding import with_embedding


def test_hash_embedding_separates_vocab(spark):
    """Distinct surface forms must fall below merge_cos; equal forms hit 1.0.
    This is the property the fused-graph oracle reduction rests on."""
    toks = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .selectExpr("explode(split(text, ' ')) AS tok").distinct()
    )
    emb = with_embedding(toks, "tok").toPandas()
    E = np.vstack(emb["embedding"].to_numpy())
    S = E @ E.T
    np.fill_diagonal(S, 0.0)
    assert S.max() < DEFAULT.merge_cos
    assert np.allclose((E * E).sum(1), 1.0, atol=1e-9)


def test_dbscan_two_groups_and_noise():
    X = np.array([[0.0, 0], [0.01, 0], [0.02, 0],
                  [5.0, 5], [5.01, 5], [5.02, 5],
                  [100.0, 100]])
    labels = fusion._dbscan(X, eps=0.5, min_samples=2)
    assert labels[0] == labels[1] == labels[2] != -1
    assert labels[3] == labels[4] == labels[5] != -1
    assert labels[0] != labels[3]
    assert labels[6] == -1


def test_merge_map_semantics_crafted(spark):
    # doc with one media span; caption word 'alpha' also appears nearby in text
    words = ("alpha batch " * 30).strip()  # 60 words, qualifying tok: alpha/batch
    docs = make_docs(spark, [
        ("doc0", [("text", words, "", 0), ("image", "alpha pict", "doc0/image_1", 1)]),
    ])
    flat = synth.explode_spans(docs)
    med = media.media_spans(flat)
    mm = fusion.merge_map(flat, med, media.image_mentions(med)).collect()
    got = {(r.old_name, r.new_name) for r in mm}
    # 'ALPHA@DOC0/IMAGE_1' merges into nearby text entity 'ALPHA';
    # 'PICT' is len-4 -> an IMG object, excluded from fusion (P7)
    assert got == {("ALPHA@DOC0/IMAGE_1", "ALPHA")}


def test_fusion_blocks_deterministic_across_parallelism(spark):
    flat = synth.flat_spans(spark, SF_TINY)
    med = media.media_spans(flat)
    img = media.image_mentions(med)
    a = (
        fusion.fusion_blocks(flat.repartition(2), med, img).toPandas()
        .sort_values(["media_ref", "kind", "entity_name"]).reset_index(drop=True)
    )
    b = (
        fusion.fusion_blocks(flat.repartition(13), med, img).toPandas()
        .sort_values(["media_ref", "kind", "entity_name"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_cluster_k_rule(spark):
    """Spectral k = max(2, ceil(sqrt(n))) — labels bounded by cluster count."""
    blocks = api.clusters(spark, SF_TINY).toPandas()
    assert len(blocks) > 0
    for _, g in blocks.groupby("media_ref"):
        n = len(g)
        assert g["label"].max() < n
        assert (g["label"] >= -1).all()


def test_fused_graph_drops_merged_scene_names(spark):
    mm = api.merge_map(spark, SF_TINY).toPandas()
    fused = api.fused_nodes(spark, SF_TINY).toPandas()
    merged_away = set(mm["old_name"])
    assert merged_away
    assert not (set(fused["entity_name"]) & merged_away)
    # every canonical target still exists
    assert set(mm["new_name"]) <= set(fused["entity_name"])


def test_fused_edges_rewired_weights_conserved(spark):
    pre = api.edges(spark, SF_TINY).toPandas()
    post = api.fused_edges(spark, SF_TINY).toPandas()
    assert math.isclose(pre["weight"].sum(), post["weight"].sum())
    assert len(post) <= len(pre)
