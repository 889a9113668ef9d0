"""Media path: detector stub plumbing (UDF == column op), containment edges."""

from __future__ import annotations

from conftest import SF_TINY

from mmgraphrag_spark import synth
from mmgraphrag_spark.operators import media


def _media(spark):
    return media.media_spans(synth.flat_spans(spark, SF_TINY))


def test_detector_udf_matches_column_op(spark):
    m = _media(spark)
    a = (
        media.detect_objects(m).toPandas()
        .sort_values(["media_ref", "label", "pos"]).reset_index(drop=True)
    )
    b = (
        media.detect_objects_udf(m).toPandas()
        .sort_values(["media_ref", "label", "pos"]).reset_index(drop=True)
    )
    assert a[["doc_id", "media_ref", "label", "pos"]].equals(
        b[["doc_id", "media_ref", "label", "pos"]]
    )


def test_containment_edges_weight_10(spark):
    m = _media(spark)
    trips = media.image_triples(m).collect()
    assert len(trips) > 0
    for t in trips:
        assert t.weight == 10.0  # reference img2graph.py:472,478
        # one endpoint is the ORI_IMG node (upper media_ref)
        assert t.subj == t.source_id.upper() or t.obj == t.source_id.upper()


def test_ori_img_node_per_media_span(spark):
    m = _media(spark)
    n_media = m.count()
    ori = media.ori_img_mentions(m)
    assert ori.count() == n_media
    assert all(r.entity_type == "ORI_IMG" for r in ori.collect())
