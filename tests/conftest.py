from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mmgraphrag_spark.session import get_spark  # noqa: E402

SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s


def make_docs(spark, rows):
    """rows: list of (doc_id, [(kind, text, media_ref, offset), ...])."""
    data = [
        (doc_id, [{"kind": k, "text": t, "media_ref": m, "offset": o}
                  for (k, t, m, o) in spans])
        for doc_id, spans in rows
    ]
    return spark.createDataFrame(
        data,
        schema="doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>",
    )
