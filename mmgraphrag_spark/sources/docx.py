"""S1 — real .docx ingestion source (stdlib zipfile + ElementTree).

The reference reads DOCX with python-docx: paragraph texts build the full
document text, paragraphs containing an ``a:blip`` drawing mark an image
whose before/after context is the surrounding ±``context_length`` characters
(/root/reference/mmgraphrag/preprocessing.py:207-262,298-374; images are
pulled from the package relationships in document order, :329-349).

This reader parses the OOXML package directly — a .docx is a zip whose
``word/document.xml`` holds paragraphs (``w:p`` / runs ``w:r`` / text
``w:t``) and whose ``word/_rels/document.xml.rels`` maps ``r:embed`` ids to
``word/media/*`` parts — so no python-docx dependency is needed and the
parse runs INSIDE an Arrow batch on executors.

Spans mapping (the engine's one input relation):
* every paragraph with text -> one ``kind='text'`` span;
* every ``a:blip`` (in paragraph order) -> one ``kind='image'`` span,
  ``media_ref = <doc_id>/image_<n>`` (sequential, matching the reference's
  ``image_{count}.jpg`` rename), span text = the reference's before/after
  context characters (extract_image_context semantics: last/first
  ``context_length`` chars of the neighboring paragraphs);
* ``offset`` = emission order (text span of a paragraph precedes its images).

Scale shape: ``binaryFile`` scan (one row per document — 10^12 docs = 10^12
rows, partitioned by file), parse via ``mapInPandas`` (opaque-binary decode
is the one legitimately-Python step; it is Arrow-batched and per-document,
never per-span). Media BYTES never visit the driver: ``docx_media`` emits
them as a binary column straight from the executor-side parse.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
RELS_NS = "http://schemas.openxmlformats.org/package/2006/relationships"

SPAN_SCHEMA = "doc_id string, kind string, text string, media_ref string, offset int"
MEDIA_SCHEMA = "doc_id string, media_ref string, filename string, content binary"


def _paragraphs(document_xml: bytes) -> list[tuple[str, list[str]]]:
    """[(paragraph_text, [embed_rel_id, ...])] in document order.

    Runs concatenate in-order; explicit ``w:tab`` / ``w:br`` /
    ``w:noBreakHyphen`` elements render as the separator a text reader
    sees (python-docx's paragraph.text does the same for tabs/breaks)."""
    sep = {f"{{{W_NS}}}tab": "\t", f"{{{W_NS}}}br": "\n",
           f"{{{W_NS}}}noBreakHyphen": "-"}
    root = ET.fromstring(document_xml)
    out = []
    for p in root.iter(f"{{{W_NS}}}p"):
        parts = []
        for el in p.iter():
            if el.tag == f"{{{W_NS}}}t":
                parts.append(el.text or "")
            elif el.tag in sep:
                parts.append(sep[el.tag])
        text = "".join(parts)
        embeds = [
            b.get(f"{{{R_NS}}}embed")
            for b in p.iter(f"{{{A_NS}}}blip")
            if b.get(f"{{{R_NS}}}embed")
        ]
        out.append((text, embeds))
    return out


def _rels(rels_xml: bytes) -> dict[str, str]:
    root = ET.fromstring(rels_xml)
    return {
        r.get("Id"): r.get("Target")
        for r in root.iter(f"{{{RELS_NS}}}Relationship")
    }


def _context(paras: list[str], i: int, n: int) -> str:
    """Reference extract_image_context: walk backward/forward accumulating
    up to n CHARACTERS from neighboring paragraphs (preprocessing.py:215-236)."""
    before = ""
    j = i - 1
    while j >= 0 and len(before) < n:
        before = paras[j][-(n - len(before)):] + before
        j -= 1
    after = ""
    j = i + 1
    while j < len(paras) and len(after) < n:
        after = after + paras[j][: n - len(after)]
        j += 1
    return f"{before.strip()} {after.strip()}".strip()


def parse_docx(doc_id: str, blob: bytes, context_length: int = 100):
    """One document -> (span rows, media rows). Pure function (unit-testable
    without Spark); the Spark sources below wrap it in mapInPandas."""
    zf = zipfile.ZipFile(io.BytesIO(blob))
    paras = _paragraphs(zf.read("word/document.xml"))
    try:
        rels = _rels(zf.read("word/_rels/document.xml.rels"))
    except KeyError:
        rels = {}
    texts = [t for t, _ in paras]
    spans, media = [], []
    offset, img_n = 0, 0
    for i, (text, embeds) in enumerate(paras):
        if text.strip():
            spans.append((doc_id, "text", text, "", offset))
            offset += 1
        for embed in embeds:
            img_n += 1
            ref = f"{doc_id}/image_{img_n}"
            spans.append(
                (doc_id, "image", _context(texts, i, context_length), ref, offset)
            )
            offset += 1
            target = rels.get(embed)
            if target:
                name = target if target.startswith("word/") else f"word/{target}"
                try:
                    media.append((doc_id, ref, target.rsplit("/", 1)[-1], zf.read(name)))
                except KeyError:
                    pass
    return spans, media


def _doc_id_from_path(path: str) -> str:
    return re.sub(r"\.docx$", "", path.rsplit("/", 1)[-1])


def docx_spans(
    spark: SparkSession, path: str, context_length: int = 100
) -> DataFrame:
    """Distributed spans source over a directory/glob of .docx files."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["doc_id", "kind", "text", "media_ref", "offset"]
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    parse_docx(_doc_id_from_path(p), bytes(blob), context_length)[0]
                )
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(run, schema=SPAN_SCHEMA)
    )


def docx_media(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, media_ref, filename, content): embedded media bytes,
    executor-side end to end (feeds operators/multimodal.py)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["doc_id", "media_ref", "filename", "content"]
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_docx(_doc_id_from_path(p), bytes(blob))[1])
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(run, schema=MEDIA_SCHEMA)
    )


def docx_bytes(paragraphs: list) -> bytes:
    """Minimal OOXML serializer: ``paragraphs`` is a list of either str
    (text paragraph) or ("image", jpeg_bytes) tuples. Emits a valid-enough
    package for this reader and for python-docx. Text is XML-escaped, so
    serialize ∘ parse is the identity on paragraph text."""
    from xml.sax.saxutils import escape

    media, rel_entries, body = [], [], []
    for item in paragraphs:
        if isinstance(item, tuple) and item[0] == "image":
            n = len(media) + 1
            rid = f"rIdImg{n}"
            media.append((f"media/image{n}.jpeg", item[1]))
            rel_entries.append(
                f'<Relationship Id="{rid}" Type="http://schemas.openxmlformats.org'
                f'/officeDocument/2006/relationships/image" Target="media/image{n}.jpeg"/>'
            )
            body.append(
                f'<w:p><w:r><w:drawing><a:blip r:embed="{rid}"/></w:drawing></w:r></w:p>'
            )
        else:
            body.append(f"<w:p><w:r><w:t>{escape(item)}</w:t></w:r></w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}" xmlns:a="{A_NS}" xmlns:r="{R_NS}">'
        f"<w:body>{''.join(body)}</w:body></w:document>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{RELS_NS}">{"".join(rel_entries)}</Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="jpeg" ContentType="image/jpeg"/>'
        '<Override PartName="/word/document.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("word/document.xml", document)
        zf.writestr("word/_rels/document.xml.rels", rels)
        for name, blob in media:
            zf.writestr(f"word/{name}", blob)
    return buf.getvalue()


def write_docx(paragraphs: list, path: str) -> None:
    """Fixture helper: serialize to a file (see docx_bytes)."""
    with open(path, "wb") as f:
        f.write(docx_bytes(paragraphs))


def _span_items(group: "pd.DataFrame") -> list:  # noqa: F821
    """Ordered span rows -> serializer paragraph items. Text spans become
    text paragraphs; image spans become drawing-only paragraphs (the span's
    caption is NOT serialized — a real .docx carries no caption column, so
    the parser re-derives image context from the neighboring paragraphs)."""
    items = []
    for kind, text, ref in zip(group["kind"], group["text"], group["media_ref"]):
        if kind == "image":
            items.append(("image", ref.encode()))
        else:
            items.append(text)
    return items


def spans_to_docx(spans: DataFrame) -> DataFrame:
    """Inverse source: spans relation -> (doc_id, content) .docx blobs.

    One applyInPandas group per document (the same doc_id partitioning every
    downstream stage reuses); blob bytes are built executor-side and never
    visit the driver. With ``docx_spans_from_blobs`` this forms the
    serialize ∘ parse round trip the driver oracle checks end-to-end."""
    import pandas as pd

    def build(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("offset")
        return pd.DataFrame(
            {"doc_id": [group["doc_id"].iloc[0]],
             "content": [docx_bytes(_span_items(group))]}
        )

    return spans.groupBy("doc_id").applyInPandas(
        build, schema="doc_id string, content binary"
    )


def docx_spans_from_blobs(
    blobs: DataFrame, context_length: int = 100
) -> DataFrame:
    """Parse (doc_id, content) .docx blobs -> spans (distributed)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["doc_id", "kind", "text", "media_ref", "offset"]
        for pdf in batches:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["content"]):
                rows.extend(parse_docx(d, bytes(blob), context_length)[0])
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(run, schema=SPAN_SCHEMA)
