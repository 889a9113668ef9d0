"""S2 — direct-PDF ingestion source (stdlib re + zlib subset reader).

The reference reads PDFs with PyMuPDF: page text via ``page.get_text``,
images via ``page.get_images``/``extract_image``, image context = ±100
chars of neighboring text (/root/reference/mmgraphrag/pdf_preprocessing.py:
206-262,313-399). PyMuPDF is a native lib not present here, so this module
implements the well-formed subset directly on the COS object syntax:

* objects are located by scanning ``N 0 obj ... endobj`` (no xref chasing —
  linear scan covers well-formed files and survives mild xref damage);
* streams are cut between ``stream``/``endstream``; ``/FlateDecode``
  inflates with zlib;
* text comes from content-stream show operators: ``(..) Tj``, ``(..) '``,
  ``[(..) .. (..)] TJ`` inside BT/ET blocks, with PDF string escapes
  (octal, \\n, \\(, ...) decoded — i.e. simple Latin-text PDFs (the kind
  the fixture writer below emits). CID/Type0-encoded text (most wild
  academic PDFs) needs font cmap decoding — that is the documented
  PyMuPDF swap point, NOT a silent wrong answer: undecodable show strings
  are dropped;
* image XObjects (``/Subtype /Image``) are collected in object order and
  matched to ``Do`` draw operators sequentially; raw ``/DCTDecode`` stream
  bytes ARE the jpeg.

Spans mapping: each BT/ET text block -> one ``kind='text'`` span; each
drawn image -> ``kind='image'`` span with ``media_ref=<doc_id>/image_<n>``
and the reference's ±context_length-char before/after context as text.

Scale shape: identical to docx.py — binaryFile scan, per-document parse in
an Arrow batch, bytes never on the driver.
"""

from __future__ import annotations

import io
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from .docx import MEDIA_SCHEMA, SPAN_SCHEMA, _context

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
# (..) Tj   (..) '   [ .. ] TJ
_SHOW_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')|\[((?:[^\]\\]|\\.)*)\]\s*TJ", re.S)
# inside a TJ array: literal strings interleaved with kerning numbers
_ARRAY_TOK_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)|(-?\d+(?:\.\d+)?)", re.S)
_ARRAY_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)", re.S)
# a TJ kern adjustment at or beyond this magnitude (thousandths of an em,
# applied negatively) renders as an inter-word gap — the standard heuristic
# for PDFs that kern word spaces instead of emitting space glyphs
TJ_SPACE_KERN = 120
_ESC_RE = re.compile(rb"\\(\d{1,3}|.)", re.S)
_DO_RE = re.compile(rb"/\w+\s+Do")

_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(s: bytes) -> bytes:
    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        if g.isdigit():
            return bytes([int(g, 8) & 0xFF])
        return _ESC.get(g, g)

    return _ESC_RE.sub(sub, s)


_LEN_RE = re.compile(rb"/Length\s+(\d+)(?!\s+0\s+R)")
_STREAM_START_RE = re.compile(rb"stream\r?\n")


def _stream_data(body: bytes) -> bytes | None:
    sm = _STREAM_START_RE.search(body)
    if not sm:
        return None
    data = None
    lm = _LEN_RE.search(body[: sm.start()])
    if lm:
        # /Length is authoritative: binary stream data may itself contain
        # \r\nendstream-looking byte runs (or END in \r, which the regex
        # fallback's \r?\n would wrongly eat as a line ending)
        cand = body[sm.end(): sm.end() + int(lm.group(1))]
        if b"endstream" in body[sm.end() + len(cand): sm.end() + len(cand) + 11]:
            data = cand
    if data is None:
        # no usable /Length (indirect N 0 R, or inconsistent): delimiter scan
        m = _STREAM_RE.search(body)
        if not m:
            return None
        data = m.group(1)
    if b"/FlateDecode" in body[: sm.start()]:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data


def parse_pdf(doc_id: str, blob: bytes, context_length: int = 100):
    """One document -> (span rows, media rows); pure function."""
    images = []       # (media_ref, jpeg bytes) in object order
    pieces = []       # ('text', decoded) | ('image',) placeholders in order
    img_objs = []
    content_streams = []
    for m in _OBJ_RE.finditer(blob):
        body = m.group(2)
        data = _stream_data(body)
        if data is None:
            continue
        if b"/Subtype" in body and b"/Image" in body:
            img_objs.append(data)
        elif _BT_RE.search(data) or _DO_RE.search(data):
            content_streams.append(data)

    draw_n = 0
    for cs in content_streams:
        # walk the stream once, emitting text blocks and draws in order
        events = []
        for bt in _BT_RE.finditer(cs):
            events.append((bt.start(), "bt", bt.group(1)))
        for do in _DO_RE.finditer(cs):
            # Do inside a BT/ET block is not legal PDF; treat all as draws
            events.append((do.start(), "do", None))
        for _, kind, payload in sorted(events, key=lambda e: e[0]):
            if kind == "bt":
                parts = []
                for sm in _SHOW_RE.finditer(payload):
                    if sm.group(1) is not None:
                        parts.append(_unescape(sm.group(1)))
                    else:
                        for x in _ARRAY_TOK_RE.finditer(sm.group(2)):
                            if x.group(1) is not None:
                                parts.append(_unescape(x.group(1)))
                            elif float(x.group(2)) <= -TJ_SPACE_KERN:
                                parts.append(b" ")
                text = b"".join(parts).decode("latin-1").strip()
                if text:
                    pieces.append(("text", text))
            else:
                if draw_n < len(img_objs):
                    pieces.append(("image", draw_n))
                    draw_n += 1
    # image objects never drawn still exist in the file (reference's
    # get_images(full=True) reports them too): append at the end
    for k in range(draw_n, len(img_objs)):
        pieces.append(("image", k))

    texts = [p[1] if p[0] == "text" else "" for p in pieces]
    spans, media = [], []
    img_n = 0
    for i, p in enumerate(pieces):
        if p[0] == "text":
            spans.append((doc_id, "text", p[1], "", i))
        else:
            img_n += 1
            ref = f"{doc_id}/image_{img_n}"
            spans.append((doc_id, "image", _context(texts, i, context_length), ref, i))
            media.append((doc_id, ref, f"image_{img_n}.jpg", img_objs[p[1]]))
    return spans, media


def _doc_id_from_path(path: str) -> str:
    return re.sub(r"\.pdf$", "", path.rsplit("/", 1)[-1])


def pdf_spans(spark: SparkSession, path: str, context_length: int = 100) -> DataFrame:
    """Distributed spans source over a directory/glob of .pdf files."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["doc_id", "kind", "text", "media_ref", "offset"]
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    parse_pdf(_doc_id_from_path(p), bytes(blob), context_length)[0]
                )
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(run, schema=SPAN_SCHEMA)
    )


def pdf_media(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, media_ref, filename, content): embedded image bytes."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["doc_id", "media_ref", "filename", "content"]
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_pdf(_doc_id_from_path(p), bytes(blob))[1])
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(run, schema=MEDIA_SCHEMA)
    )


def pdf_bytes(pages: list) -> bytes:
    """Minimal PDF serializer. ``pages`` is a list of pages; each page is a
    list of str (text line) or ("image", jpeg_bytes) items. Content streams
    are Flate-compressed; images are /DCTDecode XObjects — exercising
    exactly the subset the reader supports. Emits a correct xref table, so
    standard viewers open the file too."""
    objs: dict[int, bytes] = {}
    img_count = 0
    page_obj_ids = []
    next_id = 3  # 1=catalog, 2=pages
    font_id = next_id
    objs[font_id] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    next_id += 1

    for page in pages:
        parts, xobjects = [], []
        y = 720
        for item in page:
            if isinstance(item, tuple) and item[0] == "image":
                img_count += 1
                img_id = next_id
                next_id += 1
                jpeg = item[1]
                objs[img_id] = (
                    b"<< /Type /XObject /Subtype /Image /Width 8 /Height 8"
                    b" /ColorSpace /DeviceRGB /BitsPerComponent 8"
                    b" /Filter /DCTDecode /Length " + str(len(jpeg)).encode()
                    + b" >>\nstream\n" + jpeg + b"\nendstream"
                )
                name = f"Im{img_count}".encode()
                xobjects.append((name, img_id))
                parts.append(b"q 100 0 0 100 72 " + str(y - 100).encode()
                             + b" cm /" + name + b" Do Q")
                y -= 110
            else:
                esc = (
                    item.encode("latin-1")
                    .replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
                )
                parts.append(b"BT /F1 12 Tf 72 " + str(y).encode()
                             + b" Td (" + esc + b") Tj ET")
                y -= 16
        content = zlib.compress(b"\n".join(parts))
        cs_id = next_id
        next_id += 1
        objs[cs_id] = (
            b"<< /Filter /FlateDecode /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream"
        )
        xo = b" ".join(b"/" + n + b" " + str(i).encode() + b" 0 R" for n, i in xobjects)
        page_id = next_id
        next_id += 1
        objs[page_id] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 " + str(font_id).encode() + b" 0 R >>"
            + (b" /XObject << " + xo + b" >>" if xobjects else b"")
            + b" >> /Contents " + str(cs_id).encode() + b" 0 R >>"
        )
        page_obj_ids.append(page_id)

    kids = b" ".join(str(i).encode() + b" 0 R" for i in page_obj_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_obj_ids)).encode() + b" >>"
    )

    buf = io.BytesIO()
    buf.write(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for oid in sorted(objs):
        offsets[oid] = buf.tell()
        buf.write(str(oid).encode() + b" 0 obj\n" + objs[oid] + b"\nendobj\n")
    xref_at = buf.tell()
    n = max(objs) + 1
    buf.write(b"xref\n0 " + str(n).encode() + b"\n")
    buf.write(b"0000000000 65535 f \n")
    for oid in range(1, n):
        buf.write(("%010d 00000 n \n" % offsets[oid]).encode())
    buf.write(
        b"trailer\n<< /Size " + str(n).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return buf.getvalue()


def write_pdf(pages: list, path: str) -> None:
    """Fixture helper: serialize to a file (see pdf_bytes)."""
    with open(path, "wb") as f:
        f.write(pdf_bytes(pages))


def spans_to_pdf(spans: DataFrame) -> DataFrame:
    """Inverse source: spans relation -> (doc_id, content) .pdf blobs.

    One single-page PDF per document: text spans become Tj lines, image
    spans become /DCTDecode XObjects drawn in order (the span caption is
    NOT serialized — a real PDF carries no caption stream, so the parser
    re-derives image context from the neighboring text). Blob bytes are
    built executor-side inside the applyInPandas group."""
    import pandas as pd

    def build(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("offset")
        items = [
            ("image", ref.encode()) if kind == "image" else text
            for kind, text, ref in zip(
                group["kind"], group["text"], group["media_ref"]
            )
        ]
        return pd.DataFrame(
            {"doc_id": [group["doc_id"].iloc[0]],
             "content": [pdf_bytes([items])]}
        )

    return spans.groupBy("doc_id").applyInPandas(
        build, schema="doc_id string, content binary"
    )


def pdf_spans_from_blobs(
    blobs: DataFrame, context_length: int = 100
) -> DataFrame:
    """Parse (doc_id, content) .pdf blobs -> spans (distributed)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["doc_id", "kind", "text", "media_ref", "offset"]
        for pdf_ in batches:
            rows = []
            for d, blob in zip(pdf_["doc_id"], pdf_["content"]):
                rows.extend(parse_pdf(d, bytes(blob), context_length)[0])
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(run, schema=SPAN_SCHEMA)
