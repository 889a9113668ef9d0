"""Document ingestion sources (S1-S3): real-format readers that land every
format on the ONE interleaved-spans relation (doc_id, kind, text, media_ref,
offset) the whole engine consumes.

* mineru — MinerU ``*_content_list.json`` (pure JSON, fully distributed)
* docx   — real .docx via stdlib zipfile + ElementTree (no python-docx)
* pdf    — direct PDF subset reader via stdlib re + zlib (no PyMuPDF)
"""
