"""Loader for the reference's response-template DATA (not engine code).

The four response templates are the reference's user-facing output contract
for the local-query answer chain (``local_rag_response_augmented``,
``local_rag_response_multimodal``, ``local_rag_response_multimodal_merge``,
``local_rag_response_merge`` at /root/reference/mmgraphrag/prompt.py:426-580).
They must stay byte-identical to what a reference user's LLM receives, so the
strings live verbatim in the sibling ``prompt_templates.json`` resource —
clearly marked configuration data, like the CSV context layout in
query_ctx.py — and this module only loads them. The assembly logic lives in
operators/answer.py and is original.

``DEFAULT_RESPONSE_TYPE`` mirrors QueryParam.response_type
(/root/reference/mmgraphrag/base.py) and ``NUM_MM_ENTITIES`` mirrors
QueryParam.number_of_mmentities.
"""

import json
import os

_here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_here, "prompt_templates.json"), encoding="utf-8") as _f:
    _DATA = json.load(_f)

DEFAULT_RESPONSE_TYPE = _DATA["default_response_type"]
NUM_MM_ENTITIES = _DATA["num_mm_entities"]
FAIL_RESPONSE = _DATA["fail_response"]

_T = _DATA["templates"]
LOCAL_RAG_RESPONSE_AUGMENTED = _T["local_rag_response_augmented"]
LOCAL_RAG_RESPONSE_MULTIMODAL = _T["local_rag_response_multimodal"]
LOCAL_RAG_RESPONSE_MULTIMODAL_MERGE = _T["local_rag_response_multimodal_merge"]
LOCAL_RAG_RESPONSE_MERGE = _T["local_rag_response_merge"]
