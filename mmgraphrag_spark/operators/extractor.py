"""E1–E5 — mention detection + (subj, pred, obj) triple extraction.

Two halves, mirroring the reference split between "ask the model" and "parse
the answer" (/root/reference/mmgraphrag/text2graph.py:274-457):

1. **Emitter (E1)** — a pluggable ``mapInPandas`` extractor that turns chunk
   content into the reference's record grammar::

       ("entity"<|>"NAME"<|>"TYPE"<|>"description")##
       ("relationship"<|>"SRC"<|>"TGT"<|>"description"<|>weight)##<|COMPLETE|>

   (delimiters: /root/reference/mmgraphrag/prompt.py:189-192). In production
   this is a batched LLM-endpoint client; here it is a **deterministic mock**
   (the reference itself ships replayable runs via its LLM response cache,
   example_output/kv_store_multimodel_llm_response_cache.json): a token is an
   entity mention iff len >= mention_min_len; entity type derives from token
   length and parity of position; a relationship joins each consecutive pair
   of mentions. All pandas ops are column-vectorized (no Python row loop).

2. **Parser (E2–E5)** — pure column expressions: split on ``##`` /
   ``<|COMPLETE|>`` (base.py:58-63), ``regexp_extract('\\((.*)\\)')`` +
   split on ``<|>`` (text2graph.py:378-387), arity + tag filters (P2,
   text2graph.py:54,118), quote-strip + upper-case (P4, text2graph.py:57),
   float-regex weight parse with 1.0 fallback (P5, base.py:118-119,
   text2graph.py:125-127). Entirely JVM-side / whole-stage codegen.

Scale notes: the emitter is the only Python on this path and is Arrow-batched;
the parser explodes records (bounded fan-out per chunk) and never shuffles.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT, PipelineConfig

EXTRACTION_SCHEMA = "doc_id string, chunk_id string, output string"

FLOAT_RE = r"^[-+]?[0-9]*\.?[0-9]+$"  # reference is_float_regex, base.py:118-119


def mock_extract_batch(pdf, cfg: PipelineConfig = DEFAULT):
    """Deterministic extraction for one Arrow batch of chunks.

    Grammar-compatible stand-in for the reference's LLM call; shared by the
    Spark emitter and the pytest oracle. Implemented as a straight token
    loop per chunk: at the ~tens-of-tokens-per-chunk grain the former
    explode → 3×groupby → merge pandas pipeline spent its time in pandas
    machinery, not in work (measured ~2× the extract stage's task time);
    a list-append loop over the same tokens is both simpler and faster.
    The emitted record stream is byte-identical (same dedup-keep-first,
    same consecutive-pair rule, same record order).
    """
    import pandas as pd

    min_len, concept_len = cfg.mention_min_len, cfg.concept_min_len
    outs: list[str] = []
    for chunk_id, content in zip(pdf.get("chunk_id", ()), pdf.get("content", ())):
        ent_recs: list[str] = []
        rel_recs: list[str] = []
        seen: set[tuple[str, str, str]] = set()
        prev_name = None
        for pos, tok in enumerate(content.split(" ")):
            if len(tok) < min_len:
                continue
            etype = (
                "CONCEPT" if len(tok) >= concept_len
                else ("TERM" if pos % 2 == 0 else "LABEL")
            )
            name = tok.upper()
            # dedup on (name, etype, tok) like the former drop_duplicates:
            # two case-variant tokens share a name but keep both records
            key = (name, etype, tok)
            if key not in seen:
                seen.add(key)
                ent_recs.append(
                    f'("entity"<|>"{name}"<|>"{etype}"<|>"{tok} in {chunk_id}")'
                )
            if prev_name is not None and name != prev_name:
                rel_recs.append(
                    f'("relationship"<|>"{prev_name}"<|>"{name}"'
                    f'<|>"co-occurs"<|>1.0)'
                )
            prev_name = name
        if not ent_recs:
            outs.append("<|COMPLETE|>")
        else:
            body = "##".join(ent_recs)
            if rel_recs:
                body += "##" + "##".join(rel_recs)
            outs.append(body + "##<|COMPLETE|>")
    return pd.DataFrame({
        "doc_id": pdf["doc_id"], "chunk_id": pdf["chunk_id"], "output": outs,
    })


GLEAN_FLOOR = 3  # shortest token length any gleaning round may recover


def mock_glean_batch(pdf, round_idx: int, cfg: PipelineConfig = DEFAULT):
    """Deterministic gleaning pass: round r recovers 'missed' mentions —
    tokens of length exactly mention_min_len-1-r — as extra entity records
    tagged '(gleaned)'. Each deeper round digs up strictly shorter tokens
    the earlier rounds missed (mirroring the reference's bounded
    continue-prompt re-ask, text2graph.py:344-361, where every round may
    add entities until the yes/no probe says stop); the mock converges when
    the target length would drop below GLEAN_FLOOR. Emits the same record
    grammar so parsing is round-agnostic."""
    import numpy as np
    import pandas as pd

    target = cfg.mention_min_len - 1 - round_idx
    if len(pdf) == 0 or target < GLEAN_FLOOR:  # converged
        return pd.DataFrame({"doc_id": [], "chunk_id": [], "output": []})
    t = pdf[["doc_id", "chunk_id"]].copy()
    t["tok"] = pdf["content"].str.split(" ")
    t = t.explode("tok", ignore_index=True)
    t["pos"] = t.groupby("chunk_id").cumcount()
    t = t[t["tok"].str.len() == target].copy()
    if len(t) == 0:
        return pd.DataFrame({"doc_id": [], "chunk_id": [], "output": []})
    t["etype"] = np.where(t["pos"] % 2 == 0, "TERM", "LABEL")
    rec = (
        '("entity"<|>"' + t["tok"].str.upper() + '"<|>"' + t["etype"] + '"<|>"'
        + t["tok"] + " in " + t["chunk_id"] + ' (gleaned)")'
    )
    out = rec.groupby([t["doc_id"], t["chunk_id"]]).agg("##".join).reset_index(name="output")
    return out[["doc_id", "chunk_id", "output"]]


def extract_raw(
    chunks: DataFrame,
    extractor: Callable | None = None,
    cfg: PipelineConfig = DEFAULT,
    glean: Callable | None = None,
) -> DataFrame:
    """E1: chunks -> (doc_id, chunk_id, output grammar string).

    ``extractor(pdf) -> pdf`` is the pluggable batch extractor (production:
    LLM client with cache-table left-join J10; default: deterministic mock).
    When ``cfg.gleaning_rounds > 0``, the bounded gleaning loop
    (text2graph.py:344-361) runs INSIDE the same Arrow batch: each round's
    ``glean(pdf, round)`` records append to the chunk's record stream with
    the '##' record delimiter — one UDF stage regardless of round count.
    """
    import pandas as pd

    fn = extractor or (lambda pdf: mock_extract_batch(pdf, cfg))
    gfn = glean or (lambda pdf, r: mock_glean_batch(pdf, r, cfg))
    rounds = cfg.gleaning_rounds

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf)
            for r in range(rounds):
                extra = gfn(pdf, r)
                if len(extra) == 0:
                    break
                out = out.merge(
                    extra.rename(columns={"output": "extra"}),
                    on=["doc_id", "chunk_id"], how="left",
                )
                has = out["extra"].notna()
                out.loc[has, "output"] = out.loc[has, "output"] + "##" + out.loc[has, "extra"]
                out = out.drop(columns=["extra"])
            yield out[["doc_id", "chunk_id", "output"]]

    return chunks.select("doc_id", "chunk_id", "content").mapInPandas(
        run, schema=EXTRACTION_SCHEMA
    )


def extract_raw_with_cache(
    chunks: DataFrame,
    cache: DataFrame,
    extractor: Callable | None = None,
    cfg: PipelineConfig = DEFAULT,
) -> tuple[DataFrame, DataFrame]:
    """J10 — response-cache join (reference llm.py:34-49, content-addressed
    there by md5(model+messages), here by chunk_id = md5(chunk content), C2).

    Only cache MISSES reach the extractor (the expensive Python/LLM stage);
    hits are served from the cache table. Returns ``(all_raw, new_raw)`` —
    union of hits + fresh extractions, and the fresh rows alone (append these
    to the cache table to make the next run incremental).

    Scale shape: two equi-joins on chunk_id (one semi for hits, one anti for
    misses). In streaming, the per-batch side is small → AQE broadcasts it
    against the big cache scan; in batch backfill both sides hash-partition
    on chunk_id.
    """
    c = chunks.select("doc_id", "chunk_id", "content")
    cache_kv = cache.select("chunk_id", "output")
    hits = c.join(cache_kv, "chunk_id").select("doc_id", "chunk_id", "output")
    misses = c.join(cache_kv.select("chunk_id"), "chunk_id", "left_anti")
    new = extract_raw(misses, extractor, cfg)
    return hits.unionByName(new), new


def _fstrip(col):
    """Strip one leading/trailing quote (with adjacent outer whitespace) from
    a single field — the per-field equivalent of the old whole-record
    ``(^|(?<=<\\|>))\\s*"|"\\s*($|(?=<\\|>))`` replace, applied lazily at the
    field-ACCESS site. Anchored two-branch regex over a short field is ~4x
    cheaper than the lookbehind-alternation pass over every full record
    (measured 8.0 s -> 1.8 s for the parse at 100k docs, local[32]), and
    fields never consumed are never stripped at all."""
    return F.regexp_replace(col, r'^\s*"|"\s*$', "")


def parse_records(raw: DataFrame) -> DataFrame:
    """E2/E3: grammar string -> one row per record, fields pre-stripped AND
    pre-cleaned into NAMED columns ``(nf, f0, c1, c2, c3, flast)``.

    The decoders only ever consume the tag, fields 1-3, and the last field
    (weight), so the record is decomposed once at parse time: per-field
    anchored quote-strips (:func:`_fstrip`) replace the old whole-record
    lookbehind-alternation regexp — measured 8.0 s -> 1.8 s for the parse
    pass at 100k docs/local[32] — and the work happens BEFORE the stage
    cache, so both decode scans read final values. The P1 clean + upper
    transforms live here too: both decoders apply IDENTICAL
    clean_str(upper(f1)) / clean_str(upper(f2)) / clean_str(f3)
    expressions, so hoisting them above the cache halves that work (it
    formerly ran once per decoder over the cached relation):
    ``c1 = clean_str(upper(f1))``, ``c2 = clean_str(upper(f2))``,
    ``c3 = clean_str(f3)``. Unconsumed middle fields of over-arity records
    are dropped (``nf`` preserves the arity for the P2 filters). No
    higher-order-function lambdas anywhere: those evaluate interpreted and
    fall out of whole-stage codegen.
    """
    from ..functions.cleaning import clean_str_col

    recs = raw.select(
        "doc_id", "chunk_id",
        F.explode(F.split("output", r"##|<\|COMPLETE\|>")).alias("rec"),
    ).filter(F.length(F.trim("rec")) > 0)
    inner = F.regexp_extract("rec", r"\((.*)\)", 1)
    fr = recs.select(
        "doc_id", "chunk_id", F.split(inner, r"<\|>", -1).alias("fr")
    )
    return fr.select(
        "doc_id", "chunk_id",
        F.size("fr").alias("nf"),
        _fstrip(F.get("fr", F.lit(0))).alias("f0"),
        clean_str_col(F.upper(_fstrip(F.get("fr", F.lit(1))))).alias("c1"),
        clean_str_col(F.upper(_fstrip(F.get("fr", F.lit(2))))).alias("c2"),
        clean_str_col(_fstrip(F.get("fr", F.lit(3)))).alias("c3"),
        _fstrip(F.element_at("fr", -1)).alias("flast"),
    ).filter((F.col("nf") >= 1) & (F.length("f0") > 0))


def decode_mentions(parsed: DataFrame) -> DataFrame:
    """E4: entity records -> mentions(doc_id, chunk_id, entity_name, entity_type,
    description, source_id). Distinct (the reference's per-name dict collapses
    duplicate records within a chunk)."""
    return (
        parsed.filter((F.col("nf") >= 4) & (F.col("f0") == "entity"))
        .select(
            "doc_id", "chunk_id",
            F.col("c1").alias("entity_name"),
            F.col("c2").alias("entity_type"),
            F.col("c3").alias("description"),
        )
        .filter(F.length("entity_name") > 0)  # P3, text2graph.py:58-59
        .distinct()
        # source_id == chunk_id at this stage; attaching it AFTER the
        # distinct keeps ~25% of the exchange bytes out of the shuffle
        # (the dedup key set is unchanged — source_id was derived)
        .select(
            "doc_id", "chunk_id", "entity_name", "entity_type", "description",
            F.col("chunk_id").alias("source_id"),
        )
    )


def decode_triples(parsed: DataFrame) -> DataFrame:
    """E5: relationship records -> triples with canonical undirected key
    (least/greatest, reference edge-key sort text2graph.py:436-437) and
    float-regex weight fallback (P5)."""
    rels = parsed.filter(
        (F.col("nf") >= 5) & (F.col("f0") == "relationship")
    ).select(
        "doc_id", "chunk_id",
        F.col("c1").alias("a"),
        F.col("c2").alias("b"),
        F.col("c3").alias("description"),
        # weight = LAST field (reference uses record_attributes[-1],
        # text2graph.py:125-127), trimmed (split_string_by_multi_markers
        # strips each field, base.py:58-63)
        F.when(
            F.trim("flast").rlike(FLOAT_RE),
            F.trim("flast").cast("double"),
        ).otherwise(F.lit(1.0)).alias("weight"),
    )
    return (
        rels.filter((F.length("a") > 0) & (F.length("b") > 0) & (F.col("a") != F.col("b")))
        .select(
            "doc_id", "chunk_id",
            F.least("a", "b").alias("subj"),
            F.greatest("a", "b").alias("obj"),
            "description", "weight",
            F.col("chunk_id").alias("source_id"),
            F.lit(1).alias("order"),
        )
    )


def extract_mentions_and_triples(
    chunks: DataFrame,
    extractor: Callable | None = None,
    cfg: PipelineConfig = DEFAULT,
) -> tuple[DataFrame, DataFrame]:
    """The public E1–E5 composite: chunks -> (mentions, triples)."""
    parsed = parse_records(extract_raw(chunks, extractor, cfg))
    return decode_mentions(parsed), decode_triples(parsed)
