"""Span pipeline over the canonical nested table
``documents(doc_id, spans array<struct<kind,text,media_ref,offset>>)``.

North_star contract: text-kind spans flow through the Arrow-batched
tokenizer into frequency maps and syllable-count readability metrics;
media-kind spans are carried through UNTOUCHED; the emitted
per-document span sequence must satisfy exact
``(kind, text, media_ref, order)`` equality against the input.

The pipeline deliberately explodes spans, processes them, and
reassembles the sequence (rather than passing the array column through
opaquely) — that is the shape the 100 TB job has, and the equality
invariant then actually proves order preservation across the shuffle.

Reference analog: per-file analysis loops in
/root/reference/textalyzer/src/lib.rs:35-56 (histogram) — the
reference has no media concept; media passthrough is the north_star
extension for interleaved corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from textalyzer_spark.functions.syllables import syllables_col
from textalyzer_spark.functions.tokenize import tokens_udf


def explode_spans(nested: DataFrame) -> DataFrame:
    """``(doc_id, pos, kind, text, media_ref, offset)`` — one row per
    span, ``pos`` = 0-based position in the original array (the
    ``order`` of the equality invariant)."""
    return nested.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select("doc_id", "pos", "span.kind", "span.text", "span.media_ref", "span.offset")


def process_spans(nested: DataFrame, use_pandas_udf: bool = True) -> DataFrame:
    """Tokenize text spans (Arrow-batched pandas UDF — the mandated
    no-per-row-Python path), pass media spans through untouched.

    Returns ``(doc_id, spans, n_text_spans, n_media_spans, n_tokens,
    n_syllables)`` where ``spans`` is bit-identical to the input
    sequence on (kind, text, media_ref, order).

    ZERO-SHUFFLE plan: the spans column is carried through untouched
    (equality by construction) and all metrics are higher-order
    functions + one Arrow-batched UDF over the row — the whole
    pipeline is narrow, so at 10^12 documents it is a single
    map-stage with no exchange at all. Spans were synthesized at
    whitespace boundaries (corpus.py), so tokenizing the concatenated
    text spans equals tokenizing per-span.

    :func:`process_spans_exploded` is the explode→reassemble variant
    (one shuffle) used by tests to prove order preservation when a
    pipeline does have to shuffle spans.
    """
    text_concat = F.array_join(
        F.transform(
            F.filter("spans", lambda s: s["kind"] == "text"),
            lambda s: s["text"],
        ),
        "",
    )
    kinds = F.transform("spans", lambda s: s["kind"])
    # the Arrow-batched UDF is the default (input_hint mandate); the
    # JVM tokenizer is the all-codegen variant for comparison —
    # identical output on any corpus both Unicode tables agree on
    from textalyzer_spark.functions.tokenize import tokens_col

    tokens = tokens_udf(text_concat) if use_pandas_udf else tokens_col(text_concat)
    toked = nested.select(
        "doc_id",
        "spans",
        F.size(F.filter(kinds, lambda k: k == "text")).alias("n_text_spans"),
        F.size(F.filter(kinds, lambda k: k == "media")).alias("n_media_spans"),
        tokens.alias("tokens"),
    )
    return toked.select(
        "doc_id",
        "spans",
        F.col("n_text_spans").cast("bigint"),
        F.col("n_media_spans").cast("bigint"),
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.aggregate(
            F.transform("tokens", syllables_col), F.lit(0), lambda acc, x: acc + x
        )
        .cast("bigint")
        .alias("n_syllables"),
    )


def process_spans_fused(nested: DataFrame) -> DataFrame:
    """Single-pass mapInPandas variant of :func:`process_spans` (same
    output schema and values).

    Why it exists: the pandas-UDF variant routes every row through
    ArrowEvalPython, which queues the ORIGINAL row (the heavy spans
    array) in a HybridRowQueue while the python result is awaited —
    measured as a hard ~12 s floor on 2M docs that does not improve
    with cores. Fusing tokenize+syllables+passthrough into ONE
    mapInPandas stage streams each Arrow batch through python exactly
    once, no JVM-side row queue, and python does the cheap metric
    arithmetic it already has in hand.
    """
    import pandas as pd

    from textalyzer_spark.functions.syllables import count_syllables
    from textalyzer_spark.functions.tokenize import tokenize_text

    # id type follows the input (string fixtures AND bigint ids, e.g.
    # the html_to_spans corpus) — a hardcoded string schema makes the
    # JVM read an int64 arrow vector as UTF8 and fail
    id_type = dict(nested.dtypes).get("doc_id", "string")
    schema = (
        f"doc_id {id_type}, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, n_text_spans bigint, "
        "n_media_spans bigint, n_tokens bigint, n_syllables bigint"
    )

    def run(batches):
        for pdf in batches:
            n_text, n_media, n_tok, n_syl = [], [], [], []
            for spans in pdf["spans"]:
                texts = [s["text"] for s in spans if s["kind"] == "text"]
                n_text.append(len(texts))
                n_media.append(sum(1 for s in spans if s["kind"] == "media"))
                toks = tokenize_text("".join(texts))
                n_tok.append(len(toks))
                n_syl.append(sum(count_syllables(t) for t in toks))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "spans": pdf["spans"],
                    "n_text_spans": n_text,
                    "n_media_spans": n_media,
                    "n_tokens": n_tok,
                    "n_syllables": n_syl,
                }
            )

    return nested.mapInPandas(run, schema)


def process_spans_arrow(nested: DataFrame) -> DataFrame:
    """mapInArrow variant of :func:`process_spans_fused` (same output
    schema and values).

    The fused pandas variant still pays python dict materialization of
    every span struct in both directions; here the spans column stays
    a pyarrow ListArray end to end (zero-copy passthrough) and python
    touches only the flat kind/text child arrays. This is the fastest
    python-tokenizer variant and the production default candidate.
    """
    import pyarrow as pa

    from textalyzer_spark.functions.syllables import count_syllables
    from textalyzer_spark.functions.tokenize import tokenize_text

    # id type follows the input (see process_spans_fused note)
    id_type = dict(nested.dtypes).get("doc_id", "string")
    schema_str = (
        f"doc_id {id_type}, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, n_text_spans bigint, "
        "n_media_spans bigint, n_tokens bigint, n_syllables bigint"
    )

    def run(batches):
        for b in batches:
            spans = b.column(b.schema.get_field_index("spans"))
            if isinstance(spans, pa.ChunkedArray):
                spans = spans.combine_chunks()
            flat = spans.flatten()
            kinds = flat.field("kind").to_pylist()
            texts = flat.field("text").to_pylist()
            offsets = spans.offsets.to_pylist()
            n_text, n_media, n_tok, n_syl = [], [], [], []
            for i in range(len(offsets) - 1):
                lo, hi = offsets[i], offsets[i + 1]
                t_parts = [
                    texts[j] for j in range(lo, hi) if kinds[j] == "text"
                ]
                n_text.append(len(t_parts))
                n_media.append((hi - lo) - len(t_parts))
                toks = tokenize_text("".join(t_parts))
                n_tok.append(len(toks))
                n_syl.append(sum(count_syllables(t) for t in toks))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    spans,
                    pa.array(n_text, pa.int64()),
                    pa.array(n_media, pa.int64()),
                    pa.array(n_tok, pa.int64()),
                    pa.array(n_syl, pa.int64()),
                ],
                names=[
                    "doc_id",
                    "spans",
                    "n_text_spans",
                    "n_media_spans",
                    "n_tokens",
                    "n_syllables",
                ],
            )

    return nested.mapInArrow(run, schema_str)


def process_spans_exploded(nested: DataFrame) -> DataFrame:
    """Explode → process → reassemble variant of :func:`process_spans`
    (same output schema); exists to prove (kind, text, media_ref,
    order) survival across a real shuffle."""
    spans = explode_spans(nested)
    toks = F.when(F.col("kind") == "text", tokens_udf(F.col("text"))).otherwise(
        F.array().cast("array<string>")
    )
    enriched = spans.withColumn("tokens", toks).withColumn(
        "span_syllables",
        F.aggregate(
            F.transform("tokens", syllables_col), F.lit(0), lambda acc, x: acc + x
        ),
    )
    reassembled = (
        enriched.groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("pos", "kind", "text", "media_ref", "offset")
                    )
                ),
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
            F.sum(F.when(F.col("kind") == "text", 1).otherwise(0)).alias(
                "n_text_spans"
            ),
            F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias(
                "n_media_spans"
            ),
            F.sum(F.size("tokens")).alias("n_tokens"),
            F.sum("span_syllables").alias("n_syllables"),
        )
    )
    # a doc whose spans array is empty emits no exploded rows and
    # would silently vanish in the groupBy — left-join the result
    # back onto the input doc_ids and fill zero metrics, matching
    # process_spans/process_spans_fused exactly
    span_type = nested.schema["spans"].dataType.simpleString()
    return nested.select("doc_id").join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce("spans", F.array().cast(span_type)).alias("spans"),
        *[
            F.coalesce(c, F.lit(0).cast("bigint")).alias(c)
            for c in ("n_text_spans", "n_media_spans", "n_tokens", "n_syllables")
        ],
    )


def span_word_frequency(nested: DataFrame) -> DataFrame:
    """Corpus word-frequency over text spans only — must equal the
    flat-table histogram when the nested table was synthesized from it
    (spans split at whitespace boundaries, corpus.py)."""
    spans = explode_spans(nested).filter(F.col("kind") == "text")
    return (
        spans.select(F.explode(tokens_udf(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("word"))
    )


def span_readability(nested: DataFrame) -> DataFrame:
    """Per-document readability computed over concatenated text spans
    (sentence boundaries must see the full document text, so this
    reassembles text before scoring)."""
    from textalyzer_spark.operators.readability import readability

    flat = nested.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter("spans", lambda s: s["kind"] == "text"),
                lambda s: s["text"],
            ),
            "",
        ).alias("text"),
    )
    return readability(flat)
