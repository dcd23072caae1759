"""C4-style global span-level deduplication with document rebuild.

Raffel et al. 2020 (C4, arXiv:1910.10683 §2.2): "we discarded all but
one of any three-sentence span occurring more than once in the data
set". Here the repeating unit is a LINE (the reference's line
semantics, /root/reference/textalyzer/src/file_utils.rs:11-55, via
:mod:`operators.lines`); a span is ``n`` consecutive lines. Every line
covered by a non-first occurrence (first = minimal ``(doc_id, start)``)
of a span that occurs more than once in the corpus is dropped, and each
document is rebuilt from its surviving lines in order. This removes
cross-document boilerplate (cookie banners, license headers) and
in-document repetition in one pass — the span-granular complement of
the doc-granular :func:`operators.dedup.exact_dedup`.

Scale shape: lines are a narrow ``posexplode``; span assembly is
``n-1`` ``lead`` s over a per-document window (one shuffle on doc_id,
partitions are doc-sized); the first-occurrence pick is a
``min(struct)`` aggregate on the span hash (Spark plans struct-min as
a SortAggregate, but the PARTIAL map-side combine still applies, so a
boilerplate span occurring in millions of documents reduces to one
row per map partition before the shuffle) — NOT a ``row_number``
window, which would single-reducer sort that mega-key. The rebuild
never shuffles the corpus: only the removed ``(doc_id, line_number)``
pairs aggregate (one hash shuffle bounded by removals) and join back
onto the documents, which rebuild in place from their own split-lines
arrays (round 8; the previous corpus-wide line anti-join +
``collect_list`` re-assembly shuffled every line twice). Nothing is
quadratic; no driver materialization.

The incremental family (:func:`span_catalog` /
:func:`incremental_span_dedup` / :func:`updated_span_catalog`) is the
cross-snapshot form: a persisted first-occurrence catalog of span
hashes plays the role the fingerprint catalog plays for
:func:`operators.incremental.incremental_exact_dedup`, one level down
(spans instead of whole documents). The streaming twin is
``streaming_catalog_maintenance(method='span')`` in streaming/jobs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from textalyzer_spark.operators.lines import explode_lines


def _lines_and_spans(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared front half: exploded ``(id, line_number, line)`` plus
    the ``n``-line span table ``(id, start, h)``."""
    if n < 1:
        raise ValueError("span length n must be >= 1")
    lines = explode_lines(df, id_col=id_col, text_col=text_col).select(
        id_col, "line_number", "line"
    )
    w = Window.partitionBy(id_col).orderBy("line_number")
    # concat_ws SKIPS nulls, so a tail span of n-1 lines would collide
    # with a genuine (n-1)-line span: gate on the last lead explicitly
    # (if lead n-1 exists, every shorter lead in the same doc does too)
    parts = [F.col("line")] + [F.lead("line", i).over(w) for i in range(1, n)]
    spans = (
        lines.withColumn("_last", parts[-1] if n > 1 else F.col("line"))
        .withColumn("_content", F.concat_ws("\n", *parts))
        .filter(F.col("_last").isNotNull())
        .select(
            F.col(id_col),
            F.col("line_number").alias("start"),
            F.md5("_content").alias("h"),
        )
    )
    return lines, spans


def _rebuild(
    df: DataFrame,
    removed_spans: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Shared back half: expand removed span starts to per-document
    removed line-number SETS and rebuild each document in place with
    an indexed array filter.

    Round-8 shape (guide §8 "decide with small rows, move big rows
    once" — here the big rows never move at all): the previous form
    anti-joined the corpus-wide line table against the removed lines
    and re-assembled every document through a groupBy/collect_list —
    two shuffles of EVERY line in the corpus. Only the removed
    (id, line_number) pairs carry any information, so now just they
    are aggregated (one shuffle over removed lines only) and joined
    onto the documents; each doc rebuilds from its own split-lines
    array without leaving its scan partition. Output values are
    identical (pinned by the span_dedup/incremental_span_dedup gates
    and the pytest suite)."""
    from textalyzer_spark.operators.lines import split_lines

    removed_sets = (
        removed_spans.select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))
            ).alias("line_number"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("line_number").alias("_rm"))
    )
    arr = split_lines(text_col)
    base = df.select(F.col(id_col), arr.alias("_lines")).join(
        removed_sets, id_col, "left"
    )
    rm = F.coalesce(F.col("_rm"), F.array().cast("array<int>"))
    kept = F.filter(
        "_lines",
        lambda line, i: ~F.array_contains(rm, (i + F.lit(1)).cast("int")),
    )
    # Generate barrier (quality._generate_barrier rationale): the kept
    # array feeds both the concat and the count — evaluate the indexed
    # filter once per row, not per reference
    out = base.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.struct(
                    kept.alias("k"), F.size(rm).cast("bigint").alias("nrm")
                )
            )
        ).alias("_x"),
    )
    return out.select(
        id_col,
        F.concat_ws("\n", F.col("_x.k")).alias("text"),
        F.size(F.col("_x.k")).cast("bigint").alias("n_lines_kept"),
        F.col("_x.nrm").alias("n_lines_removed"),
    )


def span_dedup(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove all but the first occurrence of every duplicated
    ``n``-line span and rebuild each document.

    Returns one row per input document:
    ``(doc_id, text, n_lines_kept, n_lines_removed)`` — ``text`` is
    the reconstruction from surviving lines (empty string when every
    line was removed or the document had none). Documents shorter
    than ``n`` lines form no spans and pass through untouched.
    """
    _, spans = _lines_and_spans(df, n, id_col, text_col)
    firsts = spans.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("first"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    removed_spans = (
        spans.join(firsts, "h")
        .filter(
            (F.col("n_occ") > 1)
            & ~(
                (F.col(id_col) == F.col(f"first.{id_col}"))
                & (F.col("start") == F.col("first.start"))
            )
        )
        .select(id_col, "start")
    )
    return _rebuild(df, removed_spans, n, id_col, text_col)


# --------------------------------------------------------------------------
# incremental / cross-snapshot (the new-crawl-vs-catalog workflow)
# --------------------------------------------------------------------------


def span_catalog(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans: DataFrame | None = None,
) -> DataFrame:
    """First-occurrence catalog of span hashes: ``(h, keep_id,
    keep_start)`` — one row per DISTINCT ``n``-line span in the
    snapshot, carrying its minimal ``(doc_id, start)`` occurrence.
    O(distinct spans) state, the span-granular analog of
    :func:`operators.incremental.exact_catalog`; built with the same
    skew-safe ``min(struct)`` hash agg as :func:`span_dedup` (a
    boilerplate span in millions of docs partial-aggregates map-side).
    ``spans=`` accepts an ALREADY MATERIALIZED span table so the
    streaming maintenance job derives the batch's spans once for both
    the dedup rebuild and the catalog append (ADVICE r7)."""
    if spans is None:
        _, spans = _lines_and_spans(df, n, id_col, text_col)
    return spans.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("first")
    ).select(
        "h",
        F.col(f"first.{id_col}").alias("keep_id"),
        F.col("first.start").alias("keep_start"),
    )


def incremental_span_dedup(
    new_df: DataFrame,
    catalog: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Span-dedup the NEW batch against a prior-snapshot catalog: a
    new-batch span occurrence is removed iff its hash is already in
    the catalog (it occurred in a prior snapshot, so this occurrence
    is never first) OR it duplicates within the batch and is not the
    batch-minimal ``(doc_id, start)``. Documents are rebuilt exactly
    as :func:`span_dedup` rebuilds them.

    When snapshot doc_ids are monotone (every new id > every cataloged
    id — the append-only crawl layout), this equals :func:`span_dedup`
    over the UNION corpus restricted to the new docs (pinned in
    tests/test_span_dedup.py). Catalog traffic is one hash join on
    ``h`` against the batch's spans — proportional to the batch, never
    the catalog.
    """
    _, spans = _lines_and_spans(new_df, n, id_col, text_col)
    firsts = spans.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("first"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    flagged = (
        spans.join(firsts, "h")
        .join(
            catalog.select("h").withColumn("_incat", F.lit(True)),
            "h",
            "left",
        )
    )
    removed_spans = flagged.filter(
        F.col("_incat").isNotNull()
        | (
            (F.col("n_occ") > 1)
            & ~(
                (F.col(id_col) == F.col(f"first.{id_col}"))
                & (F.col("start") == F.col("first.start"))
            )
        )
    ).select(id_col, "start")
    return _rebuild(new_df, removed_spans, n, id_col, text_col)


def updated_span_catalog(
    catalog: DataFrame,
    new_df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans: DataFrame | None = None,
) -> DataFrame:
    """The next catalog snapshot: prior entries win (their occurrence
    stays first); span hashes unseen before enter with their
    batch-minimal occurrence. Anti-join on ``h`` — the catalog is
    never rewritten, only appended (the
    :func:`operators.incremental.updated_exact_catalog` discipline)."""
    new_cat = span_catalog(new_df, n, id_col, text_col, spans=spans)
    return catalog.unionByName(
        new_cat.join(catalog.select("h"), "h", "left_anti")
    )
