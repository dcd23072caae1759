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
window, which would single-reducer sort that mega-key. Removal
explode + ``distinct`` and the rebuild ``groupBy(doc_id)`` are linear
hash shuffles on bounded keys. Nothing is quadratic; no driver
materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from textalyzer_spark.operators.lines import explode_lines


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
    removed_lines = removed_spans.select(
        id_col,
        F.explode(
            F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))
        ).alias("line_number"),
    ).distinct()
    kept = lines.join(removed_lines, [id_col, "line_number"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_number", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    nrem = removed_lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines_removed")
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .join(nrem, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.coalesce(F.col("n_lines_kept"), F.lit(0))
            .cast("bigint")
            .alias("n_lines_kept"),
            F.coalesce(F.col("n_lines_removed"), F.lit(0))
            .cast("bigint")
            .alias("n_lines_removed"),
        )
    )
