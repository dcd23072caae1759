"""Document → line explosion (the reference's ``merge_file_lines``).

Reference: /root/reference/textalyzer/src/file_utils.rs:11-55 —
per file: split lines, 1-based numbering, trim, optional predicate on
the trimmed content. Rust ``str::lines`` swallows a trailing "\\r"
(CRLF) and does NOT emit a final empty line after a trailing "\\n";
both quirks are reproduced here.

Spark shape: ``posexplode(split(text, '\\n'))`` — a narrow
transformation, no shuffle; line numbers are per-document so this
parallelizes embarrassingly across documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_lines(text: Column | str) -> Column:
    """array<string> of lines, Rust ``str::lines`` semantics."""
    c = F.col(text) if isinstance(text, str) else text
    # strip ONE trailing terminator (\n or \r\n) so split() doesn't
    # emit a final "" element. \z, not $: Java's $ also matches BEFORE
    # a final line terminator, so "\n$" on "\n\n" would strip BOTH
    # newlines (hypothesis-found); DuckDB's RE2 $ is end-of-text-only
    stripped = F.regexp_replace(c, r"\r?\n\z", "")
    arr = F.split(stripped, r"\n")
    # str::lines swallows \r ONLY as part of a \r\n terminator: every
    # element except the last was \n-terminated in `stripped`, so
    # drop one trailing \r there; the LAST element never was — a bare
    # trailing \r stays ("foo\r\nbar\n\nbaz\r".lines() ends "baz\r",
    # std docs; ADVICE round-2). Strip-all + re-append the untouched
    # last element, NOT a per-element indexed lambda (which would
    # re-evaluate the split per element — the Catalyst shared-
    # subexpression trap)
    arr = F.concat(
        F.slice(
            F.transform(arr, lambda l: F.regexp_replace(l, r"\r\z", "")),
            1,
            F.size(arr) - 1,
        ),
        F.array(F.element_at(arr, -1)),
    )
    # only a truly EMPTY document has zero lines (split("") == [""]);
    # the emptiness check must look at the ORIGINAL text — "\n" is one
    # empty line in Rust ("\n".lines() == [""]), found by the
    # hypothesis property test against the str::lines model
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(arr)


def explode_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_empty: bool = True,
) -> DataFrame:
    """``(doc_id, line_number int 1-based, line, trimmed)``.

    ``keep_empty=False`` reproduces the reference's non-empty filter
    (file_utils.rs:27,44) — note numbering happens BEFORE the filter,
    so line numbers still index into the original document.
    """
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(split_lines(text_col)).alias("pos", "line"),
    ).select(
        "doc_id",
        (F.col("pos") + 1).cast("int").alias("line_number"),
        "line",
        F.trim(F.col("line")).alias("trimmed"),
    )
    if not keep_empty:
        out = out.filter(F.col("trimmed") != "")
    return out
