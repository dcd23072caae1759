"""C4-style global span dedup (operators/span_dedup.py): planted
boilerplate and repetition fixtures with hand-computed expected
reconstructions."""

from __future__ import annotations


def _dedup(spark, rows, n=3):
    from textalyzer_spark.operators.span_dedup import span_dedup

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in span_dedup(df, n=n).collect()
    }


def test_cross_doc_boilerplate_removed_once(spark):
    """The same 3-line footer in three docs survives only in the
    lowest doc_id; unique content is untouched."""
    footer = "accept cookies\nprivacy policy\nall rights reserved"
    out = _dedup(
        spark,
        [
            (1, "alpha one\nbeta two\n" + footer),
            (2, "gamma three\n" + footer),
            (3, footer + "\ndelta four"),
        ],
    )
    assert out[1] == ("alpha one\nbeta two\n" + footer, 5, 0)
    assert out[2] == ("gamma three", 1, 3)
    assert out[3] == ("delta four", 1, 3)


def test_within_doc_repetition_overlapping_spans(spark):
    """A line repeated 6x forms overlapping duplicate spans; every
    line covered by a non-first occurrence goes — only line 1 stays."""
    out = _dedup(spark, [(7, "\n".join(["same line"] * 6))])
    assert out[7] == ("same line", 1, 5)


def test_short_and_empty_docs_pass_through(spark):
    """Docs with < n lines form no spans (even when their lines repeat
    verbatim elsewhere); empty docs come back as empty strings."""
    out = _dedup(
        spark,
        [
            (1, "accept cookies\nprivacy policy"),
            (2, "accept cookies\nprivacy policy"),
            (3, ""),
        ],
    )
    assert out[1] == ("accept cookies\nprivacy policy", 2, 0)
    assert out[2] == ("accept cookies\nprivacy policy", 2, 0)
    assert out[3] == ("", 0, 0)


def test_n1_is_global_line_dedup(spark):
    """n=1 degenerates to global keep-first line dedup."""
    out = _dedup(
        spark,
        [(1, "a\nb\na"), (2, "b\nc")],
        n=1,
    )
    assert out[1] == ("a\nb", 2, 1)  # second "a" removed
    assert out[2] == ("c", 1, 1)  # "b" first seen in doc 1


def test_first_occurrence_keeps_lines_shared_with_removed_span(spark):
    """Lines of the FIRST occurrence survive even when a later
    overlapping duplicate span within the same doc is removed."""
    # doc: X A B C A B C — spans (A B C) at lines 2 and 5 duplicate;
    # the first (lines 2-4) survives, the second (lines 5-7) goes.
    out = _dedup(spark, [(9, "x\na\nb\nc\na\nb\nc")])
    assert out[9] == ("x\na\nb\nc", 4, 3)
