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


def _rows_by_id(df):
    return {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in df.collect()
    }


def test_incremental_equals_union_one_shot_under_monotone_ids(spark):
    """With append-only (monotone) doc_ids, the catalog path equals
    span_dedup over the union corpus restricted to the new batch —
    covering a catalog hit, a within-batch duplicate pair, and unique
    content, plus a short doc that forms no spans."""
    from textalyzer_spark.operators.span_dedup import (
        incremental_span_dedup,
        span_catalog,
        span_dedup,
    )

    footer = "accept cookies\nprivacy policy\nall rights reserved"
    old = spark.createDataFrame(
        [(1, "alpha one\nbeta two\n" + footer), (2, "solo\ncontent here")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            (101, "gamma three\n" + footer),  # catalog hit
            (102, "x\ny\nz\nfresh"),  # within-batch first
            (103, "x\ny\nz\nother"),  # within-batch duplicate
            (104, "too\nshort"),  # no spans
        ],
        "doc_id bigint, text string",
    )
    inc = _rows_by_id(incremental_span_dedup(new, span_catalog(old, n=3), n=3))
    union = _rows_by_id(
        span_dedup(old.unionByName(new), n=3).filter("doc_id > 100")
    )
    assert inc == union
    assert inc[101] == ("gamma three", 1, 3)
    assert inc[102] == ("x\ny\nz\nfresh", 4, 0)
    assert inc[103] == ("other", 1, 3)
    assert inc[104] == ("too\nshort", 2, 0)


def test_updated_span_catalog_prior_entries_win(spark):
    """Advancing the catalog never rewrites an existing hash row (the
    prior occurrence stays first); unseen hashes enter with their
    batch-minimal (doc_id, start)."""
    from textalyzer_spark.operators.span_dedup import (
        span_catalog,
        updated_span_catalog,
    )

    old = spark.createDataFrame(
        [(1, "a\nb\nc")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(100, "a\nb\nc\nd"), (101, "q\nr\ns")],
        "doc_id bigint, text string",
    )
    cat0 = span_catalog(old, n=3)
    cat1 = updated_span_catalog(cat0, new, n=3)
    rows = {r["h"]: (r["keep_id"], r["keep_start"]) for r in cat1.collect()}
    # abc kept by doc 1 (prior snapshot), not re-pointed at doc 100
    [abc_h] = [r["h"] for r in cat0.collect()]
    assert rows[abc_h] == (1, 1)
    # new hashes: bcd (doc 100 start 2) and qrs (doc 101 start 1)
    assert sorted(v for k, v in rows.items() if k != abc_h) == [
        (100, 2),
        (101, 1),
    ]
    assert cat1.count() == 3


def test_first_occurrence_keeps_lines_shared_with_removed_span(spark):
    """Lines of the FIRST occurrence survive even when a later
    overlapping duplicate span within the same doc is removed."""
    # doc: X A B C A B C — spans (A B C) at lines 2 and 5 duplicate;
    # the first (lines 2-4) survives, the second (lines 5-7) goes.
    out = _dedup(spark, [(9, "x\na\nb\nc\na\nb\nc")])
    assert out[9] == ("x\na\nb\nc", 4, 3)
