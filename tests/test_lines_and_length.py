"""Fixtures F-7, F-8, F-9 from FIXTURES.md (reference:
textalyzer/src/line_length.rs:124-189, file_utils.rs:190-223)."""

from __future__ import annotations

from pyspark.sql import functions as F

from textalyzer_spark.functions.width import str_display_width
from textalyzer_spark.operators.line_length import line_length_histogram
from textalyzer_spark.operators.lines import explode_lines


def test_display_width_fixtures():
    # reference fixture values: line_length.rs:154-166
    assert str_display_width("你好") == 4
    assert str_display_width("🚀") == 2
    assert str_display_width("hello") == 5
    assert str_display_width("") == 0


def test_merge_file_lines_f9(spark):
    df = spark.createDataFrame(
        [("file1", "Line one\nLine Two\n"), ("file2", "Another line\n")],
        "doc_id string, text string",
    )
    lines = explode_lines(df).filter(F.octet_length("trimmed") > 5)
    got = sorted((r.doc_id, r.line_number, r.line) for r in lines.collect())
    assert got == [
        ("file1", 1, "Line one"),
        ("file1", 2, "Line Two"),
        ("file2", 1, "Another line"),
    ]


def test_explode_lines_crlf_and_empty(spark):
    df = spark.createDataFrame(
        [("a", "x\r\ny\r\n"), ("b", ""), ("c", "one\n\ntwo")],
        "doc_id string, text string",
    )
    got = sorted((r.doc_id, r.line_number, r.line) for r in explode_lines(df).collect())
    assert got == [
        ("a", 1, "x"), ("a", 2, "y"),
        ("c", 1, "one"), ("c", 2, ""), ("c", 3, "two"),
    ]


def test_line_length_histogram_f7(spark):
    # widths 5,6 in file1; 5,7 in file2 → {5:2, 6:1, 7:1}
    df = spark.createDataFrame(
        [("file1", "12345\n123456"), ("file2", "12345\n1234567")],
        "doc_id string, text string",
    )
    out = line_length_histogram(df).collect()
    assert [(r.length, r["count"]) for r in out] == [(5, 2), (6, 1), (7, 1)]


def test_line_length_histogram_unicode_f8(spark):
    df = spark.createDataFrame([("f", "你好\n🚀")], "doc_id string, text string")
    out = line_length_histogram(df, use_display_width=True).collect()
    assert [(r.length, r["count"]) for r in out] == [(2, 1), (4, 1)]
