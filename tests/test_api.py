"""Library API surface (reference lib.rs / wasm analog)."""

from __future__ import annotations

import json

from textalyzer_spark.api import duplication, get_dup_lines, get_freq_map


def test_get_freq_map(spark):
    m = get_freq_map(spark, "This test is a test to test the frequency map.")
    assert m["test"] == 3 and m["map"] == 1 and len(m) == 8


def test_get_dup_lines(spark):
    out = json.loads(
        get_dup_lines(spark, "This line repeats.\nunique here\nThis line repeats.\n")
    )
    assert out == [
        {
            "content": "This line repeats.",
            "locations": [
                {"path": "textarea", "line": 1},
                {"path": "textarea", "line": 3},
            ],
        }
    ]


def test_duplication_api(spark):
    blocks = duplication(
        spark,
        {
            "f1": "alpha beta gamma\ndelta epsilon zeta\neta theta iota\n",
            "f2": "x\nalpha beta gamma\ndelta epsilon zeta\neta theta iota\n",
        },
        min_lines=3,
    )
    assert len(blocks) == 1
    content, locs = blocks[0]
    assert content.count("\n") == 2
    assert sorted(locs) == [("f1", 1), ("f2", 2)]


def test_duplication_report_files_only(spark):
    texts = {
        "a.txt": "one shared line\ntwo shared line\nthree shared line\nx",
        "b.txt": "one shared line\ntwo shared line\nthree shared line\ny",
    }
    from textalyzer_spark.api import duplication_report

    full = duplication_report(spark, texts, min_lines=3)
    fo = duplication_report(spark, texts, min_lines=3, files_only=True)
    assert "a.txt:1" in fo and "b.txt:1" in fo
    assert "one shared line" in full and "one shared line" not in fo
