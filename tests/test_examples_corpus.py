"""FIXTURES.md F-11/F-12: the reference's examples corpus
(duplicates.py + herr_von_ribbeck.txt, nested dirs) driven through the
engine end to end, plus JSON sink shapes."""

from __future__ import annotations

import json
import os

import pytest

from textalyzer_spark.formatting import (
    duplication_json,
    frequency_json,
    line_length_json,
)
from textalyzer_spark.operators.duplication import duplicate_blocks
from textalyzer_spark.sources.readers import read_text_corpus

EXAMPLES = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not present"
)


def test_duplication_smoke_examples(spark):
    # integration_tests.rs:27-50: duplication over duplicates.py +
    # herr_von_ribbeck.txt runs without error. Note the reference's
    # indentation quirk (duplication.rs:144-149, reproduced here):
    # scans only start at unindented duplicate lines, so the python
    # file's 4-space-indented planted blocks are invisible to BOTH
    # engines and the multi-line result is correctly empty.
    df = read_text_corpus(spark, EXAMPLES, glob="*.{py,txt}").filter(
        "doc_id like '%duplicates.py' or doc_id like '%herr_von_ribbeck.txt'"
    )
    assert df.count() == 2
    assert duplicate_blocks(df, min_lines=3).collect() == []

    # single-line mode has no such gate: the planted repeated lines
    # (trimmed, > 5 bytes) surface with their 3 locations
    singles = duplicate_blocks(df, min_lines=1).collect()
    planted = [r for r in singles if "first line in a block" in r["content"]]
    assert planted and len(planted[0]["locations"]) == 3


def test_nested_dir_recursion(spark):
    # file_utils.rs:226-252: nested/file1, nested/file2, nested2/file3
    df = read_text_corpus(spark, f"{EXAMPLES}/nested")
    names = {r["doc_id"].rsplit("/", 1)[-1] for r in df.collect()}
    assert names == {"file1.txt", "file2.txt", "file3.txt"}


def test_json_shapes():
    f = json.loads(frequency_json([("b", 2), ("a", 2), ("c", 1)]))
    assert f == [
        {"word": "a", "count": 2},
        {"word": "b", "count": 2},
        {"word": "c", "count": 1},
    ]
    l = json.loads(line_length_json([(7, 1), (5, 2)]))
    assert l == [{"length": 5, "count": 2}, {"length": 7, "count": 1}]
    d = json.loads(duplication_json([("x\ny", [("f1", 1), ("f2", 3)])]))
    assert d == [
        {
            "content": "x\ny",
            "locations": [{"path": "f1", "line": 1}, {"path": "f2", "line": 3}],
        }
    ]
