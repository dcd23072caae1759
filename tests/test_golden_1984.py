"""FIXTURES.md F-10: the reference's end-to-end histogram golden on
examples/1984.txt — 105,421 tokens, 8,820 distinct words, pinned
top-5, and the formatted output being exactly 239,902 bytes of stdout
(reference integration_tests.rs:7-24; stdout = formatted + 1 newline).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from textalyzer_spark.formatting import format_freq_map
from textalyzer_spark.operators.frequency import word_frequency

CORPUS = "/root/reference/examples/1984.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference corpus not present"
)


@pytest.fixture(scope="module")
def freq_rows(spark):
    with open(CORPUS, encoding="utf-8") as f:
        text = f.read()
    df = spark.createDataFrame([("1984", text)], "doc_id string, text string")
    return word_frequency(df, use_pandas_udf=True).collect()


def test_1984_totals(freq_rows):
    assert sum(r["count"] for r in freq_rows) == 105_421
    assert len(freq_rows) == 8_820


def test_1984_top5(freq_rows):
    top5 = [(r["word"], r["count"]) for r in freq_rows[:5]]
    assert top5 == [
        ("the", 6522), ("of", 3494), ("a", 2575), ("and", 2445), ("to", 2348)
    ]


def test_1984_formatted_golden_bytes(freq_rows):
    rows = [(r["word"], r["count"]) for r in freq_rows]
    rendered = format_freq_map(rows) + "\n"  # writeln! adds one newline
    assert len(rendered.encode("utf-8")) == 239_902
