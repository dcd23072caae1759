"""Fixtures F-1, F-2 from FIXTURES.md (reference:
textalyzer/src/frequency.rs:11-33 doctest and :97-115 unit test)."""

from __future__ import annotations

import pytest

from textalyzer_spark.functions.tokenize import tokenize_text
from textalyzer_spark.operators.frequency import word_frequency

F1_TEXT = "This test is a test to test the frequency map."
F1_GOLD = {
    "this": 1, "test": 3, "is": 1, "a": 1,
    "to": 1, "the": 1, "frequency": 1, "map": 1,
}

F2_TEXT = "Hello World! A warm welcome to the world."
F2_GOLD = {"a": 1, "hello": 1, "the": 1, "to": 1, "warm": 1, "welcome": 1, "world": 2}


def test_tokenize_python_f1():
    toks = tokenize_text(F1_TEXT)
    assert len(toks) == 10
    got = {}
    for t in toks:
        got[t] = got.get(t, 0) + 1
    assert got == F1_GOLD


def test_tokenize_unicode_and_digits():
    # digits/underscore are separators (not alphabetic); Unicode letters kept
    assert tokenize_text("foo_bar 42baz Grüße") == ["foo", "bar", "baz", "grüße"]
    assert tokenize_text("") == []


@pytest.mark.parametrize("use_udf", [False, True])
@pytest.mark.parametrize("text,gold", [(F1_TEXT, F1_GOLD), (F2_TEXT, F2_GOLD)])
def test_word_frequency_spark(spark, text, gold, use_udf):
    df = spark.createDataFrame([(text,)], "text string")
    out = word_frequency(df, use_pandas_udf=use_udf).collect()
    assert {r["word"]: r["count"] for r in out} == gold
    # pinned order: count desc, word asc
    keys = [(-r["count"], r["word"]) for r in out]
    assert keys == sorted(keys)


def test_frequency_scalars_a5(spark):
    # SURVEY §2 A5: formatting scalars (max count / display widths)
    from textalyzer_spark.operators.frequency import frequency_scalars

    df = spark.createDataFrame([(F1_TEXT,)], "text string")
    row = frequency_scalars(word_frequency(df)).collect()[0]
    assert row["max_count"] == 3
    assert row["max_word_width"] == 9  # 'frequency'
    assert row["max_count_width"] == 1


def test_jvm_and_udf_paths_agree(spark):
    texts = [(F1_TEXT,), (F2_TEXT,), ("Grüße, Welt! naïve café 123",), ("",)]
    df = spark.createDataFrame(texts, "text string")
    a = {(r["word"], r["count"]) for r in word_frequency(df, use_pandas_udf=False).collect()}
    b = {(r["word"], r["count"]) for r in word_frequency(df, use_pandas_udf=True).collect()}
    assert a == b
