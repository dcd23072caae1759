"""Readability (FIXTURES.md F-14) and quality/lang-id/fingerprint ops."""

from __future__ import annotations

import pytest

from textalyzer_spark.functions.syllables import count_syllables
from textalyzer_spark.operators.quality import fingerprint, lang_id, quality_score, token_stats
from textalyzer_spark.operators.readability import readability


def test_syllable_heuristic():
    assert count_syllables("cat") == 1
    assert count_syllables("table") == 2      # ends 'le': keep the group
    assert count_syllables("make") == 1       # silent e dropped
    assert count_syllables("readability") == 5  # ea|a|i|i|y
    assert count_syllables("e") == 1           # floor at 1
    assert count_syllables("rhythm") == 1      # y counts as vowel


def _fk_golden(n_words, n_sents, n_syll):
    fre = 206.835 - 1.015 * (n_words / n_sents) - 84.6 * (n_syll / n_words)
    fk = 0.39 * (n_words / n_sents) + 11.8 * (n_syll / n_words) - 15.59
    return round(fre, 4), round(fk, 4)


def test_readability_f14(spark):
    # "The cat sat on the mat. It was happy." — 9 words, 2 sentences,
    # syllables: the=1 cat=1 sat=1 on=1 the=1 mat=1 it=1 was=1 happy=2 → 10
    text = "The cat sat on the mat. It was happy."
    df = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    row = readability(df).collect()[0]
    assert row["n_words"] == 9
    assert row["n_sentences"] == 2
    assert row["n_syllables"] == 10
    assert row["n_distinct_words"] == 8  # 'the' twice
    fre, fk = _fk_golden(9, 2, 10)
    assert row["flesch_reading_ease"] == pytest.approx(fre, abs=1e-4)
    assert row["fk_grade"] == pytest.approx(fk, abs=1e-4)
    assert row["type_token_ratio"] == pytest.approx(round(8 / 9, 4), abs=1e-4)


def test_readability_no_punctuation_floors_sentences(spark):
    df = spark.createDataFrame([("d1", "hello world again")], "doc_id string, text string")
    row = readability(df).collect()[0]
    assert row["n_sentences"] == 1
    assert row["n_words"] == 3


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame(
        [("d1", "the quick brown fox jumps over the lazy dog " * 3)],
        "doc_id string, text string",
    )
    st = token_stats(df).collect()[0]
    assert st["n_tokens"] == 27
    assert st["n_distinct_tokens"] == 8
    assert st["stopword_ratio"] == pytest.approx(round(6 / 27, 4))  # 'the' x2 x3 reps
    q = quality_score(df).collect()[0]
    assert 0.0 <= q["quality_score"] <= 1.0
    assert q["n_tokens"] == 27


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("en_doc", "the cat and the dog of it"),
            ("de_doc", "der hund und die katze ist nicht da"),
            ("es_doc", "el perro y la casa es que un gato"),
            ("empty", "xyzzy plugh"),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got["en_doc"] == "en"
    assert got["de_doc"] == "de"
    assert got["es_doc"] == "es"
    assert got["empty"] == "unk"


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [("a", "Hello   World"), ("b", "hello world"), ("c", "different")],
        "doc_id string, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert fps["a"] == fps["b"]
    assert fps["a"] != fps["c"]
