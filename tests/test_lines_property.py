"""Hypothesis property test: split_lines must match a plain-Python
model of Rust ``str::lines`` (the reference's line iterator) on
arbitrary ASCII text with every mix of \\n, \\r\\n, trailing
terminators, and blank runs — beyond the handcrafted fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from textalyzer_spark.operators.lines import split_lines


def rust_lines_model(text: str) -> list[str]:
    """Rust str::lines: split on \\n, swallow a trailing \\r only as
    part of a \\r\\n terminator, no final empty line after a trailing
    \\n. A BARE final \\r (text not \\n-terminated) is KEPT — std
    docs: "foo\\r\\nbar\\n\\nbaz\\r" yields last line "baz\\r"."""
    if text == "":
        return []
    ends_nl = text.endswith("\n")
    parts = text.split("\n")
    if ends_nl:
        parts = parts[:-1]
    return [
        p[:-1]
        if (i < len(parts) - 1 or ends_nl) and p.endswith("\r")
        else p
        for i, p in enumerate(parts)
    ]


_TEXT = st.lists(
    st.sampled_from(list("ab XY.!\t\n\r") + ["\r\n"]), max_size=40
).map("".join)


@settings(max_examples=12, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=25))
def test_split_lines_matches_rust_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: list(r["lines"])
        for r in df.select(
            "doc_id", split_lines("text").alias("lines")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == rust_lines_model(t), repr(t)


_ASCII_TEXT = st.lists(
    st.sampled_from(list("abcXYZ 019.,!?'\"-\n\t_")), max_size=60
).map("".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_ASCII_TEXT, min_size=1, max_size=25))
def test_jvm_and_python_tokenizers_agree(spark, texts):
    """tokens_col (JVM \\p{IsAlphabetic}) and tokenize_text (Python
    [^\\W\\d_]) must produce identical token streams on ASCII — the
    assumption every oracle-bound text query rests on."""
    from textalyzer_spark.functions.tokenize import tokenize_text, tokens_col

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: list(r["toks"])
        for r in df.select("doc_id", tokens_col("text").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tokenize_text(t), repr(t)
