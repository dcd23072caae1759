"""Readability + lexical-complexity metrics (north_star extension).

The reference promises "readability, complexity" in its tagline
(/root/reference/README.md:3-4) but implements neither; BASELINE.json
north_star makes them concrete: Flesch-Kincaid readability scoring and
lexical-complexity counts. Public formulas (Flesch 1948, Kincaid 1975):

    FRE      = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)
    FK grade = 0.39*(words/sentences) + 11.8*(syllables/words) - 15.59

Pinned conventions (FIXTURES.md F-14): sentences = non-blank segments
split on [.!?]+, floored at 1; syllable heuristic from
functions/syllables.py; scores rounded to 4 decimals.

Everything here is a Catalyst column expression over the token array
(higher-order functions transform/aggregate/filter) — zero Python in
the executor hot path, whole-stage codegen end to end, and exactly
replicable in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from textalyzer_spark.functions.syllables import syllables_col
from textalyzer_spark.functions.tokenize import tokens_col


def sentence_count(text: Column | str) -> Column:
    """Non-blank [.!?]+-delimited segments, floored at 1."""
    c = F.col(text) if isinstance(text, str) else text
    segs = F.filter(F.split(c, r"[.!?]+"), lambda s: F.trim(s) != F.lit(""))
    return F.greatest(F.size(segs), F.lit(1))


def readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document readability and lexical-complexity metrics.

    ``(doc_id, n_words, n_sentences, n_syllables, n_distinct_words,
    type_token_ratio, flesch_reading_ease, fk_grade)``.
    """
    toks = tokens_col(text_col)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        sentence_count(text_col).alias("n_sentences"),
    ).select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.col("n_sentences").cast("int").alias("n_sentences"),
        F.aggregate(
            F.transform("toks", syllables_col), F.lit(0), lambda acc, x: acc + x
        ).alias("n_syllables"),
        F.size(F.array_distinct("toks")).alias("n_distinct_words"),
    )
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        "n_distinct_words",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_distinct_words") / w, 4),
        ).alias("type_token_ratio"),
        F.when(
            F.col("n_words") > 0,
            F.round(F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w), 4),
        ).alias("flesch_reading_ease"),
        F.when(
            F.col("n_words") > 0,
            F.round(F.lit(0.39) * (w / s) + F.lit(11.8) * (y / w) - F.lit(15.59), 4),
        ).alias("fk_grade"),
    )


def corpus_lexical_stats(df: DataFrame, text_col: str = "text", exact: bool = True) -> DataFrame:
    """Corpus-level lexical complexity: total / distinct word counts.

    ``exact=False`` uses HyperLogLog (approx_count_distinct, rsd=1%) —
    the 100 TB path where an exact distinct over ~10^9 words would
    shuffle the full token stream.
    """
    words = df.select(F.explode(tokens_col(text_col)).alias("word"))
    distinct = (
        F.countDistinct("word") if exact else F.approx_count_distinct("word", 0.01)
    )
    return words.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        distinct.alias("n_distinct_words"),
    )
