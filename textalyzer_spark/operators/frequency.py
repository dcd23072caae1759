"""Word-frequency histogram.

Reference: /root/reference/textalyzer/src/frequency.rs:34-45
(generate_frequency_map) + JSON ordering at
/root/reference/textalyzer/src/lib.rs:41-47 (count desc, word asc —
we adopt that pinned total order everywhere; the reference's
text-mode tie order is HashMap-nondeterministic, SURVEY.md §2.6 O1).

Spark shape (SURVEY.md §3.1): scan → tokenize → explode →
groupBy(word).count() → orderBy. One shuffle; Catalyst plants a
partial HashAggregate before the exchange (the reference hand-rolls
the same combiner pattern with rayon thread-local maps,
duplication.rs:92-108).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from textalyzer_spark.functions.tokenize import tokens_col, tokens_udf


def word_frequency(
    df: DataFrame,
    text_col: str = "text",
    use_pandas_udf: bool = False,
) -> DataFrame:
    """``(word string, count bigint)`` ordered count desc, word asc.

    ``use_pandas_udf=True`` routes tokenization through the
    Arrow-batched Rust-parity UDF; the default stays fully JVM-side
    (whole-stage codegen, ~3x faster, identical on ASCII corpora).
    """
    toks = tokens_udf(F.col(text_col)) if use_pandas_udf else tokens_col(text_col)
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("word"))
    )


def char_frequency(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Relative character frequency of alphabetic characters:
    ``(ch string, count bigint, rel_freq double)`` ordered count desc,
    ch asc; rel_freq rounded to 6 decimals.

    Reference analog: the dormant
    ``languages/english/relative-character-frequency.tsv`` asset
    (referenced nowhere in the reference's code — SURVEY.md §0); this
    operator is what that asset implies: the a-z relative-frequency
    profile of a corpus, the input to frequency-based language/cipher
    analysis.
    """
    chars = df.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z]+", ""), "")
        ).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("ch").agg(F.count(F.lit(1)).alias("count"))
    total = counts.agg(F.sum("count").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "ch",
            "count",
            F.round(F.col("count") / F.col("total").cast("double"), 6).alias(
                "rel_freq"
            ),
        )
        .orderBy(F.desc("count"), F.asc("ch"))
    )


def frequency_scalars(freq: DataFrame) -> DataFrame:
    """Formatting scalars (max count / widths) for the bar renderer.

    Reference: frequency.rs:51-66. One-row DataFrame; callers
    broadcast-crossJoin it rather than collecting per-partition.
    """
    from textalyzer_spark.functions.width import display_width_udf

    return freq.agg(
        F.max("count").alias("max_count"),
        F.max(display_width_udf(F.col("word"))).alias("max_word_width"),
        F.max(F.length(F.format_string("%d", F.col("count")))).alias("max_count_width"),
    )
