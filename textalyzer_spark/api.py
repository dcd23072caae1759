"""Convenience library API mirroring the reference's public surface
(/root/reference/textalyzer/src/lib.rs:1-6 and
textalyzer-wasm/src/lib.rs:10-24: ``get_freq_map``, ``get_dup_lines``
over a single in-memory text).

These wrap the DataFrame operators for single-text / small-corpus
callers (tests, notebooks, the WASM-analog use case); the engine
proper is the operators package.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from textalyzer_spark.formatting import duplication_json, frequency_json


def get_freq_map(spark: SparkSession, text: str) -> dict[str, int]:
    """Word-frequency map of one text (wasm get_freq_map analog)."""
    from textalyzer_spark.operators.frequency import word_frequency

    df = spark.createDataFrame([("textarea", text)], "doc_id string, text string")
    return {r["word"]: r["count"] for r in word_frequency(df).collect()}


def get_freq_json(spark: SparkSession, text: str) -> str:
    """JSON form, sorted (count desc, word asc) like lib.rs:41-49."""
    return frequency_json(list(get_freq_map(spark, text).items()))


def get_dup_lines(spark: SparkSession, text: str) -> str:
    """Single-line duplications of one text as JSON
    (wasm get_dup_lines analog; the pseudo-file is named "textarea"
    like textalyzer-wasm/src/lib.rs:17)."""
    from textalyzer_spark.operators.duplication import duplicate_lines

    df = spark.createDataFrame([("textarea", text)], "doc_id string, text string")
    rows = duplicate_lines(df).collect()
    return duplication_json(
        [
            (r["content"], [(l["doc_id"], l["line"]) for l in r["locations"]])
            for r in rows
        ]
    )


def duplication(
    spark: SparkSession, texts: dict[str, str], min_lines: int = 3
) -> list[tuple[str, list[tuple[str, int]]]]:
    """Multi-line duplication over named texts (run() analog,
    lib.rs:57-151)."""
    from textalyzer_spark.operators.duplication import duplicate_blocks

    df = spark.createDataFrame(
        list(texts.items()), "doc_id string, text string"
    )
    return [
        (r["content"], [(l["doc_id"], l["line"]) for l in r["locations"]])
        for r in duplicate_blocks(df, min_lines=min_lines).collect()
    ]


def duplication_report(
    spark: SparkSession,
    texts: dict[str, str],
    min_lines: int = 3,
    files_only: bool = False,
) -> str:
    """Rendered duplication output (the reference CLI's duplication
    command, output.rs:38-127 incl. the --files-only mode) over named
    texts — resolve, then format."""
    from textalyzer_spark.formatting import format_duplications

    return format_duplications(
        duplication(spark, texts, min_lines=min_lines), files_only=files_only
    )
