"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine implementation lives in ``textalyzer_spark/``; this module is
a thin registry binding operators from SURVEY.md §2 to the driver's
flat ``documents``/``embeddings`` parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from textalyzer_spark.shipping import ship_package

    ship_package(spark)  # make UDF modules importable on python workers
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from textalyzer_spark.shipping import ship_package

    ship_package(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# queries — each (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


def q_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency histogram (SURVEY §2 A1/O2)."""
    from textalyzer_spark.operators.frequency import word_frequency

    return word_frequency(_docs(spark, sf_dir), "text")


def q_line_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line char-length histogram (SURVEY §2 A2/O6; oracle-able variant —
    display-width variant is checked in pytest against Unicode fixtures)."""
    from textalyzer_spark.operators.line_length import line_length_histogram

    return line_length_histogram(_docs(spark, sf_dir), use_display_width=False)


def q_shingle_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-token shingles occurring in more than one document — the seed
    stage of multi-line duplication (SURVEY §2 J1/A3/A4) applied to the
    flat corpus (token shingles stand in for line shingles)."""
    from textalyzer_spark.operators.shingles import token_shingle_duplicates

    return token_shingle_duplicates(_docs(spark, sf_dir), k=3)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "word_frequency": q_word_frequency,
    "line_length": q_line_length,
    "shingle_dup": q_shingle_dup,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_word_frequency(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect ANSI SQL equivalents over the same parquet views."""
    return {
        "word_frequency": """
            SELECT w AS word, count(*) AS count
            FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
              FROM documents
            )
            GROUP BY w
            ORDER BY count DESC, word ASC
        """,
        "line_length": """
            SELECT CAST(length(line) AS INTEGER) AS length, count(*) AS count
            FROM (
              SELECT unnest(string_split(regexp_replace(text, '\n$', ''), chr(10))) AS line
              FROM documents WHERE length(text) > 0
            )
            GROUP BY 1
            ORDER BY 1
        """,
        "shingle_dup": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w,
                     generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1) AS pos
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
              FROM toks
              WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
            )
            SELECT shingle, count(*) AS n_occurrences,
                   count(DISTINCT doc_id) AS n_docs
            FROM sh WHERE shingle IS NOT NULL
            GROUP BY shingle HAVING count(DISTINCT doc_id) > 1
            ORDER BY n_occurrences DESC, shingle ASC
        """,
    }
