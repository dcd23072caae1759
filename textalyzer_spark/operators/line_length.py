"""Line-length histogram.

Reference: /root/reference/textalyzer/src/line_length.rs:13-37
(calculate_line_length_histogram) — buckets lines by terminal
display width (UnicodeWidthStr::width); ordering length asc
(line_length.rs:107-108). Fixtures: widths {5:2,6:1,7:1} and
Unicode "你好"→4, "🚀"→2 (line_length.rs:132-166).

Spark shape (SURVEY.md §3.3): explode lines → width → groupBy(width)
.count() → orderBy(width). The display-width variant needs one
Arrow-batched pandas UDF (no JVM built-in); the char-length variant
is pure codegen and is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from textalyzer_spark.functions.width import display_width_udf
from textalyzer_spark.operators.lines import explode_lines


def line_length_histogram(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_display_width: bool = True,
) -> DataFrame:
    """``(length int, count bigint)`` ordered length asc.

    ``use_display_width=False`` buckets by character count instead
    (JVM-only; exact for ASCII, and SQL-oracle-checkable).
    """
    lines = explode_lines(df, id_col, text_col)
    width = (
        display_width_udf(F.col("line"))
        if use_display_width
        else F.length("line").cast("int")
    )
    return (
        lines.select(width.alias("length"))
        .groupBy("length")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.asc("length"))
    )
