"""Structured Streaming jobs over a documents stream.

The reference has no streaming concepts (SURVEY.md §2.9); these wrap
the same batch operators for continuously-landing corpora: new parquet
files appearing under a directory are the stream. Aggregations run in
update/complete mode with checkpointing — the streaming-native
counterpart of the batch lineage/resume in lineage.py.

All transformations reuse the batch operator expressions — a pipeline
verified in batch is the same Catalyst plan under the streaming
microbatcher (Trigger.AvailableNow makes that literal: each test runs
the stream to completion over the current files and stops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from textalyzer_spark.functions.tokenize import tokens_col

DOCS_SCHEMA = "doc_id string, text string"


def _stream(spark: SparkSession, input_dir: str, schema: str = DOCS_SCHEMA) -> DataFrame:
    return spark.readStream.schema(schema).parquet(input_dir)


def streaming_word_frequency(spark: SparkSession, input_dir: str) -> DataFrame:
    """Running word-frequency over a document stream (complete-mode
    aggregation; same shape as the batch operator)."""
    docs = _stream(spark, input_dir)
    return (
        docs.select(F.explode(tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def streaming_quality_scores(spark: SparkSession, input_dir: str) -> DataFrame:
    """Per-document quality scores, append-mode (stateless projection
    — each document scores once on arrival)."""
    from textalyzer_spark.operators.quality import quality_score

    return quality_score(_stream(spark, input_dir))


def run_to_completion(
    stream_df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> list:
    """Drain all currently-available input (Trigger.AvailableNow) into
    an in-memory sink and return the result rows."""
    name = f"snk_{abs(hash(checkpoint_dir)) % 10**8}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}").collect()
