"""Structured Streaming variants (the reference is batch-only —
SURVEY.md §2.9; these exist for continuously-arriving corpora)."""

from textalyzer_spark.streaming.jobs import (  # noqa: F401
    streaming_quality_scores,
    streaming_word_frequency,
)
