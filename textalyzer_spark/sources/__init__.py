"""Source/sink layer (SURVEY.md §2.1)."""

from textalyzer_spark.sources.readers import (  # noqa: F401
    read_documents_parquet,
    read_text_corpus,
    write_documents,
)
