"""Sources and sinks (SURVEY.md §2.1, S1-S6).

The reference walks directories with ignore rules, mmaps each file,
rejects binary/invalid-UTF-8 content, and tolerates empty files
(/root/reference/textalyzer/src/file_utils.rs:60-180). Spark replaces
the hand-rolled walk+mmap+rayon pipeline with a parallel file-source
scan; the behavioral guards are reproduced as declarative filters.

The canonical big-data source is a (doc_id, spans) table — Iceberg on
a real deployment, plain parquet in this sandbox (the Iceberg runtime
jar is not available here; `write_documents` keeps the same layout and
partition spec so swapping `format("iceberg")` in is a one-liner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    drop_binary: bool = True,
    include_empty: bool = True,
    use_ignore_rules: bool = False,
) -> DataFrame:
    """Directory of text files → ``(doc_id string, text string)``.

    Reference parity (file_utils.rs):
    * recursive walk (S2, :60-97) → ``recursiveFileLookup``; with
      ``use_ignore_rules=True`` the listing instead runs driver-side
      honoring .gitignore/.ignore + .git-skip (sources/listing.py —
      file LISTING is a driver-side step in Spark's own sources too,
      only reads are distributed);
    * binary/invalid-UTF-8 rejection: files containing NUL or byte
      sequences that don't decode are dropped (S3, :134-144 — the
      decode check approximates Rust's strict validation by rejecting
      replacement characters);
    * empty files: the reference keeps them as empty-string entries
      (:122-128); Spark's binaryFile source skips zero-byte files, so
      ``include_empty=True`` unions them back from a driver-side
      listing (zero distributed work — they have no bytes to read).

    One task per file — for corpora of many small files prefer
    compacting into parquet first; this reader exists for
    reference-shaped workloads.
    """
    import os

    from textalyzer_spark.sources.listing import (
        list_empty_files,
        list_files_with_ignore_rules,
    )

    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true" if recursive else "false"
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if use_ignore_rules:
        kept = list_files_with_ignore_rules(path)
        if glob:
            import fnmatch

            kept = [p for p in kept if fnmatch.fnmatch(os.path.basename(p), glob)]
        nonempty = [p for p in kept if os.path.getsize(p) > 0]
        empties = [p for p in kept if os.path.getsize(p) == 0]
        df = reader.load(nonempty) if nonempty else None
    else:
        empties = list_empty_files(path, recursive) if include_empty else []
        if glob:
            import fnmatch

            empties = [
                p for p in empties if fnmatch.fnmatch(os.path.basename(p), glob)
            ]
        df = reader.load(path)
    if df is not None:
        df = df.select(
            F.col("path").alias("doc_id"),
            F.decode(F.col("content"), "UTF-8").alias("text"),
        )
        if drop_binary:
            df = df.filter(
                ~F.col("text").contains("\x00") & ~F.col("text").contains("�")
            )
    if include_empty and empties:
        # mirror binaryFile's URI-shaped path column
        rows = [(f"file:{os.path.abspath(p)}", "") for p in empties]
        empty_df = spark.createDataFrame(rows, "doc_id string, text string")
        df = empty_df if df is None else df.unionByName(empty_df)
    if df is None:
        df = spark.createDataFrame([], "doc_id string, text string")
    return df


def read_documents_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Flat documents table from parquet (column pruning + predicate
    pushdown come from the format; nothing to do here)."""
    return spark.read.parquet(path)


def write_documents(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    bucket_col: str | None = "doc_id",
    n_buckets: int = 32,
) -> None:
    """Write a documents-shaped table partitioned by a salted bucket of
    ``bucket_col`` — the layout the lineage/resume machinery and the
    co-located joins key on. Iceberg swap-in: ``df.writeTo(tbl)
    .partitionedBy(bucket(n, col)).createOrReplace()``."""
    out = df
    if bucket_col is not None:
        out = df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col(bucket_col).cast("string")), F.lit(n_buckets)).cast(
                "int"
            ),
        )
        out.write.mode(mode).partitionBy("bucket").parquet(path)
    else:
        out.write.mode(mode).parquet(path)
