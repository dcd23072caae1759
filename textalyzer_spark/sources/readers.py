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
) -> DataFrame:
    """Directory of text files → ``(doc_id string, text string)``.

    Reference parity (file_utils.rs):
    * recursive walk (S2, :60-97) → ``recursiveFileLookup``; the
      gitignore semantics are a CLI-side concern with no Spark-source
      equivalent — use ``glob`` for inclusion filtering;
    * binary/invalid-UTF-8 rejection: files containing NUL or byte
      sequences that don't decode are dropped (S3, :134-144 — the
      decode check approximates Rust's strict validation by rejecting
      replacement characters);
    * empty files: the reference keeps them as empty-string entries
      (:122-128); Spark file sources skip zero-byte files. Documented
      deviation — an empty document contributes zero lines/tokens to
      every operator, so no analysis output differs (only the
      reference's "N files" CLI banner would).

    One task per file — for corpora of many small files prefer
    compacting into parquet first; this reader exists for
    reference-shaped workloads.
    """
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true" if recursive else "false"
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path).select(
        F.col("path").alias("doc_id"),
        F.decode(F.col("content"), "UTF-8").alias("text"),
    )
    if drop_binary:
        df = df.filter(
            ~F.col("text").contains("\x00") & ~F.col("text").contains("�")
        )
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
