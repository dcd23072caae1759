"""Exact distributed order statistics — per-stratum quantiles of an
integer measure (document length, token count) computed as EXACT
k-th order statistics, not approximations. The corpus-report side of
a training-data pipeline: length/size distributions per source feed
mixture decisions, truncation budgets, and drift monitoring, and the
exact semantics keep the result oracle-able where
``percentile_approx`` sketches are not. (No analog in the reference
engine; training-data extension family, SURVEY.md §2.12.)

Scale shape (100 TB)
--------------------
The naive form — ``row_number() OVER (PARTITION BY source ORDER BY
value)`` — pins every stratum into ONE task; a dominant source (half
the crawl) serializes. This implementation nests the two-level
bucketed scan (operators/packing.py) inside each stratum:

1. per-stratum min/max (one tiny agg, broadcast back);
2. order-preserving VALUE-RANGE buckets within the stratum (equal
   values share a bucket, so the ``(value, doc_id)`` order is
   preserved across bucket boundaries);
3. intra-bucket ranks — a window PARTITIONED BY (stratum, bucket),
   parallel everywhere;
4. bucket prefix offsets from the O(strata x num_buckets) per-bucket
   counts (windows only over that tiny table), broadcast-joined back.

The quantile targets ``rank = floor(q * (n-1)) + 1`` touch one IEEE
multiply per (stratum, q) — identical in JVM and DuckDB — and the
final equi-join prunes the ranked corpus to |strata| x |quantiles|
rows. All other arithmetic is int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def length_quantiles(
    df: DataFrame,
    quantiles: tuple[float, ...] = (0.0, 0.25, 0.5, 0.75, 1.0),
    num_buckets: int = 64,
    value_col: str = "n_chars",
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-stratum quantiles of ``value_col``.

    For each stratum and each ``q``, emits the value at rank
    ``floor(q * (n-1)) + 1`` of the stratum's rows ordered by
    ``(value, doc_id)`` — the lower (type-1) empirical quantile, with
    q=0 the minimum and q=1 the maximum.

    Output: ``(source, q double, rank bigint, value bigint)`` ordered
    by ``(source, q)``.
    """
    t = df.select(
        F.col(stratum_col).alias("s"),
        F.col(value_col).cast("long").alias("v"),
        F.col(id_col).alias("doc_id"),
    )
    mm = t.groupBy("s").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    nb = F.lit(num_buckets)
    width = F.greatest(
        F.lit(1).cast("long"),
        F.floor((F.col("mx") - F.col("mn") + nb) / nb),  # ceil((mx-mn+1)/nb)
    )
    t = t.join(F.broadcast(mm), "s").select(
        "s", "v", "doc_id", F.floor((F.col("v") - F.col("mn")) / width).alias("b")
    )

    intra_w = Window.partitionBy("s", "b").orderBy("v", "doc_id")
    t = t.withColumn("r", F.row_number().over(intra_w).cast("long"))

    btot = t.groupBy("s", "b").agg(F.count("*").alias("bn"))
    # O(strata x num_buckets) rows: the only stratum-wide windows
    boff_w = (
        Window.partitionBy("s").orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = btot.select(
        "s",
        "b",
        F.coalesce(F.sum("bn").over(boff_w), F.lit(0).cast("long")).alias("boff"),
    )
    ranked = t.join(F.broadcast(boff), ["s", "b"]).select(
        "s", "v", (F.col("boff") + F.col("r")).alias("rk")
    )

    n = btot.groupBy("s").agg(F.sum("bn").alias("n"))
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    targets = n.crossJoin(F.broadcast(qdf)).select(
        "s",
        "q",
        (
            F.floor(F.col("q") * (F.col("n") - 1).cast("double")) + F.lit(1)
        ).cast("long").alias("rk"),
    )
    return (
        ranked.join(F.broadcast(targets), ["s", "rk"])
        .select(
            F.col("s").alias(stratum_col),
            "q",
            F.col("rk").alias("rank"),
            F.col("v").alias("value"),
        )
        .orderBy(stratum_col, "q")
    )
