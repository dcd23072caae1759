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

1. a composite sort key ``k = value * 256 + md5_first_byte(doc_id)``
   — the hash sub-key makes EQUAL-VALUE RUNS divisible (a point-mass
   stratum where most rows share one length would otherwise be an
   indivisible bucket pinning one window task) while staying monotone
   in ``value`` first, so the value found at any rank is identical to
   the plain ``(value, doc_id)`` order (the multiset of values in the
   first k positions is invariant under tie reordering);
2. order-preserving EQUI-DEPTH buckets within the stratum: boundaries
   are per-stratum sampled quantiles of ``k`` (one
   ``percentile_approx`` agg, broadcast back) — every bucket holds
   ~n_s/num_buckets rows for ANY value distribution, point masses and
   sparse outlier ranges alike;
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


def _bucketed(
    df: DataFrame,
    num_buckets: int,
    value_col: str,
    stratum_col: str,
    id_col: str,
) -> DataFrame:
    """``(s, v, doc_id, k, b)``: the composite sort key ``k``
    (value-major, md5-byte minor — point-mass value runs become
    divisible) and the per-stratum EQUI-DEPTH bucket ``b`` (count of
    the stratum's sampled ``k``-quantile boundaries strictly below
    ``k`` — monotone in ``k``, so buckets are contiguous ranges of the
    ``(k, doc_id)`` order and the two-level rank telescopes exactly).
    The ``*256`` shift is safe for any length-like measure; ANSI mode
    would surface an overflow loudly."""
    t = df.select(
        F.col(stratum_col).alias("s"),
        F.col(value_col).cast("long").alias("v"),
        F.col(id_col).alias("doc_id"),
    ).withColumn(
        "k",
        F.col("v") * F.lit(256)
        + F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
        ).cast("long"),
    )
    probs = [i / num_buckets for i in range(1, num_buckets)]
    if not probs:
        return t.withColumn("b", F.lit(0).cast("long"))
    bounds = t.groupBy("s").agg(
        F.percentile_approx("k", probs, 10_000).alias("_bs")
    )
    return (
        t.join(F.broadcast(bounds), "s")
        .withColumn(
            "b",
            F.aggregate(
                "_bs",
                F.lit(0),
                lambda acc, x: acc + F.when(F.col("k") > x, 1).otherwise(0),
            ).cast("long"),
        )
        .select("s", "v", "doc_id", "k", "b")
    )


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
    t = _bucketed(df, num_buckets, value_col, stratum_col, id_col)

    intra_w = Window.partitionBy("s", "b").orderBy("k", "doc_id")
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
