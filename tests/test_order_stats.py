"""Exact distributed order statistics
(textalyzer_spark/operators/order_stats.py). Bucketed-rank vs naive
reference, tie handling, degenerate strata; cross-engine exactness
lives in the oracle gate (length_quantiles)."""

import math
import random

from textalyzer_spark.operators.order_stats import length_quantiles

QS = (0.0, 0.25, 0.5, 0.75, 1.0)


def _reference(rows, qs=QS):
    """Naive per-stratum type-1 quantiles: rank floor(q*(n-1))+1 of
    the (value, doc_id) order."""
    by_s = {}
    for s, v, d in rows:
        by_s.setdefault(s, []).append((v, d))
    want = {}
    for s, vals in by_s.items():
        vals.sort()
        n = len(vals)
        for q in qs:
            rk = math.floor(q * (n - 1)) + 1
            want[(s, q)] = (rk, vals[rk - 1][0])
    return want


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        [(s, v, d) for s, v, d in rows],
        "source string, n_chars bigint, doc_id bigint",
    )
    got = {}
    for r in length_quantiles(df, **kw).collect():
        got[(r["source"], r["q"])] = (r["rank"], r["value"])
    return got


def test_matches_naive_reference_random(spark):
    rng = random.Random(13)
    rows = [
        (f"s{rng.randrange(3)}", rng.randrange(0, 5000), i) for i in range(400)
    ]
    assert _run(spark, rows) == _reference(rows)


def test_ties_and_skewed_value_range(spark):
    # heavy ties (all values equal in one stratum) + one huge outlier
    # stratum (sparse range -> most buckets empty)
    rows = [("flat", 7, i) for i in range(50)]
    rows += [("sparse", v, i) for i, v in enumerate([0, 1, 2, 10**12])]
    assert _run(spark, rows, num_buckets=8) == _reference(rows)


def test_single_row_stratum(spark):
    rows = [("lonely", 42, 1), ("big", 1, 2), ("big", 2, 3)]
    got = _run(spark, rows)
    for q in QS:
        assert got[("lonely", q)] == (1, 42)
    assert got[("big", 0.0)] == (1, 1)
    assert got[("big", 1.0)] == (2, 2)


def test_point_mass_stratum_spreads_buckets(spark):
    """Skew pin: a stratum where 95% of rows share ONE value must not
    collapse into a single (s, b) window partition — the md5 sub-key
    inside the composite bucketing key splits the equal-value run.
    Output still matches the naive (value, doc_id)-order reference
    (rank->value is tie-order-insensitive)."""
    from pyspark.sql import functions as F

    rows = [("pm", 500, i) for i in range(950)]
    rows += [("pm", 100 + i, 1000 + i) for i in range(50)]
    assert _run(spark, rows, num_buckets=16) == _reference(rows)

    # bucket spread: the internal bucketing must split the 950-row
    # equal-value run across ~all 16 equi-depth buckets
    from textalyzer_spark.operators.order_stats import _bucketed

    df = spark.createDataFrame(
        rows, "source string, n_chars bigint, doc_id bigint"
    )
    counts = [
        r["cnt"]
        for r in _bucketed(df, 16, "n_chars", "source", "doc_id")
        .filter(F.col("v") == 500)
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    assert len(counts) >= 14  # ~every bucket holds part of the run
    assert max(counts) <= 2 * (1000 / 16)  # no mega-bucket


def test_bucket_count_invariance(spark):
    rng = random.Random(99)
    rows = [("s", rng.randrange(0, 100), i) for i in range(257)]
    assert _run(spark, rows, num_buckets=1) == _run(spark, rows, num_buckets=64)
