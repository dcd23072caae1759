"""Checkpoint/resume with per-partition lineage (north_rule):
a killed run must resume without recomputing completed buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from textalyzer_spark.lineage import BatchKilled, read_lineage, run_with_lineage


def _transform(part):
    # a representative tokenize+metrics stage; must keep 'bucket'
    from textalyzer_spark.functions.tokenize import tokens_col

    return part.select(
        "doc_id",
        "bucket",
        F.size(tokens_col("text")).alias("n_tokens"),
    )


def _corpus(spark, n=200):
    return spark.createDataFrame(
        [(f"doc{i}", f"word{i} alpha beta gamma num{i % 7}") for i in range(n)],
        "doc_id string, text string",
    )


def test_full_run_and_lineage(spark, tmp_path):
    out_dir = str(tmp_path / "run1")
    df = _corpus(spark)
    result = run_with_lineage(df, _transform, out_dir, n_buckets=8, batches=2)
    assert result.count() == 200
    lin = read_lineage(spark, out_dir)
    assert lin.count() == 8  # every bucket checkpointed
    assert lin.agg(F.sum("n_rows")).collect()[0][0] == 200
    # per-bucket timings are MEASURED (distinct per bucket), not the
    # batch elapsed copied onto every row; batch compute is shared
    rows = lin.collect()
    assert all(r["bucket_seconds"] > 0 for r in rows)
    assert len({r["bucket_seconds"] for r in rows}) == 8
    assert len({r["batch_seconds"] for r in rows}) == 2  # one per batch


def test_kill_and_resume_skips_completed(spark, tmp_path):
    out_dir = str(tmp_path / "run2")
    df = _corpus(spark)
    with pytest.raises(BatchKilled):
        run_with_lineage(
            df, _transform, out_dir, n_buckets=8, batches=4, fail_after_batches=2
        )
    done_before = {r["bucket"] for r in read_lineage(spark, out_dir).collect()}
    assert 0 < len(done_before) < 8  # partially complete

    # resume: completes the rest without duplicating finished buckets
    result = run_with_lineage(df, _transform, out_dir, n_buckets=8, batches=4)
    assert result.count() == 200
    assert result.select("doc_id").distinct().count() == 200
    lin = read_lineage(spark, out_dir)
    assert {r["bucket"] for r in lin.collect()} == set(range(8))
    # lineage rows are append-only: completed buckets appear exactly once
    assert lin.groupBy("bucket").count().filter(F.col("count") > 1).count() == 0


def test_resume_noop_when_complete(spark, tmp_path):
    out_dir = str(tmp_path / "run3")
    df = _corpus(spark, n=50)
    run_with_lineage(df, _transform, out_dir, n_buckets=4, batches=2)
    # second invocation finds nothing to do and returns the same output
    result = run_with_lineage(df, _transform, out_dir, n_buckets=4, batches=2)
    assert result.count() == 50
    assert read_lineage(spark, out_dir).count() == 4
