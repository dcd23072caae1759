"""Event-time operators: tumbling windows, sessionization, and the
streaming watermark variant."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from textalyzer_spark.operators.events import sessionize, tumbling_counts


def _events(spark):
    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 100, "click", 1.0),
        (2, base + dt.timedelta(minutes=10), 100, "click", 2.0),
        (3, base + dt.timedelta(minutes=50), 100, "view", 3.0),   # same session (gap 40>30? no: 40min gap > 30 → NEW session)
        (4, base + dt.timedelta(hours=3), 100, "click", 4.0),      # new session
        (5, base + dt.timedelta(minutes=5), 200, "view", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def test_tumbling_counts(spark):
    out = tumbling_counts(_events(spark)).collect()
    got = {(r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"]) for r in out}
    assert got == {
        (10, "click"): (2, 3.0),
        (10, "view"): (2, 8.0),
        (13, "click"): (1, 4.0),
    }


def test_sessionize(spark):
    out = sessionize(_events(spark), gap_minutes=30).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    # user 100: events at +0,+10 (one session), +50 (gap 40min → new),
    # +3h (new) → sessions of sizes [2,1,1]; user 200: [1]
    assert per_user[100] == [2, 1, 1]
    assert per_user[200] == [1]


def test_streaming_windowed_counts_with_watermark(spark, tmp_path):
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    _events(spark).write.parquet(inp)
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
        )
        .parquet(inp)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    from textalyzer_spark.streaming.jobs import run_to_completion

    rows = run_to_completion(stream, ckpt, output_mode="append")
    # append mode emits only watermark-closed windows; with a single
    # microbatch the final watermark closes the 10:00 window (max ts
    # 13:00 - 1h = 12:00 > 11:00) but not the 13:00 window
    got = {(r["w"].start.hour, r["event_type"]): r["n_events"] for r in rows}
    assert got == {(10, "click"): 2, (10, "view"): 2}
