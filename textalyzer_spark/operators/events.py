"""Event-time operators over the ``events`` table (driver corpus).

The reference has no time concepts (SURVEY.md §2.9); these cover the
windowing surface a production metrics pipeline needs: tumbling
event-time aggregation and gap-based sessionization. Both are pure
Catalyst (window functions + one shuffle each) and SQL-replicable for
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    hours: int = 1,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time windows per key:
    ``(window_start, event_type, n_events, sum_value)``.

    One hash-aggregate shuffle on (window, key); in streaming mode the
    same expression runs under a watermark (see streaming/jobs.py).
    """
    win = F.window(F.col(ts_col), f"{hours} hour")
    return (
        events.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", key_col)
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions per user:
    ``(user_id, session_id, session_start, session_end, n_events)``.

    Classic gaps-and-islands: a session boundary opens where the gap
    to the previous event exceeds ``gap_minutes``; the running sum of
    boundaries numbers the sessions. One window shuffle on user_id —
    per-user state never leaves its partition, so this scales with the
    user-key cardinality (salt pathological power users upstream).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # TIMESTAMP_NTZ doesn't cast straight to long; go via timestamp —
    # the zone shift cancels in the difference
    secs = F.col(ts_col).cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_session = (
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    with_ids = events.withColumn(
        "session_id",
        F.sum(new_session).over(w).cast("bigint"),
    )
    return (
        with_ids.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(user_col, "session_id")
    )
