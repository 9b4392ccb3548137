"""Event-stream operators over the `events` table: per-type stats and
gap-based sessionization.

Sessionization is the canonical window-chain pattern: lag(ts) per user →
boundary flag (gap > timeout) → running sum = session ordinal → one
aggregate per session. Single shuffle keyed on user_id; conversation/
user skew is handled by AQE (session.py). The same chain expressed over
event-time windows is the streaming variant (streaming/validate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_type_stats(events: DataFrame) -> DataFrame:
    """Per event_type: volume, distinct users, value stats + exact p95."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.avg("value").alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.expr("percentile(value, 0.95)").alias("p95_value"),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user → one row per session:
    (user_id, session_id, n_events, session_start, session_end,
    total_value). A new session starts when the time since the user's
    previous event exceeds `gap_minutes` (ties broken by event_id so the
    ordering — and thus session boundaries — is total and deterministic).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp (not a long cast): TIMESTAMP_NTZ has no direct
    # numeric cast; with the session tz pinned to UTC this equals
    # DuckDB's epoch(ts) on naive timestamps
    epoch = F.unix_timestamp(F.col("ts"))
    gap = epoch - F.lag(epoch).over(w)
    boundary = (
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    with_session = events.withColumn("_b", boundary).withColumn(
        "session_id",
        F.sum("_b").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum("value").alias("total_value"),
    )
