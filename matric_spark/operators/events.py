"""Event-stream operators over the `events` table: per-type stats,
gap-based sessionization, and the as-of (point-in-time) join.

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
    suffix: str = "_r",
) -> DataFrame:
    """As-of (backward) join: for each left row, attach the right row
    with the greatest `right_ts` <= left's `left_ts` (strictly < when
    `strict`) within the same `on` keys; left rows with no prior right
    row keep nulls (left-outer semantics). Matched right columns come
    back as `{right_ts}{suffix}` and `{c}{suffix}` for each value col.

    Scale shape — the union-scan formulation, NOT a join: both inputs
    are tagged and unioned, then ONE window pass per key carries the
    most recent right payload forward (`last(..., ignorenulls)` over a
    running frame). Cost is a single shuffle on `on` + a sort within
    key — no range-join explosion, no per-left-row probe, and skewed
    keys fall to AQE like any other window. A join-based formulation
    (l.ts >= r.ts then argmax) builds |L|x|R| per key before pruning;
    at event-log scale that is the difference between a linear pass and
    a quadratic blowup.

    Ties: right rows sharing (key, ts) are resolved to the one with the
    greatest value struct (deterministic, order-free). Rows where any
    `on` key or the timestamp is null never match (dropped from the
    right, kept unmatched on the left) — SQL ASOF semantics.

    Reference lineage: matric has no temporal joins (similarity pairs
    only); this is the standard streams/asof pattern (public: pandas
    merge_asof, DuckDB ASOF JOIN) re-expressed as a Spark window chain.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (*on, right_ts)
    ]
    ts_out = f"{right_ts}{suffix}"
    payload = F.struct(
        F.col(right_ts).alias(ts_out),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    # marker orders right rows before left at equal ts for inclusive
    # (<=) semantics, after left for strict (<)
    r_marker, l_marker = (1, 0) if strict else (0, 1)
    keys_ok = F.lit(True)
    for k in on:  # null keys never match
        keys_ok = keys_ok & F.col(k).isNotNull()
    other_left = [c for c in left.columns if c not in on]
    r = right.filter(F.col(right_ts).isNotNull() & keys_ok).select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(r_marker).alias("_m"),
        payload.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in other_left],
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(l_marker).alias("_m"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_m", F.col("_rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn(
        "_match", F.last("_rv", ignorenulls=True).over(w)
    )
    return matched.filter(F.col("_m") == l_marker).select(
        *left.columns,
        *[F.col(f"_match.{f}") for f in (ts_out,
                                         *[f"{c}{suffix}" for c in value_cols])],
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
