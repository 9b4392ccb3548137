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
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the
    greatest `right_ts` <= left's `left_ts` (direction='backward', the
    default; strictly < when `strict`) or the smallest `right_ts` >=
    `left_ts` (direction='forward'; strictly > when `strict`) within
    the same `on` keys; left rows with no matching right row keep nulls
    (left-outer semantics). Matched right columns come back as
    `{right_ts}{suffix}` and `{c}{suffix}` for each value col.

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
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction!r}")
    # marker orders right rows before left at equal ts for inclusive
    # semantics, after left for strict; 'forward' is 'backward' run over
    # a time-reversed ordering (same single-shuffle window)
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
    # forward = time-reversed backward; null-ts left rows sort FIRST in
    # either direction so their frame holds no right rows (never match)
    ts_ord = (
        F.col("_ts").asc_nulls_first()
        if direction == "backward"
        else F.col("_ts").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_ord, "_m", F.col("_rv").asc_nulls_first())
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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    start: str = "session_start",
    end: str = "session_end",
    right_ts: str = "ts",
    bucket_minutes: int = 60,
) -> DataFrame:
    """Range (interval-containment) join: every (left, right) pair with
    the same `on` keys and `start` <= right's `right_ts` <= `end`
    (inclusive both ends). Result carries all left columns plus the
    right's non-key columns.

    Scale shape — the BUCKETIZED range join: naively this is an
    inequality join, which Spark can only execute as a per-key cross
    product filtered after the fact (quadratic in rows-per-key, and a
    BroadcastNestedLoopJoin when the key is omitted). Instead, time is
    quantized into `bucket_minutes` buckets; each left interval explodes
    into the buckets it spans, each right row lands in exactly one
    bucket, and the join becomes an EQUI-join on (keys..., bucket) with
    an exact containment filter after it. Cost: |L| x avg-span/bucket
    exploded rows — tunable; buckets also break up hot keys, since the
    shuffle key is (key, bucket). No dedup pass is needed because the
    right side is never exploded. Pick bucket_minutes near the median
    interval length: too small explodes left, too large degenerates
    toward per-key cross products.

    Rows with a null key, bound, or timestamp never match (dropped).
    Reference lineage: none in matric; standard public range-join
    bucketing (e.g. Spark's own range-join hints on Delta, Flink
    interval joins) expressed with plain DataFrame ops.
    """
    width = int(bucket_minutes) * 60
    lb = F.floor(F.unix_timestamp(F.col(start)) / width)
    ub = F.floor(F.unix_timestamp(F.col(end)) / width)
    l = left.filter(
        F.col(start).isNotNull() & F.col(end).isNotNull()
        & (F.col(end) >= F.col(start))
    ).withColumn("_b", F.explode(F.sequence(lb, ub)))
    r = right.filter(F.col(right_ts).isNotNull()).withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(right_ts)) / width)
    )
    rename = {
        c: f"{c}_r" for c in right.columns
        if c not in on and c in left.columns
    }
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    ts_col = rename.get(right_ts, right_ts)
    return (
        l.join(r, [*on, "_b"])
        .filter(
            (F.col(ts_col) >= F.col(start)) & (F.col(ts_col) <= F.col(end))
        )
        .drop("_b")
    )


def rolling_stats(
    events: DataFrame,
    window_seconds: int = 7 * 86400,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-event trailing-window aggregates (feature-engineering staple:
    "activity in the last 7 days as of each event") ->
    DataFrame[event_id, user_id, ts, roll_n, roll_sum, roll_mean].

    Uses a RANGE frame over integer epoch-seconds, so the frame is
    value-based: rows tying on the ordering key are peers and always
    share a frame, making the result independent of intra-second tie
    order. Epoch is floor(seconds) on both engines (Spark unix_timestamp
    == DuckDB CAST(floor(epoch(ts)) AS BIGINT) with the session tz pinned
    to UTC), so frame boundaries agree exactly despite microsecond ts.

    Scale shape: one shuffle keyed on `partition_col`; each partition is
    one user's history (bounded), sorted once, frames computed by the
    JVM's sliding-window aggregator — no self-join, no |E|×|E| range
    join. Skewed users fall to AQE.
    """
    sec = F.unix_timestamp(F.col(ts_col))
    w = (
        Window.partitionBy(partition_col)
        .orderBy("_sec")
        .rangeBetween(-window_seconds, 0)
    )
    return (
        events.withColumn("_sec", sec)
        .select(
            "event_id",
            partition_col,
            ts_col,
            F.count(F.lit(1)).over(w).alias("roll_n"),
            F.sum(value_col).over(w).alias("roll_sum"),
            F.avg(value_col).over(w).alias("roll_mean"),
        )
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


def funnel(
    events: DataFrame,
    steps: list[str],
    max_gap_s: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Anchored greedy funnel: per user, match `steps` as a strict-time
    subsequence — step k+1 must occur strictly after the matched step k
    (and within ``max_gap_s`` seconds of it, if set); the FIRST eligible
    event is taken and never re-anchored (the standard analytics-funnel
    semantics, identical to a chain of earliest-next-step joins).
    Returns one row per step: (step_idx, step, n_users reached).

    Spark-first formulation: per-user event lists are small (a user's
    own events), so the whole state machine runs as ONE codegen
    F.aggregate over the array_sort-ed (epoch_us, type) structs — no
    UDF, no per-step join chain (k joins → one shuffle), no driver loop.
    The shuffle is groupBy(user) on pre-projected (user, epoch_us, type)
    rows filtered to the funnel's event types; time is compared in exact
    integer microseconds (unix_micros ≡ DuckDB epoch_us) so engine
    parity is bitwise.
    """
    n = len(steps)
    ev = events.filter(
        F.col(type_col).isin(steps)
        & F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        # NTZ → TZ cast is exact under the session's pinned-UTC tz, so
        # unix_micros ≡ DuckDB epoch_us bit-for-bit
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_e"),
        F.col(type_col).alias("_t"),
    )
    per = ev.groupBy("_u").agg(
        F.array_sort(F.collect_list(F.struct("_e", "_t"))).alias("_seq")
    )

    def want_type(k: Column) -> Column:
        expr = F.lit(steps[0])
        for i in range(1, n):
            expr = F.when(k == i, F.lit(steps[i])).otherwise(expr)
        return expr

    def advance(acc: Column, x: Column) -> Column:
        type_ok = (acc["k"] < n) & (x["_t"] == want_type(acc["k"]))
        time_ok = x["_e"] > acc["last"]
        if max_gap_s is not None:
            time_ok = time_ok & (
                x["_e"] <= acc["last"] + F.lit(max_gap_s * 1_000_000)
            )
        adv = type_ok & F.when(acc["k"] == 0, F.lit(True)).otherwise(time_ok)
        return F.struct(
            F.when(adv, acc["k"] + 1).otherwise(acc["k"]).alias("k"),
            F.when(adv, x["_e"]).otherwise(acc["last"]).alias("last"),
        )

    init = F.struct(
        F.lit(0).alias("k"), F.lit(None).cast("long").alias("last")
    )
    reached = per.select(
        F.aggregate("_seq", init, advance)["k"].alias("_r")
    )
    # coalesce: a global agg over zero users yields NULL sums; the
    # funnel's answer is 0, matching the oracle's count(*)
    counts = reached.agg(
        *[
            F.coalesce(
                F.sum((F.col("_r") >= k).cast("long")), F.lit(0)
            ).alias(f"_s{k}")
            for k in range(1, n + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("step_idx"),
                F.lit(steps[k - 1]).alias("step"),
                F.col(f"_s{k}").alias("n_users"),
            )
            for k in range(1, n + 1)
        ]
    )
    return counts.select(F.explode(rows).alias("x")).select("x.*")


def retention(
    events: DataFrame,
    period_s: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users bucketed by their FIRST-activity period
    (cohort), then counted per (cohort, offset) where offset = periods
    since the cohort period → (cohort, offset, n_users, retention).
    retention = n_users / cohort size (offset 0 row is the size itself,
    retention 1.0).

    Period indexes are integer floor(epoch_us / period_us) — calendar-
    free, so both engines bucket identically with no tz/week-start
    semantics to reconcile.

    Shape: one distinct over (user, period), one per-user min, one
    user-keyed equi-join, one (cohort, offset) rollup. Cohort sizes come
    from `first` directly (every user is by definition active in their
    own min period, so |cohort| = users with that min) — NOT by
    re-filtering the rollup, which would re-execute the whole
    distinct+join subplan a second time.
    """
    pu = period_s * 1_000_000
    e = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / pu).alias(
            "_p"
        ),
    )
    active = e.distinct()
    first = active.groupBy("_u").agg(F.min("_p").alias("cohort"))
    per = (
        active.join(first, "_u")
        .groupBy("cohort", (F.col("_p") - F.col("cohort")).alias("offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    size = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("_size"))
    return per.join(F.broadcast(size), "cohort").select(
        "cohort",
        "offset",
        "n_users",
        (
            F.round(F.col("n_users") / F.col("_size").cast("double"), 6)
            + F.lit(0.0)
        ).alias("retention"),
    )
