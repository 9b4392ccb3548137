"""Custom stateful streaming operator: event-time gap sessionization via
`applyInPandasWithState` — the one operator in the engine whose semantics
built-in windowed aggregation cannot express (session windows keyed on
per-user GAPS, not fixed grids; F.session_window covers the aggregate but
not arbitrary per-group state like open-session carryover with custom
emission).

Semantics match the batch operator (operators/events.sessionize): a new
session starts when the time since the user's previous event exceeds
`gap_minutes`; a session row is (user_id, session_start, session_end,
n_events, total_value). The streaming variant emits a session when it
CLOSES — either a later event for the same user arrives past the gap
(possibly in a later micro-batch), or the event-time watermark passes
session_end + gap (EventTimeTimeout). Each user's final, still-open
session stays in state until one of those happens, so at any point
emitted sessions are exactly the batch sessions that are provably closed
— the differential test asserts emitted ⊆ batch and batch-minus-open ⊆
emitted, with exact per-session values.

State per user is four scalars (start, last, n, total — epoch-micros
ints + a double), and the per-batch work is vectorized: boundary flags
from one numpy diff over the group's sorted events, per-session
aggregates from one pandas groupby — no per-row Python, per the north
rule. Late rows older than the watermark are dropped by Spark before
the operator (standard late-data semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_DDL = "start long, last long, n long, total double"  # micros since epoch


def stream_sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Stateful gap sessionization over a streaming events source
    (schema of the `events` table: event_id, ts, user_id, event_type,
    value, ...). Returns an append-mode stream of CLOSED sessions."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    def _emit(user_id, rows) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": np.int64(user_id),
                "session_start": pd.to_datetime(
                    [r[0] for r in rows], unit="us"
                ),
                "session_end": pd.to_datetime([r[1] for r in rows], unit="us"),
                "n_events": np.array([r[2] for r in rows], dtype=np.int64),
                "total_value": np.array([r[3] for r in rows], dtype=np.float64),
            }
        )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed session_end + gap: the open session is
            # provably closed (no on-time event can extend it)
            start, last, n, total = state.get
            state.remove()
            yield _emit(user_id, [(start, last, n, total)])
            return

        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        val = pdf["value"].to_numpy(dtype=np.float64)

        if state.exists:
            s_start, s_last, s_n, s_total = state.get
        else:
            s_start = s_last = None
            s_n, s_total = 0, 0.0

        # boundary = gap from the previous event (open state seeds the
        # first diff); session ordinal = cumsum; one groupby aggregates
        prev = np.concatenate(
            ([s_last if s_last is not None else np.iinfo(np.int64).min], ts[:-1])
        )
        sid = np.cumsum((ts - prev) > gap_us)
        g = (
            pd.DataFrame({"sid": sid, "ts": ts, "val": val})
            .groupby("sid", sort=True)
            .agg(start=("ts", "min"), last=("ts", "max"), n=("ts", "size"),
                 total=("val", "sum"))
        )
        sessions = [
            (int(r.start), int(r.last), int(r.n), float(r.total))
            for r in g.itertuples()
        ]
        if s_last is not None and sid[0] == 0:
            # first group continues the open session
            st, la, n, tot = sessions[0]
            sessions[0] = (s_start, la, n + s_n, tot + s_total)
        elif s_last is not None:
            # gap closed the carried-over session before this batch
            sessions.insert(0, (s_start, s_last, s_n, s_total))

        *closed, open_ = sessions
        state.update(open_)
        # fire once the watermark proves no on-time event can extend the
        # open session; must stay ahead of the current watermark
        state.setTimeoutTimestamp(
            max(open_[1] // 1000 + gap_ms + 1, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield _emit(user_id, closed)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stage_time_ordered(df: DataFrame, out_dir: str, n_files: int = 3,
                       ts_col: str = "ts") -> None:
    """Stage a bounded DataFrame as `n_files` parquet files holding
    contiguous, ascending event-time ranges, with strictly increasing
    mtimes so FileStreamSource (which orders files by (mtime, path))
    replays them in event-time order.

    This is the no-late-data precondition for deterministic streaming
    over a file source: each micro-batch's events are all >= the
    previous batch's max ts, so the watermark never drops a row, and
    the emitted-session set becomes a pure function of the data (the
    watermark only grows, so WHICH sessions time out by end-of-stream
    does not depend on when along the way they fired)."""
    import os
    import time

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    b = df.agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")).collect()[0]
    span = (b.hi - b.lo) / n_files
    cuts = [b.lo + span * i for i in range(1, n_files)]
    edges = [None, *cuts, None]
    for i in range(n_files):
        cond = F.lit(True)
        if edges[i] is not None:
            cond = cond & (F.col(ts_col) > edges[i])
        if edges[i + 1] is not None:
            cond = cond & (F.col(ts_col) <= edges[i + 1])
        before = set(os.listdir(out_dir))
        df.filter(cond).coalesce(1).write.mode("append").parquet(out_dir)
        stamp = time.time() - 1000 + i * 10
        for f in set(os.listdir(out_dir)) - before:
            if f.endswith(".parquet"):
                os.utime(os.path.join(out_dir, f), (stamp, stamp))


def stream_events(spark, input_dir: str, max_files_per_trigger: int = 1):
    """File-source stream over an events directory (parquet)."""
    ddl = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
