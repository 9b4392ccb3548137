"""Per-conversation sequence invariants.

The north rule's per-row invariant is text equality under a stable
``(conv_id, turn_idx)`` window ordering; these checks validate that such
an ordering is well-defined and temporally consistent:

- ``conversation_shape``: per-conv turn_idx contiguity (0..n-1, dense)
  and key duplication — pure two-phase aggregates (partial-combine safe).
- ``out_of_order_turns``: turns whose ts precedes an earlier turn's ts.
- ``text_parity``: per-turn text equality vs a reference table.

Scale notes: ``groupBy(conv_id)`` aggregates get map-side combine so
Zipfian conversation lengths only skew the *map* inputs, not the shuffle.
The ``Window.partitionBy(conv_id)`` in out_of_order_turns hashes whole
conversations to tasks — safe because a single conversation is bounded
(~10^4 turns) even when the table is 10^12; it never concentrates the
table on one task. AQE balances the residual per-task row-count skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_shape(df: DataFrame) -> DataFrame:
    """Per-conv: n_turns, n_keys (distinct turn_idx), min/max turn,
    has_dup (key collision), is_contiguous (dense 0..n-1)."""
    g = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count_distinct("turn_idx").alias("n_keys"),
        F.min("turn_idx").alias("min_turn"),
        F.max("turn_idx").alias("max_turn"),
    )
    return g.select(
        "conv_id",
        "n_turns",
        "n_keys",
        "min_turn",
        "max_turn",
        (F.col("n_turns") != F.col("n_keys")).alias("has_dup"),
        (
            (F.col("min_turn") == 0)
            & (F.col("max_turn") == F.col("n_keys") - 1)
            & (F.col("n_turns") == F.col("n_keys"))
        ).alias("is_contiguous"),
    )


def out_of_order_turns(df: DataFrame) -> DataFrame:
    """Rows whose ts is strictly below the max ts of any earlier turn
    (ordered by (turn_idx, ts) — the ts tie-break makes the preceding-max
    deterministic even under duplicate turn_idx)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx", "ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("_prev_max_ts", F.max("ts").over(w))
        .filter(F.col("ts") < F.col("_prev_max_ts"))
        .drop("_prev_max_ts")
    )


def text_parity(df: DataFrame, reference: DataFrame) -> DataFrame:
    """Per-turn text equality vs a reference table under the STABLE
    (conv_id, turn_idx) window ordering (BASELINE.json input_hint).

    Joining on the raw key would fan out under duplicate keys, so each
    side gets a positional sequence number from a
    ``Window.partitionBy(conv_id).orderBy(turn_idx, ts, text)`` —
    deterministic because fully-identical rows are interchangeable —
    and turns are compared position-by-position (full outer join;
    NULL-safe equality).
    """

    def seq(d: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts", "text")
        return d.select(
            "conv_id",
            "turn_idx",
            F.row_number().over(w).alias("seq"),
            F.col("text").alias(out),
        )

    a = seq(df, "text_actual")
    b = seq(reference, "text_expected").drop("turn_idx")
    joined = a.join(b, on=["conv_id", "seq"], how="full_outer")
    return joined.filter(~F.col("text_actual").eqNullSafe(F.col("text_expected")))
