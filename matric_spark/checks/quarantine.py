"""Quarantine splitter: route rows failing any ROW-LEVEL check out of
the clean stream, with reasons.

The actionable complement of the verdict table: verdicts say WHICH
partitions are bad, run_violations materializes the bad rows per check —
this produces the thing a pipeline actually ships, the CLEAN table, plus
a quarantine table carrying why each row was held (matric's construct-
validate split keeps invalid rows out of the SimFrame the same way,
R/sim_construct-validate.R:69-78; here the routing is row-granular).

Only row-attributable checks quarantine: domain membership, the
cross-field rule pack, duplicate-key membership, out-of-order
timestamps. Partition-level signals (drift, volume) can't name a row and
never should — a drifted cohort is re-weighted or investigated, not
row-dropped.

Scale shape: ONE scan + two windows (the composite key for duplicate
membership, the conversation for ordering) — both keyed by columns a
transcript table is naturally clustered on, and every flag thereafter is
a codegen expression. No joins: duplicate membership uses the same
join-free window formulation as checks/uniqueness.duplicate_row_counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from matric_spark.checks.suite import SuiteConfig


def _flags(df: DataFrame, cfg: SuiteConfig, rules) -> DataFrame:
    from matric_spark.checks.constraints import default_transcript_rules

    rules = rules if rules is not None else default_transcript_rules()
    key = cfg.key
    wk = Window.partitionBy(*key)
    wc = Window.partitionBy("conv_id").orderBy(
        F.asc_nulls_first("turn_idx"), F.asc_nulls_first("ts")
    )
    non_null_key = None
    for k in key:
        c = F.col(k).isNotNull()
        non_null_key = c if non_null_key is None else (non_null_key & c)

    bad_role = F.col("role").isNull() | ~F.col("role").isin(cfg.role_domain)
    bad_tool = F.col("tool").isNotNull() & ~F.col("tool").isin(cfg.tool_domain)
    rule_any: Column = F.lit(False)
    for r in rules:
        rule_any = rule_any | r.violated()
    dup_key = non_null_key & (F.count(F.lit(1)).over(wk) > 1)
    prev_max = F.max("ts").over(wc.rowsBetween(Window.unboundedPreceding, -1))
    ooo = F.col("ts") < prev_max

    return df.select(
        "*",
        bad_role.alias("_q_bad_role"),
        bad_tool.alias("_q_bad_tool"),
        F.coalesce(rule_any, F.lit(False)).alias("_q_rule"),
        F.coalesce(dup_key, F.lit(False)).alias("_q_dup_key"),
        F.coalesce(ooo, F.lit(False)).alias("_q_ooo"),
    )


_REASONS = ["bad_role", "bad_tool", "rule", "dup_key", "ooo"]


def quarantine(
    df: DataFrame,
    cfg: SuiteConfig | None = None,
    rules=None,
    granularity: str = "row",
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): quarantined rows carry a `reasons` string
    (comma-joined, deterministic order); clean rows are schema-identical
    to the input.

    granularity='conversation' holds EVERY turn of a conversation any of
    whose turns trips a check — the usual training-time policy (a
    conversation with one corrupt turn is not a valid training example;
    reasons then reflect the whole conversation's union). One extra
    window over conv_id, already the table's natural clustering.
    """
    if granularity not in ("row", "conversation"):
        raise ValueError(f"unknown granularity {granularity!r}")
    cfg = cfg or SuiteConfig()
    flagged = _flags(df, cfg, rules)
    if granularity == "conversation":
        wconv = Window.partitionBy("conv_id")
        flagged = flagged.select(
            *[c for c in flagged.columns if not c.startswith("_q_")],
            *[
                F.max(F.col(f"_q_{r}")).over(wconv).alias(f"_q_{r}")
                for r in _REASONS
            ],
        )
    any_bad = None
    for r in _REASONS:
        c = F.col(f"_q_{r}")
        any_bad = c if any_bad is None else (any_bad | c)
    reasons = F.concat_ws(
        ",", *[F.when(F.col(f"_q_{r}"), F.lit(r)) for r in _REASONS]
    )
    clean = flagged.filter(~any_bad).drop(*[f"_q_{r}" for r in _REASONS])
    quarantined = (
        flagged.filter(any_bad)
        .withColumn("reasons", reasons)
        .drop(*[f"_q_{r}" for r in _REASONS])
    )
    return clean, quarantined


def quarantine_summary(
    df: DataFrame, cfg: SuiteConfig | None = None, rules=None
) -> DataFrame:
    """Per-partition routing report: (part, n_rows, n_quarantined,
    n_clean, n_<reason>...). Multi-reason rows count once in
    n_quarantined and once per reason column."""
    cfg = cfg or SuiteConfig()
    flagged = _flags(df, cfg, rules)
    any_bad = None
    for r in _REASONS:
        c = F.col(f"_q_{r}")
        any_bad = c if any_bad is None else (any_bad | c)
    return flagged.groupBy(
        F.col(cfg.partition_col).alias("part")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(any_bad.cast("long")).alias("n_quarantined"),
        F.sum((~any_bad).cast("long")).alias("n_clean"),
        *[
            F.sum(F.col(f"_q_{r}").cast("long")).alias(f"n_{r}")
            for r in _REASONS
        ],
    )
