"""Per-partition column statistics in ONE aggregation pass.

Generalizes the reference's single-pass NA accounting
(``preprocess_data``, R/utils.R:97-120 — one summarise over all columns)
and its per-group mean/sd background stats (R/sim_metrics.R:391-404).

Scale notes: a single ``groupBy(partition).agg(...)`` with N stat
expressions is one shuffle of pre-aggregated partials regardless of column
count — at 100 TB the scan dominates and every stat rides the same scan.
Column pruning keeps the parquet read to exactly the referenced columns
(verify with ``.explain``: ReadSchema lists only these). Exact distinct
counts force a second shuffle keyed by the value, so the scale path uses
``approx_count_distinct`` (HLL, mergeable partials); ``exact_distinct``
exists for oracle parity at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.ShortType, T.DecimalType)


def column_stats(
    df: DataFrame,
    partition_col: str,
    columns: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per ``partition_col`` group: row count; per column: null count +
    null rate, min/max; mean for numeric columns; avg length for strings;
    (approx) distinct count for ``distinct_cols``.

    Output column naming: ``<col>_nulls``, ``<col>_null_rate``,
    ``<col>_min``, ``<col>_max``, ``<col>_mean``, ``<col>_avg_len``,
    ``<col>_distinct`` — stable, oracle-friendly aliases.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or [c for c in df.columns if c != partition_col]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
        aggs.append(
            (F.sum(F.col(c).isNull().cast("double")) / F.count(F.lit(1))).alias(
                f"{c}_null_rate"
            )
        )
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).alias(f"{c}_min"))
            aggs.append(F.max(c).alias(f"{c}_max"))
            aggs.append(F.avg(c).alias(f"{c}_mean"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.avg(F.length(c)).alias(f"{c}_avg_len"))
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            aggs.append(F.min(c).alias(f"{c}_min"))
            aggs.append(F.max(c).alias(f"{c}_max"))
    for c in distinct_cols or []:
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}_distinct"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}_distinct"))
    return df.groupBy(partition_col).agg(*aggs)
