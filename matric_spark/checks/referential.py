"""Referential-integrity checks via broadcast anti-joins.

Reference lineage: ``sim_validate`` asserts ``all(x$id1 %in%
row_metadata$id)`` (R/sim_construct-validate.R:69-78) — a membership test
against a domain relation; matric's keep/drop filters are semi/anti joins
against predicate-by-example spec tables (R/sim_filter.R:49-103). The
graft checks ``role``/``tool`` membership in small domain tables.

Scale notes: the domain side is tiny → ``F.broadcast`` pins a broadcast
hash anti-join; zero shuffle of the 100 TB side, the check is a pure
map-side pass that rides the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _domain_df(spark: SparkSession, col: str, domain: Sequence[str] | DataFrame) -> DataFrame:
    if isinstance(domain, DataFrame):
        return domain.select(F.col(domain.columns[0]).alias(col))
    return spark.createDataFrame([(v,) for v in domain], f"{col} string")


def domain_violations(
    df: DataFrame,
    col: str,
    domain: Sequence[str] | DataFrame,
    nulls_ok: bool = True,
) -> DataFrame:
    """Rows whose ``col`` value is outside ``domain``.

    ``nulls_ok=True`` treats NULL as 'no value' (not a violation) — e.g.
    ``tool`` is legitimately NULL for non-tool turns; NULL-rate policing
    belongs to column_stats.
    """
    dom = _domain_df(df.sparkSession, col, domain)
    viol = df.join(F.broadcast(dom), on=col, how="left_anti")
    if nulls_ok:
        viol = viol.filter(F.col(col).isNotNull())
    return viol
