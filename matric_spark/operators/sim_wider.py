"""`sim_wider` (R/sim_wider.R:40-123): melt a long pair list back into a
wide symmetric similarity matrix.

Declared low-priority in SURVEY §7.4 (the engine is long-form
throughout), but the pivot is one groupBy().pivot() so it is included
for API completeness. The reference's row/column alignment invariant
(colnames == row order, R/sim_wider.R:71,92) is enforced by pivoting
over an explicit sorted id list — which also bounds the pivot width
(Spark materializes one column per distinct id2; this is a
small-population visualization op, NOT a 10^12-row op, and asserts so).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIVOT_IDS = 10_000


def sim_wider(
    sim: DataFrame,
    fill_diagonal: float | None = 1.0,
) -> DataFrame:
    """Wide symmetric matrix: one row per id1, one column per id2 (named
    by id value, sorted ascending), ordered by id1 so row k corresponds
    to column k (the reference's symmetry assertion)."""
    ids = [r[0] for r in sim.select("id1").union(sim.select("id2")).distinct().orderBy("id1").collect()]
    if len(ids) > MAX_PIVOT_IDS:
        raise ValueError(
            f"sim_wider is a small-population op ({len(ids)} ids > {MAX_PIVOT_IDS}); "
            "keep large similarity graphs in long form"
        )
    base = sim.select("id1", "id2", "sim")
    if fill_diagonal is not None:
        diag = (
            sim.sparkSession.createDataFrame([(i,) for i in ids], "id1 long")
            .withColumn("id2", F.col("id1"))
            .withColumn("sim", F.lit(float(fill_diagonal)))
        )
        base = base.unionByName(diag)
    wide = (
        base.groupBy("id1")
        .pivot("id2", ids)
        .agg(F.first("sim"))
        .orderBy("id1")
    )
    return wide
