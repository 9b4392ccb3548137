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


def sim_wider_labeled(
    sim: DataFrame,
    annotation_col: str,
    fill_diagonal: float | None = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """`sim_wider` with the reference's display labels
    (R/sim_wider.R:74-123): rows/columns are renamed to unique
    "{annotation}:{i}" labels built from the sorted distinct
    (id, annotation) map, and the reference's map1 == map2 symmetry
    assertion (R/sim_wider.R:92) is enforced — both pair sides must
    carry identical (id, annotation) associations.

    `sim` must carry {annotation_col}1 / {annotation_col}2 columns (the
    sim_annotate(side="both") output). Returns (wide, map) where map is
    DataFrame[id, annotation, primary_key] — the reference's "map" attr
    as a first-class relation. Small-population visualization op, same
    MAX_PIVOT_IDS bound as sim_wider."""
    a1, a2 = f"{annotation_col}1", f"{annotation_col}2"
    map1 = sorted(
        (r[0], r[1]) for r in sim.select("id1", a1).distinct().collect()
    )
    map2 = sorted(
        (r[0], r[1]) for r in sim.select("id2", a2).distinct().collect()
    )
    if map1 != map2:
        raise ValueError(
            "sim_wider_labeled: (id, annotation) maps differ between pair "
            "sides — the similarity matrix is not symmetric (R/sim_wider.R:92)"
        )
    # "{annotation}:{seq}" over the (id, annotation)-sorted map
    # (R/sim_wider.R:94-104: paste(annotation, seq_along, sep=":"))
    labels = {
        id_: f"{ann}:{i}" for i, (id_, ann) in enumerate(map1, start=1)
    }
    by_str = {str(k): v for k, v in labels.items()}
    wide = sim_wider(sim, fill_diagonal=fill_diagonal)
    id_order = [c for c in wide.columns if c != "id1"]
    relabeled = wide.select(
        F.col("id1"),
        *[F.col(f"`{c}`").alias(by_str[c]) for c in id_order],
    )
    lab_expr = F.create_map(
        *[F.lit(x) for kv in labels.items() for x in kv]
    )[F.col("id1")]
    relabeled = relabeled.withColumn("id1", lab_expr).withColumnRenamed(
        "id1", "id"
    )
    map_df = sim.sparkSession.createDataFrame(
        [(labels[id_], ann, str(id_)) for id_, ann in map1],
        "id string, annotation string, primary_key string",
    )
    return relabeled, map_df
