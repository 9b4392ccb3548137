"""Deterministic cellhealth-analog fixture: the reference's packaged
198-row dataset re-created in SHAPE (schema + cardinalities + cohort
structure), with synthetic-but-structured feature values.

matric ships `cellhealth` (data-raw/cellhealth.R:1-45): 3 feature
doubles + Metadata_{Plate, Well, cell_line, gene_name, pert_name},
3 cell lines x 3 plates, genes = 3 picks + {EMPTY, Chr2}, at most 2 rows
per (Plate, cell_line, gene, pert) stratum — and pins hard-coded metric
means on it (tests/testthat/test-sim_metrics.R:87-182). The real CSV
lives behind a network fetch, so the graft commits a fixture with the
same shape instead: 3 cell lines x 3 plates x (3 genes x 2 perts x 2
replicates + Chr2 x 8 replicates + EMPTY x 2) = 198 rows exactly. The
Chr2 reference gets 8 wells per (line, plate) so the per-row background
cohort is 8 pairs (the packaged cellhealth averages 10.8) — with only 2
the background sd of 2 cosines is degenerate and z-scores explode.

Feature model (all math seeded, order-fixed -> bit-reproducible):
  f_j(row) = effect_j(cell_line, gene, pert) + 0.15 * plate_idx
             + 0.75 * noise_j(row)
with effects and noise drawn from numpy RandomState(42) in a single
fixed construction order. Replicates of a stratum share the effect and
differ by noise, so replicate cosine > background cosine — the metric
layer sees realistic signal/background separation, not degenerate 1.0s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CELL_LINES = ["A549", "ES2", "HCC44"]
PLATES = ["SQ00014610", "SQ00014611", "SQ00014612"]
GENES = ["AKT1", "ARID1B", "ATF4"]
PERTS_PER_GENE = 2
N_FEATURES = 3

FEATURE_COLS = [
    "Cells_AreaShape_Compactness",
    "Cells_AreaShape_Extent",
    "Cells_AreaShape_Zernike_0_0",
]
ANNOTATION_COLS = [
    "Metadata_cell_line",
    "Metadata_gene_name",
    "Metadata_pert_name",
]


def _strata() -> list[tuple[str, str, int]]:
    """(gene, pert, n_replicates) combos per (cell_line, plate):
    3 genes x 2 perts x 2 reps + Chr2 x 8 + EMPTY x 2 = 22 rows."""
    out = [
        (g, f"{g}-{i + 1}", 2) for g in GENES for i in range(PERTS_PER_GENE)
    ]
    out.append(("Chr2", "Chr2", 8))
    out.append(("EMPTY", "EMPTY", 2))
    return out


def cellhealth_analog_rows() -> list[dict]:
    """The 198 rows as plain dicts, in a canonical deterministic order
    (cell_line, plate, gene, pert, replicate)."""
    import numpy as np

    rng = np.random.RandomState(42)
    # per-(cell_line, gene, pert) effect vectors, drawn in fixed order
    effects = {
        (cl, g, p): rng.normal(0.0, 1.0, N_FEATURES)
        for cl in CELL_LINES
        for g, p, _n in _strata()
    }
    rows: list[dict] = []
    well = 0
    for cl in CELL_LINES:
        for pi, plate in enumerate(PLATES):
            for g, p, n_reps in _strata():
                for _ in range(n_reps):
                    noise = rng.normal(0.0, 1.0, N_FEATURES)
                    f = effects[(cl, g, p)] + 0.15 * pi + 0.75 * noise
                    well += 1
                    row = {
                        "Metadata_Plate": plate,
                        "Metadata_Well": f"{chr(65 + (well - 1) // 24)}{(well - 1) % 24 + 1:02d}",
                        "Metadata_cell_line": cl,
                        "Metadata_gene_name": g,
                        "Metadata_pert_name": p,
                    }
                    for j, c in enumerate(FEATURE_COLS):
                        row[c] = float(f[j])
                    rows.append(row)
    assert len(rows) == 198
    return rows


def cellhealth_analog(spark: SparkSession) -> DataFrame:
    """The wide matric-convention table: Metadata_* annotation columns +
    feature doubles (annotation split by prefix, R/utils.R:32-39)."""
    rows = cellhealth_analog_rows()
    schema = (
        "Metadata_Plate string, Metadata_Well string, "
        "Metadata_cell_line string, Metadata_gene_name string, "
        "Metadata_pert_name string, "
        + ", ".join(f"`{c}` double" for c in FEATURE_COLS)
    )
    data = [
        tuple(r[c] for c in [
            "Metadata_Plate", "Metadata_Well", "Metadata_cell_line",
            "Metadata_gene_name", "Metadata_pert_name", *FEATURE_COLS,
        ])
        for r in rows
    ]
    return spark.createDataFrame(data, schema)


def cellhealth_population(spark: SparkSession) -> DataFrame:
    """Internal population contract for the sim suite: stable integer id
    (1..198 in canonical order, matric's `seq_len`), features packed into
    an array column, annotation columns + is_ref flat."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    wide = cellhealth_analog(spark)
    w = Window.orderBy(
        "Metadata_cell_line", "Metadata_Plate", "Metadata_gene_name",
        "Metadata_pert_name", "Metadata_Well",
    )
    # window-ordered surrogate is fine HERE: a 198-row committed fixture,
    # not a data path (the scale path is population.get_annotation's
    # hash-bucketed id)
    return wide.withColumn("id", F.row_number().over(w)).select(
        "id",
        F.array(*[F.col(c) for c in FEATURE_COLS]).alias("embedding"),
        "Metadata_Plate",
        "Metadata_cell_line",
        "Metadata_gene_name",
        "Metadata_pert_name",
        (F.col("Metadata_gene_name") == "Chr2").alias("is_ref"),
    )
