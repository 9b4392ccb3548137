"""Reference-value parity: the engine reproduces the reference's OWN
published golden numbers on the reference's OWN packaged data.

Input: tests/golden/cellhealth_ref.parquet — the reference's 198-row
cellhealth dataset (data/cellhealth.rda, a subset of the public Broad
grit-benchmark profiles), decoded bit-exact by the vendored pure-Python
.rda reader (sources/rda.py) via tools/make_reference_fixture.py.

Pins (all hard-coded literals copied from the reference's testthat
suite, default pearson kernel, default drop_reference=FALSE):
- per-(cell_line, gene, type) pair tallies and whole-table tallies
  (tests/testthat/test-sim_collate.R:176-224)
- mean(collated_sim$sim) == 0.1040035 (test-sim_collate.R:226)
- across-column means of level_1_0 / level_1 / level_2_1 from
  sim_metrics(collated_sim, "ref", calculate_grouped=TRUE)
  (tests/testthat/test-sim_metrics.R:87-182)

Level semantics under test (R/sim_metrics.R:154-304):
- level_1_0 summary cols = (id1, all_same_cols_rep), signal 'rep'
- level_1 = mean/median rollup of level_1_0 over all_same_cols_rep
- level_2_1 summary cols = all_same_cols_rep WITHOUT id1 (pairs pooled
  across the replicate set), signal 'rep_group'

Tolerance: the testthat literals print ~15 significant digits; we allow
1e-9 relative — Spark's float aggregation order within these <=200-row
groups contributes ~1e-14 relative.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
FIXTURE = os.path.join(GOLDEN, "cellhealth_ref.parquet")
REFERENCE_RDA = "/root/reference/data/cellhealth.rda"

ANNOT = ["Metadata_cell_line", "Metadata_gene_name", "Metadata_pert_name"]
A1 = [c + "1" for c in ANNOT]
FEATS = [
    "Cells_AreaShape_Compactness",
    "Cells_AreaShape_Extent",
    "Cells_AreaShape_Zernike_0_0",
]

# tests/testthat/test-sim_metrics.R:90-103
LEVEL10_MEANS = {
    "sim_scaled_mean_ref_i": 0.0141851594582033,
    "sim_scaled_median_ref_i": 0.0587863126758784,
    "sim_ranked_relrank_mean_ref_i": 0.551018518518519,
    "sim_ranked_relrank_median_ref_i": 0.53712962962963,
    "sim_mean_i": 0.135553031836495,
    "sim_median_i": 0.171754795930839,
    "sim_mean_stat_ref_i": 0.102638280742606,
    "sim_sd_stat_ref_i": 0.797300368641178,
    "sim_stat_signal_n_ref_i": 2.6,
    "sim_stat_background_n_ref_i": 10.8,
    "sim_retrieval_average_precision_ref_i": 0.364021581450503,
    "sim_retrieval_r_precision_ref_i": 0.206666666666667,
}

# tests/testthat/test-sim_metrics.R:116-143
LEVEL1_MEANS = {
    "sim_scaled_mean_ref_i_mean_i": 0.0141851594582033,
    "sim_scaled_mean_ref_i_median_i": 0.0614189218851382,
    "sim_scaled_median_ref_i_mean_i": 0.0587863126758784,
    "sim_scaled_median_ref_i_median_i": 0.169157122764694,
    "sim_ranked_relrank_mean_ref_i_mean_i": 0.551018518518519,
    "sim_ranked_relrank_mean_ref_i_median_i": 0.554444444444444,
    "sim_ranked_relrank_median_ref_i_mean_i": 0.53712962962963,
    "sim_ranked_relrank_median_ref_i_median_i": 0.530555555555556,
    "sim_mean_i_mean_i": 0.135553031836495,
    "sim_mean_i_median_i": 0.0971383669904163,
    "sim_median_i_mean_i": 0.171754795930839,
    "sim_median_i_median_i": 0.192531255798829,
    "sim_mean_stat_ref_i_mean_i": 0.102638280742606,
    "sim_mean_stat_ref_i_median_i": 0.156868735917279,
    "sim_sd_stat_ref_i_mean_i": 0.797300368641178,
    "sim_sd_stat_ref_i_median_i": 0.811216514006836,
    "sim_stat_signal_n_ref_i_mean_i": 2.6,
    "sim_stat_signal_n_ref_i_median_i": 2.6,
    "sim_stat_background_n_ref_i_mean_i": 10.8,
    "sim_stat_background_n_ref_i_median_i": 10.8,
    "sim_retrieval_average_precision_ref_i_mean_i": 0.364021581450503,
    "sim_retrieval_average_precision_ref_i_median_i": 0.321487174045998,
    "sim_retrieval_r_precision_ref_i_mean_i": 0.206666666666667,
    "sim_retrieval_r_precision_ref_i_median_i": 0.173333333333333,
}

# tests/testthat/test-sim_metrics.R:156-170
LEVEL21_MEANS = {
    "sim_scaled_mean_ref_g": 0.00685852024686913,
    "sim_scaled_median_ref_g": 0.222212778308099,
    "sim_ranked_relrank_mean_ref_g": 0.527532407407407,
    "sim_ranked_relrank_median_ref_g": 0.522361111111111,
    "sim_mean_g": 0.107640219211251,
    "sim_median_g": 0.287140533081703,
    "sim_mean_stat_ref_g": 0.102638280742606,
    "sim_sd_stat_ref_g": 0.837821072124129,
    "sim_stat_signal_n_ref_g": 122.4,
    "sim_stat_background_n_ref_g": 64.8,
    "sim_retrieval_average_precision_ref_g": 0.59015449527355,
    "sim_retrieval_r_precision_ref_g": 0.588518518518519,
}


def _close(got: float, want: float) -> bool:
    return got is not None and abs(got - want) < 5e-13 + 1e-9 * abs(want)


@pytest.fixture(scope="module")
def population(spark):
    return spark.read.parquet(FIXTURE).select(
        "id",
        F.array(*[F.col(c) for c in FEATS]).alias("embedding"),
        "Metadata_Plate",
        *ANNOT,
        (F.col("Metadata_gene_name") == "Chr2").alias("is_ref"),
    )


@pytest.fixture(scope="module")
def collated_sims(spark, population):
    """collated_sim of data-raw/cellhealthmetrics.R:47-105 /
    test-sim_metrics.R:2-86, with the default pearson kernel and the
    default drop_reference=FALSE."""
    from matric_spark.operators.collate import sim_collate
    from matric_spark.operators.pairs import attach_sim

    drop_spec = spark.createDataFrame([("EMPTY",)], "Metadata_gene_name string")
    coll = sim_collate(
        population,
        reference=F.col("is_ref"),
        all_same_cols_ref=["Metadata_cell_line", "Metadata_Plate"],
        all_same_cols_rep=ANNOT,
        all_same_cols_rep_ref=[*ANNOT, "Metadata_Plate"],
        all_same_cols_non_rep=["Metadata_cell_line", "Metadata_Plate"],
        any_different_cols_non_rep=ANNOT,
        all_different_cols_non_rep=["Metadata_gene_name"],
        all_same_cols_group=["Metadata_cell_line", "Metadata_gene_name"],
        any_different_cols_group=ANNOT,
        drop_group_spec=drop_spec,
        drop_reference=False,
    )
    sims = attach_sim(
        coll, population, kernel="pearson", vec_col="embedding", keep_cols=["type"]
    )
    sims.persist()
    sims.count()
    yield sims
    sims.unpersist()


@pytest.fixture(scope="module")
def annotated(collated_sims, population):
    from matric_spark.operators.metrics import sim_annotate

    return sim_annotate(collated_sims, population, ANNOT, side="both")


def test_fixture_matches_rda():
    """The committed parquet is byte-faithful to the reference's .rda
    (guards against fixture drift; skipped where the reference tree is
    not mounted)."""
    if not os.path.exists(REFERENCE_RDA):
        pytest.skip("reference .rda not available")
    import pandas as pd

    from matric_spark.sources.rda import dataframe_to_pandas, read_rda

    want = dataframe_to_pandas(read_rda(REFERENCE_RDA)["cellhealth"])
    got = pd.read_parquet(FIXTURE)
    assert list(got["id"]) == list(range(1, len(want) + 1))
    got = got.drop(columns=["id"])
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        if want[c].dtype == object:
            assert list(got[c]) == list(want[c]), c
        else:
            assert (got[c].values == want[c].values).all(), c


def test_fixture_shape(spark, population):
    rows = population.count()
    assert rows == 198
    genes = {
        r[0]
        for r in population.select("Metadata_gene_name").distinct().collect()
    }
    # data-raw/cellhealth.R keeps the first 3 distinct genes (which
    # already include EMPTY) plus Chr2 → 4 distinct
    assert genes == {"AKT1", "MCL1", "EMPTY", "Chr2"}


def test_collate_tallies(collated_sims, population):
    """test-sim_collate.R:176-224: per-(AKT1, A549) and whole-table
    pair tallies by type."""
    totals = {
        r["type"]: r["n"]
        for r in collated_sims.groupBy("type").agg(F.count("*").alias("n")).collect()
    }
    assert totals == {"non_rep": 1152, "ref": 1944, "rep": 468, "rep_group": 3672}

    meta1 = population.select(
        F.col("id").alias("id1"),
        *[F.col(c).alias(f"{c}1") for c in ANNOT],
    )
    sub = (
        collated_sims.join(meta1, "id1")
        .filter(
            (F.col("Metadata_gene_name1") == "AKT1")
            & (F.col("Metadata_cell_line1") == "A549")
        )
        .groupBy("type")
        .agg(F.count("*").alias("n"))
    )
    assert {r["type"]: r["n"] for r in sub.collect()} == {
        "non_rep": 48,
        "ref": 144,
        "rep": 60,
        "rep_group": 72,
    }


def test_collate_all_different_cols_rep(spark, population, collated_sims):
    """test-sim_collate.R:228-270: adding all_different_cols_rep=
    [Metadata_Plate] removes exactly the type-'rep' pairs that sit on
    the SAME plate — every removed pair has Plate1 == Plate2, and the
    removed set contains no other type."""
    from matric_spark.operators.collate import sim_collate
    from matric_spark.operators.pairs import attach_sim

    drop_spec = spark.createDataFrame([("EMPTY",)], "Metadata_gene_name string")
    coll_ad = sim_collate(
        population,
        reference=F.col("is_ref"),
        all_same_cols_ref=["Metadata_cell_line", "Metadata_Plate"],
        all_same_cols_rep=ANNOT,
        all_different_cols_rep=["Metadata_Plate"],
        all_same_cols_rep_ref=[*ANNOT, "Metadata_Plate"],
        all_same_cols_non_rep=["Metadata_cell_line", "Metadata_Plate"],
        any_different_cols_non_rep=ANNOT,
        all_different_cols_non_rep=["Metadata_gene_name"],
        all_same_cols_group=["Metadata_cell_line", "Metadata_gene_name"],
        any_different_cols_group=ANNOT,
        drop_group_spec=drop_spec,
        drop_reference=False,
    )
    sims_ad = attach_sim(
        coll_ad, population, kernel="pearson", vec_col="embedding",
        keep_cols=["type"],
    )
    removed = collated_sims.join(
        sims_ad.select("id1", "id2").distinct(), ["id1", "id2"], "left_anti"
    )
    plate = population.select("id", "Metadata_Plate")
    removed_annot = (
        removed.join(
            plate.select(
                F.col("id").alias("id1"), F.col("Metadata_Plate").alias("p1")
            ),
            "id1",
        ).join(
            plate.select(
                F.col("id").alias("id2"), F.col("Metadata_Plate").alias("p2")
            ),
            "id2",
        )
    )
    assert removed_annot.filter(F.col("p1") != F.col("p2")).count() == 0
    types = {r[0] for r in removed.select("type").distinct().collect()}
    assert types == {"rep"}
    assert removed.count() > 0


def test_collate_mean(collated_sims):
    """test-sim_collate.R:226: mean(collated_sim$sim) == 0.1040035."""
    got = collated_sims.agg(F.mean("sim")).collect()[0][0]
    assert abs(got - 0.1040035) < 5e-8  # literal printed to 7 digits


def _check_means(df, expected):
    row = df.agg(*[F.mean(c).alias(c) for c in expected]).collect()[0].asDict()
    bad = {
        k: (row[k], want)
        for k, want in expected.items()
        if not _close(row[k], want)
    }
    assert not bad, f"mismatched means: {bad}"


def test_level_1_0_means(annotated):
    from matric_spark.operators.metrics import sim_metrics

    l10 = sim_metrics(
        annotated,
        ["id1", *A1],
        signal_type="rep",
        background_type="ref",
        identifier="i",
    )
    assert l10.count() == 180
    _check_means(l10, LEVEL10_MEANS)


def test_level_1_means(annotated):
    from matric_spark.operators.metrics import aggregate_level, sim_metrics

    l10 = sim_metrics(
        annotated,
        ["id1", *A1],
        signal_type="rep",
        background_type="ref",
        identifier="i",
    )
    l1 = aggregate_level(l10, A1, identifier="i")
    assert l1.count() == 30
    _check_means(l1, LEVEL1_MEANS)


def test_level_2_1_means(annotated):
    """level_2_1 groups by the rep key WITHOUT id1 (R/sim_metrics.R:
    256-284 passes summary_cols, not c("id1", summary_cols)) — pairs
    pool across the replicate set before metrics."""
    from matric_spark.operators.metrics import sim_metrics

    l21 = sim_metrics(
        annotated,
        A1,
        signal_type="rep_group",
        background_type="ref",
        identifier="g",
    )
    assert l21.count() == 30
    _check_means(l21, LEVEL21_MEANS)


def test_rda_reader_metrics_file():
    """Reader smoke on the second packaged .rda (nested named list of
    three tibbles computed from the FULL public dataset — not
    reproducible offline, so shapes only)."""
    if not os.path.exists("/root/reference/data/cellhealthmetrics.rda"):
        pytest.skip("reference .rda not available")
    from matric_spark.sources.rda import (
        dataframe_to_pandas,
        named_list,
        read_rda,
    )

    m = named_list(
        read_rda("/root/reference/data/cellhealthmetrics.rda")["cellhealthmetrics"]
    )
    assert set(m) == {"level_1_0", "level_1", "level_2_1"}
    shapes = {k: dataframe_to_pandas(v).shape for k, v in m.items()}
    assert shapes["level_1_0"][0] > 0 and shapes["level_1"][1] == 27
