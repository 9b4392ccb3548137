"""Golden end-to-end regression on the cellhealth-analog fixture — the
graft's version of the reference's hard-coded metric means on its
packaged 198-row cellhealth dataset (tests/testthat/test-sim_metrics.R:
87-182, test-sim_collate.R:226 `mean == 0.1040035`). Two layers:

1. column-mean pins (matric's exact style): the across-column means are
   hard-coded literals here, so ANY drift in kernel/collate/metric
   semantics fails loudly with the metric name;
2. full-frame comparison against the committed golden parquet
   (tests/golden/*.parquet, built once by
   tools/make_cellhealth_golden.py), catching drift the means average
   away.

Tolerance is 1e-9 (not bitwise): Spark float aggregation order inside a
group may vary with partitioning; group sizes here are <= 45 rows so
associativity error is ~1e-15 relative.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

LEVEL10_MEANS = {
    "sim_mean_i": 0.557753081,
    "sim_mean_stat_ref_i": 0.0195295227,
    "sim_median_i": 0.6137265142,
    "sim_ranked_relrank_mean_ref_i": 0.3525462963,
    "sim_ranked_relrank_median_ref_i": 0.3425925926,
    "sim_retrieval_average_precision_ref_i": 0.7546944105,
    "sim_retrieval_r_precision_ref_i": 0.6611111111,
    "sim_scaled_mean_ref_i": 1.9829282903,
    "sim_scaled_median_ref_i": 2.2050895776,
    "sim_sd_stat_ref_i": 0.3270970525,
}

LEVEL1_MEANS = {
    "sim_mean_i_mean_i": 0.557753081,
    "sim_mean_i_median_i": 0.6156057319,
    "sim_ranked_relrank_mean_ref_i_mean_i": 0.3525462963,
    "sim_ranked_relrank_mean_ref_i_median_i": 0.3243055556,
    "sim_retrieval_average_precision_ref_i_mean_i": 0.7546944105,
    "sim_retrieval_average_precision_ref_i_median_i": 0.7693196156,
    "sim_retrieval_r_precision_ref_i_mean_i": 0.6611111111,
    "sim_scaled_mean_ref_i_mean_i": 1.9829282903,
    "sim_scaled_mean_ref_i_median_i": 1.6570201614,
    "sim_stat_background_n_ref_i_mean_i": 8.0,
    "sim_stat_signal_n_ref_i_mean_i": 5.0,
}

LEVEL21_MEANS = {
    "sim_mean_g": 0.072139041,
    "sim_ranked_relrank_mean_ref_g": 0.5796682099,
    "sim_retrieval_average_precision_ref_g": 0.5963465418,
    "sim_retrieval_r_precision_ref_g": 0.4598765432,
    "sim_scaled_mean_ref_g": 0.4617274595,
}


@pytest.fixture(scope="module")
def computed(spark):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_cellhealth_golden import _SORT, cellhealth_metrics

    return {
        name: df.toPandas().sort_values(_SORT[name]).reset_index(drop=True)
        for name, df in cellhealth_metrics(spark).items()
    }


def test_fixture_shape():
    from matric_spark.sources.cellhealth_analog import cellhealth_analog_rows

    rows = cellhealth_analog_rows()
    assert len(rows) == 198
    genes = {r["Metadata_gene_name"] for r in rows}
    assert genes == {"AKT1", "ARID1B", "ATF4", "Chr2", "EMPTY"}
    assert len({r["Metadata_cell_line"] for r in rows}) == 3
    assert len({r["Metadata_Plate"] for r in rows}) == 3
    # deterministic regeneration
    assert rows == cellhealth_analog_rows()


@pytest.mark.parametrize(
    "name, n_rows, means",
    [
        ("level_1_0", 108, LEVEL10_MEANS),
        ("level_1", 18, LEVEL1_MEANS),
        ("level_2_1", 108, LEVEL21_MEANS),
    ],
)
def test_cellhealth_metric_means(computed, name, n_rows, means):
    pdf = computed[name]
    assert len(pdf) == n_rows
    for col, want in means.items():
        got = float(pdf[col].mean())
        assert got == pytest.approx(want, abs=1e-9), col


@pytest.mark.parametrize("name", ["level_1_0", "level_1", "level_2_1"])
def test_cellhealth_matches_committed_golden(computed, name):
    got = computed[name]
    want = pd.read_parquet(os.path.join(GOLDEN, f"cellhealth_{name}.parquet"))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in want.columns:
        if str(want[c].dtype).startswith("float"):
            assert (got[c] - want[c]).abs().max() < 1e-9, c
        else:
            assert got[c].tolist() == want[c].tolist(), c
