"""Sketch accuracy + mergeability tests. Cross-checks follow SURVEY §7
(M3): built-ins `percentile_approx`/`approx_count_distinct` and exact
aggregates bound the custom mergeable sketches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # deterministic skewed values: group 'a' big + zipf-ish, 'b' small
    rows = [("a", float(i % 97) ** 2) for i in range(20000)] + [
        ("b", float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, "g string, v double").repartition(16)


def test_tdigest_vs_exact_quantiles(spark, skewed):
    from matric_spark.operators.sketches import tdigest_quantiles

    got = {
        r.g: r
        for r in tdigest_quantiles(skewed, ["g"], "v", [0.25, 0.5, 0.95]).collect()
    }
    exact = {
        r.g: r
        for r in skewed.groupBy("g")
        .agg(F.expr("percentile(v, array(0.25, 0.5, 0.95))").alias("q"))
        .collect()
    }
    for g in ("a", "b"):
        lo, mid, hi = exact[g].q
        spread = hi - lo or 1.0
        assert abs(got[g].q_25 - lo) / spread < 0.05
        assert abs(got[g].q_50 - mid) / spread < 0.05
        assert abs(got[g].q_95 - hi) / spread < 0.05


def test_tdigest_merge_invariance(spark, skewed):
    """Partition layout must not change results materially: the fold of
    per-split digests ≈ a single-split digest (mergeability)."""
    from matric_spark.operators.sketches import tdigest_quantiles

    many = tdigest_quantiles(skewed.repartition(32), ["g"], "v", [0.5]).collect()
    one = tdigest_quantiles(skewed.coalesce(1), ["g"], "v", [0.5]).collect()
    m = {r.g: r.q_50 for r in many}
    o = {r.g: r.q_50 for r in one}
    for g in ("a", "b"):
        assert m[g] == pytest.approx(o[g], rel=0.05)


def test_hll_vs_exact_and_builtin(spark):
    from matric_spark.operators.sketches import hll_distinct

    rows = [("g1", f"user{i % 5000}") for i in range(30000)] + [
        ("g2", f"u{i}") for i in range(37)
    ]
    df = spark.createDataFrame(rows, "g string, u string").repartition(16)
    got = {r.g: r.approx_distinct for r in hll_distinct(df, ["g"], "u").collect()}
    assert got["g2"] == 37  # small range → linear counting is near-exact
    assert abs(got["g1"] - 5000) / 5000 < 0.05

    builtin = {
        r.g: r.ad
        for r in df.groupBy("g").agg(F.approx_count_distinct("u").alias("ad")).collect()
    }
    assert abs(got["g1"] - builtin["g1"]) / 5000 < 0.1


def test_hll_deterministic(spark):
    from matric_spark.operators.sketches import hll_distinct

    rows = [("g", f"x{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, u string")
    a = hll_distinct(df.repartition(4), ["g"], "u").collect()[0].approx_distinct
    b = hll_distinct(df.repartition(13), ["g"], "u").collect()[0].approx_distinct
    assert a == b  # register folds are layout-independent
