"""Property-based tests (hypothesis) for the metric semantics — randomized
inputs with invariant checks, the generative counterpart of the
reference's seeded monotonicity tests (SURVEY §5.4)."""

from __future__ import annotations

import math

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

sims = st.lists(
    st.floats(-1.0, 1.0, allow_nan=False, width=32), min_size=1, max_size=12
)


@settings(max_examples=25, deadline=None)
@given(sig=sims, bg=sims)
def test_metric_invariants(spark, sig, bg):
    """relrank ∈ (0,1]; AP ∈ (0,1]; r_precision ∈ [0,1]; AP=1 when every
    signal sim strictly beats every background sim."""
    from matric_spark.operators.metrics import sim_metrics

    rows = [(1, i, "rep", float(s)) for i, s in enumerate(sig)] + [
        (1, 1000 + i, "non_rep", float(b)) for i, b in enumerate(bg)
    ]
    df = spark.createDataFrame(rows, "id1 int, id2 int, type string, sim double")
    out = sim_metrics(df, ["id1"], persist=False).collect()
    assert len(out) == 1
    r = out[0]
    rel = r["sim_ranked_relrank_mean_non_rep_i"]
    ap = r["sim_retrieval_average_precision_non_rep_i"]
    rp = r["sim_retrieval_r_precision_non_rep_i"]
    assert 0.0 < rel <= 1.0
    assert 0.0 < ap <= 1.0
    assert 0.0 <= rp <= 1.0
    assert r["sim_stat_signal_n_non_rep_i"] == len(sig)
    assert r["sim_stat_background_n_non_rep_i"] == len(bg)
    if min(sig) > max(bg):
        assert ap == pytest.approx(1.0) and rp == pytest.approx(1.0)


@settings(max_examples=25, deadline=None)
@given(ps=st.lists(st.floats(1e-9, 1.0, allow_nan=False), min_size=1, max_size=20))
def test_bh_invariants(spark, ps):
    """BH q-values: q >= p, q <= 1, and monotone in p (same order)."""
    from matric_spark.operators.metrics import bh_adjust

    df = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(ps)], "id int, p double"
    )
    got = {r.id: (r.p, r.q_value) for r in bh_adjust(df, "p").collect()}
    for _, (p, q) in got.items():
        assert q >= p - 1e-12 and q <= 1.0 + 1e-12
    ordered = sorted(got.values())
    for (p1, q1), (p2, q2) in zip(ordered, ordered[1:]):
        if p1 <= p2:
            assert q1 <= q2 + 1e-12


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(st.integers(0, 50), min_size=4, max_size=60),
)
def test_ks_self_is_zero_and_bounded(spark, vals):
    """KS of two identical cohorts is 0 (p=1); any KS D ∈ [0,1]."""
    from pyspark.sql import functions as F

    from matric_spark.checks.drift import ks_by_partition

    rows = [(p, "x" * (v + 1)) for p in (1, 2) for v in vals]
    df = spark.createDataFrame(rows, "part int, text string")
    out = ks_by_partition(df, "part", F.length("text")).collect()
    for r in out:
        assert r.ks_d == pytest.approx(0.0) and r.ks_p == pytest.approx(1.0)

    skew = [(1, "x" * (v + 1)) for v in vals] + [(2, "y" * (v + 60)) for v in vals]
    df2 = spark.createDataFrame(skew, "part int, text string")
    for r in ks_by_partition(df2, "part", F.length("text")).collect():
        assert 0.0 <= r.ks_d <= 1.0 and 0.0 <= r.ks_p <= 1.0
        assert r.ks_d == pytest.approx(1.0)  # disjoint supports
