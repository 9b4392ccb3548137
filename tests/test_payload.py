"""Edge-case tests for the JSON payload contract (checks/payload.py)
and the embedding cohort-drift audit (checks/embedding.py) — every
engine-parity corner the oracle relies on, planted explicitly.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from matric_spark.checks.embedding import embedding_cohort_drift
from matric_spark.checks.payload import (
    json_payload_audit,
    json_payload_violations,
)

CASES = [
    # (event_id, event_type, props, expected first-failing tier or None)
    (0, "a", '{"k": 87}', None),
    (1, "a", '{"k": -3}', "out_of_range"),
    (2, "a", '{"k": 95}', "out_of_range"),
    (3, "a", '{"k": "87"}', None),  # lexical check: quoted int passes
    (4, "b", '{"k": null}', "missing_key"),  # JSON null ≡ missing
    (5, "b", '{"j": 1}', "missing_key"),
    (6, "b", "{bad", "malformed_json"),
    (7, "b", None, "malformed_json"),
    (8, "b", '"87"', "missing_key"),  # scalar doc: valid, no $.k
    (9, "c", '{"k": 1.5}', "not_int"),
    (10, "c", '{"k": true}', "not_int"),
    (11, "c", '{"k": 0}', None),
    (12, "c", '{"k": 89}', None),
    (13, "c", '{"k": 90}', "out_of_range"),  # hi is exclusive
    # parity corners pinned by _INT_RE's 18-digit bound + \z anchor
    # (see checks/payload.py engine-parity notes)
    (14, "d", '{"k": 9223372036854775808}', "not_int"),  # > int64: no cast
    (15, "d", '{"k": "9999999999999999999999"}', "not_int"),
    (16, "d", '{"k": "87\\n"}', "not_int"),  # trailing newline in value
    (17, "d", '{"k": "999999999999999999"}', "out_of_range"),  # 18 digits
    (18, "d", '{"k": 89}', None),
]


def _ev(spark):
    return spark.createDataFrame(
        [(i, t, p) for i, t, p, _ in CASES],
        "event_id long, event_type string, props string",
    )


def test_payload_violations_first_failing_tier(spark):
    out = {
        r.event_id: r.reason
        for r in json_payload_violations(
            _ev(spark), "props", "k", 0, 90
        ).collect()
    }
    expected = {i: tier for i, _, _, tier in CASES if tier is not None}
    assert out == expected


def test_payload_audit_tiered_counters(spark):
    rows = {
        r.event_type: r
        for r in json_payload_audit(_ev(spark), "props", "k", 0, 90).collect()
    }
    a, b, c, d = rows["a"], rows["b"], rows["c"], rows["d"]
    assert (a.n, a.n_valid_json, a.n_has_key, a.n_int, a.n_in_range) == (
        4, 4, 4, 4, 2,
    )
    # b: malformed {bad + NULL column fail validity; json-null / missing
    # key / scalar doc are valid JSON without the key
    assert (b.n, b.n_valid_json, b.n_has_key, b.n_int, b.n_in_range) == (
        5, 3, 0, 0, 0,
    )
    assert (c.n, c.n_valid_json, c.n_has_key, c.n_int, c.n_in_range) == (
        5, 5, 5, 3, 2,
    )
    assert (d.n, d.n_valid_json, d.n_has_key, d.n_int, d.n_in_range) == (
        5, 5, 5, 2, 1,
    )
    assert not a.payload_pass and not b.payload_pass and not c.payload_pass
    assert not d.payload_pass
    # k stats cover lexically-integer values only
    assert (a.min_k, a.max_k, a.sum_k) == (-3, 95, 266)
    assert (b.min_k, b.max_k, b.sum_k) == (None, None, None)
    assert (c.min_k, c.max_k, c.sum_k) == (0, 90, 179)
    # 18-digit values cast exactly (no overflow by construction)
    assert (d.min_k, d.max_k, d.sum_k) == (89, 10**18 - 1, 10**18 + 88)


def test_payload_audit_all_pass_group(spark):
    df = spark.createDataFrame(
        [(1, "x", '{"k": 5}'), (2, "x", '{"k": 0}')],
        "event_id long, event_type string, props string",
    )
    row = json_payload_audit(df, "props", "k", 0, 90).collect()[0]
    assert row.payload_pass and row.n == row.n_in_range == 2
    assert json_payload_violations(df, "props", "k", 0, 90).count() == 0


def test_embedding_cohort_drift_matches_numpy(spark):
    rng = np.random.RandomState(7)
    d = 4
    # cohort a shifted by +0.5 in dim 2 only → exactly one drifted dim
    rows = []
    for i in range(80):
        v = rng.randn(d)
        if i < 40:
            v[2] += 0.5
        rows.append((i, int(i < 40), [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, grp int, embedding array<float>")
    out = {
        r.dim: r
        for r in embedding_cohort_drift(df, F.col("grp") == 1).collect()
    }
    assert set(out) == set(range(d))
    assert [dim for dim in out if out[dim].drifted] == [2]
    # numpy differential on one dim (float32 cast first — the operator
    # aggregates the stored float32 values)
    mat = np.array([r[2] for r in rows], dtype=np.float32).astype(np.float64)
    a_mask = np.array([r[1] == 1 for r in rows])
    for dim in range(d):
        xa, xb = mat[a_mask, dim], mat[~a_mask, dim]
        z = (xa.mean() - xb.mean()) / math.sqrt(
            xa.var(ddof=1) / len(xa) + xb.var(ddof=1) / len(xb)
        )
        assert abs(out[dim].z - round(z, 6)) < 2e-6
        assert out[dim].n_a == len(xa) and out[dim].n_b == len(xb)


def test_embedding_cohort_drift_null_vectors_excluded(spark):
    df = spark.createDataFrame(
        [
            (0, 0, [1.0, 2.0]),
            (1, 0, None),
            (2, 1, [3.0, 4.0]),
            (3, 1, [5.0, 6.0]),
            (4, None, [7.0, 8.0]),  # NULL cohort expr → cohort b
        ],
        "vec_id long, grp int, embedding array<float>",
    )
    out = {
        r.dim: r
        for r in embedding_cohort_drift(df, F.col("grp") == 0).collect()
    }
    assert out[0].n_a == 1 and out[0].n_b == 3
    # single-sample cohort → sd NULL → z NULL → drifted false, not NULL
    assert out[0].sd_a is None and out[0].z is None
    assert out[0].drifted is False
