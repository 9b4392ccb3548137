"""Mergeable sketches: t-digest quantiles and HyperLogLog distinct.

Why custom sketches when `percentile_approx` / `approx_count_distinct`
exist: the suite checkpoints per-partition METRIC STATE to the state
table and must merge it across runs/partitions without re-reading data
(SURVEY §7.3c — "sketch mergeability = the distributed substitute for
matric's driver-global aggregations"). Spark's built-ins don't expose
their partials; these do, as plain array/binary columns any later job
can fold. Built-ins remain the cross-check (tests/test_sketches.py).

Execution shape — the classic two-phase combine:
  phase 1: one partial sketch per (group, input-split)  [applyInPandas,
           vectorized numpy; the split id is the salt, so a hot group
           fans out across reducers]
  phase 2: fold partials per group                      [applyInPandas]
Both phases shuffle only sketch-sized rows (KBs), never raw values.

t-digest follows Dunning's merging-digest: centroid size bound
4·n·q·(1−q)/δ; HLL is standard (p-bit registers, harmonic estimate,
linear-counting small-range correction). Hashing uses
pd.util.hash_pandas_object — vectorized, deterministic, 64-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TD_DELTA = 100  # t-digest compression (≈ #centroids)
HLL_P = 12      # 4096 registers, ~1.6% standard error


# ------------------------------------------------------------- t-digest


def _td_compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Merge sorted (mean, weight) centroids under the size bound."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    n = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w, cum = float(means[0]), float(weights[0]), 0.0
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + cur_w / 2) / n
        limit = 4 * n * q * (1 - q) / delta
        if cur_w + w <= max(limit, 1.0):
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def _td_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Interpolated quantile from centroid cumulative weights.

    Rank convention: centroid i sits at the MEAN 0-indexed order-statistic
    rank of its members, cum_i - (w_i + 1)/2, and the target is q·(n-1) —
    the same linear-interpolation definition as SQL quantile_cont /
    np.quantile. With singleton centroids (which the size bound forces at
    the tails) this is exact, so digest and exact quantiles agree where
    it matters most; the previous midpoint convention (cum - w/2 vs q·n)
    was offset by ~1 rank, which a tail jump in the data amplifies."""
    n = weights.sum()
    if len(means) == 1:
        return float(means[0])
    cum = np.cumsum(weights) - (weights + 1) / 2
    target = q * (n - 1)
    return float(np.interp(target, cum, means))


def tdigest_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    delta: int = TD_DELTA,
) -> DataFrame:
    """DataFrame[*group_cols, q_<p>...] via two-phase t-digest."""
    gc = list(group_cols)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["_v"].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        keys = {c: [pdf[c].iloc[0]] for c in gc}
        if len(v) == 0:
            return pd.DataFrame({**keys, "means": [[]], "weights": [[]]})
        m, w = _td_compress(v, np.ones_like(v), delta)
        return pd.DataFrame(
            {**keys, "means": [m.tolist()], "weights": [w.tolist()]}
        )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["weights"]])
        keys = {c: [pdf[c].iloc[0]] for c in gc}
        if len(m) == 0:
            return pd.DataFrame({**keys, **{f"q_{int(p*100)}": [None] for p in probs}})
        m, w = _td_compress(m, w, delta)
        return pd.DataFrame(
            {**keys, **{f"q_{int(p*100)}": [_td_quantile(m, w, p)] for p in probs}}
        )

    key_schema = ", ".join(f"{c} {t}" for c, t in df.select(gc).dtypes)
    src = df.select(*gc, F.col(value_col).cast("double").alias("_v")).withColumn(
        "_split", F.spark_partition_id()
    )
    partials = src.groupBy(*gc, "_split").applyInPandas(
        build, f"{key_schema}, means array<double>, weights array<double>"
    )
    out_schema = ", ".join(f"q_{int(p*100)} double" for p in probs)
    return partials.groupBy(*gc).applyInPandas(
        fold, f"{key_schema}, {out_schema}"
    )


# ------------------------------------------------------------------ HLL


def _leading_zeros64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for uint64 (binary-search
    shifts — pure integer ops). float64 log2 loses precision above 2^53,
    which skewed ranks at power-of-two boundaries and, since the
    registers are persisted resume state, baked the error in."""
    bl = np.zeros(len(x), dtype=np.int64)  # bit length
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = (v >> np.uint64(s)) != 0
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl += (v != 0).astype(np.int64)
    return 64 - bl


def _hll_registers(values: pd.Series, p: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(values, index=False).to_numpy(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (cap at 64-p+1)
    rank = np.minimum(_leading_zeros64(rest), 64 - p) + 1
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """DataFrame[*group_cols, approx_distinct long] via two-phase HLL.
    Register arrays are the mergeable partials (np.maximum fold)."""
    gc = list(group_cols)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: [pdf[c].iloc[0]] for c in gc}
        vals = pdf["_v"].dropna()
        regs = (
            _hll_registers(vals, p)
            if len(vals)
            else np.zeros(1 << p, dtype=np.int64)
        )
        return pd.DataFrame({**keys, "regs": [regs.tolist()]})

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: [pdf[c].iloc[0]] for c in gc}
        regs = np.zeros(1 << p, dtype=np.int64)
        for r in pdf["regs"]:
            regs = np.maximum(regs, np.asarray(r, dtype=np.int64))
        return pd.DataFrame(
            {**keys, "approx_distinct": [int(round(_hll_estimate(regs, p)))]}
        )

    key_schema = ", ".join(f"{c} {t}" for c, t in df.select(gc).dtypes)
    src = df.select(
        *gc, F.col(value_col).cast("string").alias("_v")
    ).withColumn("_split", F.spark_partition_id())
    partials = src.groupBy(*gc, "_split").applyInPandas(
        build, f"{key_schema}, regs array<long>"
    )
    return partials.groupBy(*gc).applyInPandas(
        fold, f"{key_schema}, approx_distinct long"
    )


# ------------------------------------------------------- count-min sketch

CMS_DEPTH = 5
CMS_WIDTH = 8192


def _cms_coords(key_col: str, depth: int, width: int):
    """The (d, b) hash-coordinate expression SHARED by build and
    estimate — one definition so the two sides can never diverge (a
    build/estimate hash mismatch would silently break the CMS
    lower-bound guarantee)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("d"),
                    F.pmod(
                        F.xxhash64(F.col(key_col).cast("string"), F.lit(i)),
                        F.lit(width),
                    ).alias("b"),
                )
                for i in range(depth)
            ]
        )
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of a key column → DataFrame[(d, b, c)].

    Pure DataFrame formulation — a CMS is nothing but `depth`
    hash-bucket count aggregates, so no UDF is needed: each row explodes
    to `depth` (row, bucket) coordinates and one combinable count runs
    over them. The map-side combiner bounds every partition's shuffle
    output at depth×width rows (the sketch size), NOT the input size —
    the defining property of a mergeable sketch, delivered here by
    Spark's own partial aggregation. Merging two sketches = unioning
    their coordinate tables and re-summing, which is exactly what the
    shuffle reduce does, so cross-run/cross-partition folds reuse this
    same function's output tables.

    Unlike heavy_hitters' exact count (one (key, count) partial PER
    DISTINCT KEY), the CMS shuffle is O(depth × width) regardless of key
    cardinality — the estimator to reach for when the key space itself
    (URLs, n-grams, user ids) is too wide to count exactly.
    """
    coords = df.select(_cms_coords(key_col, depth, width).alias("p")).select(
        "p.*"
    )
    return coords.groupBy("d", "b").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate counts for a candidate key set → (key, cms_est).

    est(k) = min over the depth rows of the key's bucket counters —
    never BELOW the true count (every occurrence of k incremented all
    d of its counters), above it only by colliding keys' mass
    (≤ e/width · N with prob 1 − e^-depth per key). The candidate set
    joins the depth×width sketch via broadcast (the sketch is KBs).
    """
    probes = keys.select(
        key_col, _cms_coords(key_col, depth, width).alias("p")
    ).select(key_col, "p.*")
    return (
        probes.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )
