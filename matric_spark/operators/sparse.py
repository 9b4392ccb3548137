"""Blocked pairwise kernels — matric's sparse path (R/sparse.R) on
Arrow batches.

matric blocks the pair list by hand (nest by id1, group identical
id2-lists, R/sparse.R:29-35) and runs one BLAS `tcrossprod` per block
(R/sparse.R:115-128). SURVEY §2.3's verdict: that hand-rolled
co-grouping is what Spark's shuffle partitioning gives for free — so
the Spark-first translation joins features to the pair list (the same
two joins as `sim_calculate_ij`) and computes one vectorized numpy
kernel per Arrow RECORD BATCH via `mapInPandas`: `einsum('ij,ij->i')`
IS the batched tcrossprod diagonal, amortized exactly like the
reference's per-block matmul.

When to use which:
- `pairs.attach_sim` (codegen expressions): default; zero Python.
- `pairwise_blocked` here: pluggable Python kernels (matric's
  `pairwise_function` extension point, R/sparse.R:20) and kernels that
  need real numpy/BLAS. Float summation order differs from the
  sequential expression path (pairwise/BLAS vs left fold), so results
  match to ~1e-12 relative, not bitwise — differential-tested, not
  oracle-gated.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: a kernel takes (X1, X2) row-aligned float64 matrices, returns the
#: per-row similarity vector (the tcrossprod diagonal, R/sparse.R:115-128)
Kernel = Callable[["object", "object"], "object"]


def tcrossprod_rows(x1, x2):
    """Row-wise dot: diag(X1 @ X2.T) without forming the full product."""
    import numpy as np

    return np.einsum("ij,ij->i", x1, x2)


def cosine_rows(x1, x2):
    """cosine_sparse (R/sparse.R:186-190): row-normalize then dot."""
    import numpy as np

    n1 = np.linalg.norm(x1, axis=1, keepdims=True)
    n2 = np.linalg.norm(x2, axis=1, keepdims=True)
    return tcrossprod_rows(x1 / n1, x2 / n2)


def pearson_rows(x1, x2):
    """pearson_sparse (R/sparse.R:194-198): row-center then cosine."""
    return cosine_rows(
        x1 - x1.mean(axis=1, keepdims=True),
        x2 - x2.mean(axis=1, keepdims=True),
    )


def pearson_pairwise_complete_rows(x1, x2):
    """Pearson with R's use="pairwise.complete.obs" semantics
    (stats::cor, the reference's eager correlation path,
    R/sim_calculate.R:122-124): for EACH row pair, restrict to the
    coordinates where both rows are non-NaN, then compute means, norms
    and the dot over that common support only. A row-preprocessed
    formulation cannot express this (the mean depends on the partner
    row's NaN mask), which is why it lives on the blocked numpy path.

    R edge cases reproduced: fewer than 2 complete coordinate pairs →
    NA; zero variance on the common support → NA (R warns "the standard
    deviation is zero" and yields NA). NaN crosses the Arrow boundary
    as SQL NULL."""
    import numpy as np

    m = ~(np.isnan(x1) | np.isnan(x2))
    n = m.sum(axis=1).astype(np.float64)
    a = np.where(m, x1, 0.0)
    b = np.where(m, x2, 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_a = a.sum(axis=1) / n
        mean_b = b.sum(axis=1) / n
        ac = np.where(m, x1 - mean_a[:, None], 0.0)
        bc = np.where(m, x2 - mean_b[:, None], 0.0)
        num = np.einsum("ij,ij->i", ac, bc)
        den = np.sqrt(
            np.einsum("ij,ij->i", ac, ac) * np.einsum("ij,ij->i", bc, bc)
        )
        out = np.where(den > 0, num / den, np.nan)
    out[n < 2] = np.nan
    return out


def _masked_avg_ranks(x, m):
    """Average-tie ranks per row over the masked support — R's
    rank(x[m], ties.method="average") for every row at once, no Python
    loop. Invalid coordinates (m False) rank as +inf so they sort last,
    then get NaN in the output; ranks of valid coordinates are exactly
    what R computes on the compacted subvector (positions of the
    invalid tail don't disturb 1..n_valid).

    Vectorization: stable two-key lexsort per row (validity first, so a
    legitimate +inf VALUE can never tie with a masked slot — an inf
    sentinel would merge them and silently mis-rank inf-bearing rows) →
    tie-group ids via value-or-validity changes → per-group average of
    1..d using one flat bincount (rows offset so groups never collide)
    → scatter back through the sort permutation.
    """
    import numpy as np

    n, d = x.shape
    inv = ~m
    xv = np.where(m, x, 0.0)  # invalid values are irrelevant post-sort
    # primary key: validity (valid first); secondary: value — stable
    order = np.lexsort((xv, inv), axis=1)
    sv = np.take_along_axis(xv, order, axis=1)
    svm = np.take_along_axis(inv, order, axis=1)
    newgrp = np.ones((n, d), dtype=bool)
    newgrp[:, 1:] = (
        (sv[:, 1:] != sv[:, :-1])
        | (svm[:, 1:] != svm[:, :-1])
        | svm[:, 1:]  # every masked slot is its own (discarded) group
    )
    gid = np.cumsum(newgrp, axis=1)  # 1..d, per row
    flat = (gid + (np.arange(n) * (d + 1))[:, None]).ravel()
    pos = np.broadcast_to(np.arange(1, d + 1, dtype=np.float64), (n, d)).ravel()
    sums = np.bincount(flat, weights=pos, minlength=n * (d + 1) + 1)
    cnts = np.bincount(flat, minlength=n * (d + 1) + 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        avg = sums / cnts
    ranks_sorted = avg[flat].reshape(n, d)
    ranks = np.empty((n, d), dtype=np.float64)
    np.put_along_axis(ranks, order, ranks_sorted, axis=1)
    ranks[~m] = np.nan
    return ranks


def spearman_pairwise_complete_rows(x1, x2):
    """Spearman with R's use="pairwise.complete.obs" semantics
    (stats::cor, R/sim_calculate.R:122-124 passes it for every method):
    for EACH row pair, restrict to the common non-NaN support, re-rank
    BOTH subvectors on that support (R computes ranks per pair, so a
    row's ranks differ between partners with different NaN masks — a
    row-preprocessed rank_transform cannot express this), then pearson
    over the ranks. Edge cases follow pearson_pairwise_complete_rows:
    <2 complete coordinates → NA, zero rank variance (constant on the
    common support) → NA."""
    import numpy as np

    m = ~(np.isnan(x1) | np.isnan(x2))
    r1 = _masked_avg_ranks(x1, m)
    r2 = _masked_avg_ranks(x2, m)
    return pearson_pairwise_complete_rows(r1, r2)


def kendall_pairwise_complete_rows(x1, x2, _chunk: int | None = None):
    """Kendall tau-b with R's use="pairwise.complete.obs" semantics:
    per row pair, only index pairs (i, j) with BOTH coordinates valid in
    BOTH rows count — exactly stats::cor on the compacted common-support
    subvectors. Same exact-integer tau-b formulation, chunking and
    memory bound as kendall_rows; masked-out index pairs contribute 0 to
    the sign products and to both tie terms. <2 complete coordinates →
    no valid index pairs → denominator 0 → NA."""
    import numpy as np

    n, d = x1.shape
    out = np.empty(n, dtype=np.float64)
    iu0, iu1 = np.triu_indices(d, k=1)
    n_pairs = len(iu0)
    if _chunk is None:
        _chunk = max(1, KENDALL_MEM_BUDGET // max(n_pairs * 8, 1))
    m = ~(np.isnan(x1) | np.isnan(x2))
    for s in range(0, n, _chunk):
        a = x1[s : s + _chunk]
        b = x2[s : s + _chunk]
        mm = m[s : s + _chunk]
        pair_ok = mm[:, iu0] & mm[:, iu1]
        sxu = np.where(pair_ok, np.sign(a[:, iu0] - a[:, iu1]), 0.0).astype(
            np.int8
        )
        syu = np.where(pair_ok, np.sign(b[:, iu0] - b[:, iu1]), 0.0).astype(
            np.int8
        )
        num = np.einsum("ij,ij->i", sxu, syu, dtype=np.int64)
        dx = np.count_nonzero(sxu, axis=1).astype(np.float64)
        dy = np.count_nonzero(syu, axis=1).astype(np.float64)
        denom = np.sqrt(dx * dy)
        with np.errstate(invalid="ignore", divide="ignore"):
            out[s : s + _chunk] = np.where(denom > 0, num / denom, np.nan)
    return out


#: per-buffer memory budget for kendall's sign matrices (bytes). Two
#: int8 buffers of chunk × d(d-1)/2 live at once, so peak extra memory
#: is ~2 × this regardless of d.
KENDALL_MEM_BUDGET = 32 << 20


def kendall_rows(x1, x2, _chunk: int | None = None):
    """Kendall tau-b per row pair — stats::cor(t(X), method="kendall")
    (whitelisted at R/sim_calculate.R:99). Not expressible as a dot of
    row-preprocessed vectors (it needs every element pair), so it lives
    on the blocked numpy path rather than the codegen kernel set.

    Exact integer counts: over index pairs i<j,
      num   = #concordant − #discordant = Σ sign(xi−xj)·sign(yi−yj)
      n0−n1 = #pairs with xi≠xj,  n0−n2 = #pairs with yi≠yj   (tie terms)
      tau_b = num / sqrt((n0−n1)·(n0−n2))
    A constant row gives denominator 0 → NaN, which crosses the Arrow
    boundary as SQL NULL (the faithful rendering of R's NA).
    All counts are exact int64 (int8 sign matrices, einsum accumulated
    in int64); the one float op order (sqrt then divide) is fixed, so
    the result is bit-identical to any engine using the same formula —
    the DuckDB oracle (duck_oracle.sim_strata_sql("kendall")) mirrors it
    term for term.

    Scale bound (documented contract): compute is Θ(d²) per row pair —
    intrinsic to the exact-tie vectorized formulation — so wall time
    grows quadratically in feature dimension; fine to d≈2048 (≈2M index
    pairs/row), beyond that prefer spearman (O(d log d) rank transform,
    near-identical ordering semantics at high d). MEMORY does not grow
    with d: the row-pair chunk adapts so the LARGEST transient (the
    float64 difference matrix feeding np.sign, 8 bytes × chunk ×
    d(d−1)/2) stays within KENDALL_MEM_BUDGET — peak extra memory is
    ~3× the budget (diff + sign temp + int8 copies) regardless of d
    (d=64 → chunk 2080; d=512 → 32; d=4096 → 1), pinned by
    tests/test_sim_suite.py::test_kendall_high_dim_memory_bounded.
    """
    import numpy as np

    n, d = x1.shape
    out = np.empty(n, dtype=np.float64)
    # index pairs hoisted once; sign diffs computed directly on the
    # d(d-1)/2 pairs (never materializing the full d×d tensor)
    iu0, iu1 = np.triu_indices(d, k=1)
    n_pairs = len(iu0)
    if _chunk is None:
        _chunk = max(1, KENDALL_MEM_BUDGET // max(n_pairs * 8, 1))
    for s in range(0, n, _chunk):
        a = x1[s : s + _chunk]
        b = x2[s : s + _chunk]
        sxu = np.sign(a[:, iu0] - a[:, iu1]).astype(np.int8)
        syu = np.sign(b[:, iu0] - b[:, iu1]).astype(np.int8)
        num = np.einsum("ij,ij->i", sxu, syu, dtype=np.int64)
        dx = np.count_nonzero(sxu, axis=1).astype(np.float64)
        dy = np.count_nonzero(syu, axis=1).astype(np.float64)
        denom = np.sqrt(dx * dy)
        with np.errstate(invalid="ignore", divide="ignore"):
            out[s : s + _chunk] = np.where(denom > 0, num / denom, np.nan)
    return out


KERNELS: dict[str, Kernel] = {
    "cosine": cosine_rows,
    "pearson": pearson_rows,
    "pearson_complete": pearson_pairwise_complete_rows,
    "spearman_complete": spearman_pairwise_complete_rows,
    "kendall_complete": kendall_pairwise_complete_rows,
    "tcrossprod": tcrossprod_rows,
    "kendall": kendall_rows,
}


def pairwise_blocked(
    pairs: DataFrame,
    pop: DataFrame,
    kernel: str | Kernel = "cosine",
    id_col: str = "id",
    vec_col: str = "features",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """`sparse_pairwise` (R/sparse.R:20-48): fill `sim` for a pair list
    with a per-batch numpy kernel. Pairs are deduped before the fan-out
    joins (R/sim_calculate.R:395-399); the kernel may be a name from
    KERNELS or any (X1, X2) -> vector callable (the `pairwise_function`
    plug point). `keep_cols` ride the pair list through the Arrow batch
    unchanged (so attach_sim can delegate here without losing its tags).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    fn = KERNELS[kernel] if isinstance(kernel, str) else kernel
    keep = list(keep_cols or [])

    feats = pop.select(
        F.col(id_col).alias("_fid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    joined = (
        pairs.select("id1", "id2", *keep)
        .dropDuplicates(["id1", "id2", *keep])
        .join(feats.withColumnsRenamed({"_fid": "id1", "_v": "_v1"}), "id1")
        .join(feats.withColumnsRenamed({"_fid": "id2", "_v": "_v2"}), "id2")
    )
    out_cols = ["id1", "id2", *keep]
    out_schema = StructType(
        [joined.schema[c] for c in out_cols]
        + [StructField("sim", DoubleType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = pdf[out_cols].copy()
            v1, v2 = pdf["_v1"].to_numpy(), pdf["_v2"].to_numpy()
            # NULL-vector rows get sim=NULL (the JVM kernel path's
            # semantics: _kernel_expr over a NULL array is NULL) instead
            # of crashing np.stack; the NULL-free batch is the hot path
            ok = np.array(
                [a is not None and b is not None for a, b in zip(v1, v2)],
                dtype=bool,
            )
            if ok.all():
                res["sim"] = fn(np.stack(v1), np.stack(v2))
            elif ok.any():
                # ~ok positions stay NaN; Arrow's from_pandas maps
                # float64 NaN to SQL NULL on the way back to the JVM
                sim = np.full(len(pdf), np.nan)
                sim[ok] = fn(np.stack(v1[ok]), np.stack(v2[ok]))
                res["sim"] = sim
            else:
                res["sim"] = None
            yield res

    return joined.mapInPandas(run, out_schema)
