"""Arrow-vectorized pandas UDFs.

NOTE: no `from __future__ import annotations` here — PySpark's pandas-UDF
type-hint inference needs evaluated (non-string) annotations.

Every UDF in the engine lives here so the Python boundary is auditable:
each one processes whole Arrow batches with numpy (no per-row Python),
per the north rule.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_hyperplane_signature_udf(planes: "np.ndarray"):
    """Sign-bit LSH signature: one (batch × dim) @ (dim × planes) matmul
    per Arrow batch. `planes` is captured (broadcast with the task)."""
    n_planes = planes.shape[0]
    weights = np.left_shift(np.int64(1), np.arange(n_planes, dtype=np.int64))

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        bits = (mat @ planes.T >= 0.0).astype(np.int64)
        return pd.Series(bits @ weights)

    return sig


def make_hyperplane_bands_udf(planes: "np.ndarray", n_bands: int, band_bits: int):
    """Banded sign-bit LSH: one (batch × dim) @ (dim × n_bands·band_bits)
    matmul per Arrow batch, sign bits packed per band into one integer
    band value each → array<long>[n_bands]. Emitting band values directly
    (instead of one wide signature that is re-chunked downstream) keeps
    the candidate join payload to (id, band_idx, band_val) — no vector
    bytes ever enter the exchange."""
    assert planes.shape[0] == n_bands * band_bits
    weights = np.left_shift(
        np.int64(1), np.arange(band_bits, dtype=np.int64)
    )

    @pandas_udf("array<long>")
    def bands(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        bits = (mat @ planes.T >= 0.0).astype(np.int64)
        vals = bits.reshape(len(mat), n_bands, band_bits) @ weights
        return pd.Series(list(vals))

    return bands


def make_centroid_assign_udf(centroids: "np.ndarray"):
    """IVF cell assignment: argmax cosine against the (k × d) centroid
    matrix — one (batch × d) @ (d × k) matmul per Arrow batch. Centroids
    are unit rows (operators/ann.ivf_centroids), inputs are pre-normalized,
    so the matmul IS the cosine. Ties break to the lowest cell id
    (np.argmax), deterministically."""
    cent = centroids.T  # (d, k), captured once per task

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series((mat @ cent).argmax(axis=1).astype(np.int32))

    return assign


def make_centroid_probe_udf(centroids: "np.ndarray", nprobe: int):
    """Top-`nprobe` nearest cells per query vector (the IVF probe list):
    one matmul + argpartition per Arrow batch. The probe list is sorted
    (cosine desc, cell asc) so the output is deterministic under ties."""
    cent = centroids.T

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        sims = mat @ cent  # (batch, k)
        p = min(nprobe, sims.shape[1])
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        row_sims = np.take_along_axis(sims, top, axis=1)
        order = np.lexsort((top, -row_sims), axis=1)
        cells = np.take_along_axis(top, order, axis=1).astype(np.int32)
        return pd.Series(list(cells))

    return probe
