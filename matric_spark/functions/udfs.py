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
