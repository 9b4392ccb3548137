"""Population-schema utilities (matric R/utils.R): annotation-prefix
schema split and NA-column preprocessing.

matric infers schema by column-name convention — metadata columns start
with a prefix (default "Metadata_"), everything else is a feature
(R/utils.R:32-39, :68-73). The graft keeps the prefix fallback but the
declared-schema path (explicit column lists) is preferred.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANNOTATION_PREFIX = "Metadata_"


def annotation_cols(df: DataFrame, prefix: str = ANNOTATION_PREFIX) -> list[str]:
    """Columns matching the annotation prefix (R/utils.R:36)."""
    return [c for c in df.columns if c.startswith(prefix)]


def get_annotation(
    df: DataFrame, prefix: str = ANNOTATION_PREFIX, id_col: str = "id"
) -> DataFrame:
    """Project annotation columns + a stable 1-based row id
    (R/utils.R:32-39: `id = seq_len(n)`).

    Row id via row_number() over a TOTAL ORDER of all columns — stable
    under repartition, unlike monotonically_increasing_id (SURVEY §1.3).
    For keyed tables, prefer the natural key and skip this entirely.
    """
    w = Window.orderBy(*[F.col(c) for c in df.columns])
    return df.select(
        F.row_number().over(w).alias(id_col), *annotation_cols(df, prefix)
    )


def drop_annotation(df: DataFrame, prefix: str = ANNOTATION_PREFIX) -> DataFrame:
    """Complement projection: the feature block (R/utils.R:68-73)."""
    return df.drop(*annotation_cols(df, prefix))


def preprocess_data(
    df: DataFrame, prefix: str = ANNOTATION_PREFIX
) -> tuple[DataFrame, list[str]]:
    """Drop every feature column containing >= 1 NA (R/utils.R:97-120).

    ONE conditional-aggregation pass computes all per-column null counts
    (the same fused shape as checks/column_stats.py — this op *is* the
    null-rate column stat); returns (clean_df, dropped_cols).
    """
    feat = [c for c in df.columns if not c.startswith(prefix)]
    if not feat:
        return df, []
    counts = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in feat]
    ).collect()[0]
    dropped = [c for c in feat if counts[c] > 0]
    return df.drop(*dropped), dropped


def assemble_population(
    df: DataFrame, prefix: str = ANNOTATION_PREFIX, id_col: str = "id"
) -> DataFrame:
    """Wide population → (id, features array<double>, *annotations):
    the input shape `operators/pairs.sim_calculate` consumes. Feature
    columns are packed into one array column in schema order."""
    clean, _ = preprocess_data(df, prefix)
    feat = [c for c in clean.columns if not c.startswith(prefix)]
    w = Window.orderBy(*[F.col(c) for c in clean.columns])
    return clean.select(
        F.row_number().over(w).alias(id_col),
        F.array(*[F.col(c).cast("double") for c in feat]).alias("features"),
        *annotation_cols(clean, prefix),
    )
