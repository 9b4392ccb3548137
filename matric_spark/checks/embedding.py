"""Embedding-column integrity audit.

The validation-suite counterpart of operators/ann.py: before a corpus's
embedding table feeds dedup/ANN, verify the vectors are actually usable —
NULL vectors, wrong dimensionality, non-finite components, and zero norms
all silently poison cosine pipelines (a zero-norm vector turns normalized
dot products into NULL/NaN depending on the engine; ann._normalized
guards per-op, this audits per-table).

Reference lineage: matric validates its input frames up front
(R/sim.R:113-170 sim_validate's structural asserts) rather than letting
bad rows surface mid-pipeline; this is that discipline applied to an
array<float> column.

Scale design: one scan, one hash aggregate keyed by the (low-cardinality)
group column. Per-row flags and the norm are codegen array expressions
(F.exists / F.aggregate — no UDF, no explode: the d components never
leave the row). The output is one row per group, so the shuffle is a few
counters per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def embedding_integrity(
    emb: DataFrame,
    expected_dim: int,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group vector-health counters + norm envelope.

    Returns (group, n_vecs, n_null_vec, n_bad_dim, n_nonfinite,
    n_zero_norm, min_norm, max_norm, avg_norm). Norm stats cover only
    vectors that pass every structural check, so they are well-defined;
    each norm is rounded to 6dp BEFORE the min/max/avg (the oracle-parity
    recipe: per-row rounding pins a fixed float-op order, and the final
    avg re-rounds, so cross-row accumulation-order noise stays ~9 orders
    of magnitude below the rounding quantum).
    """
    v = F.col(vec_col)
    is_null = v.isNull()
    bad_dim = ~is_null & (F.size(v) != F.lit(expected_dim))
    # NULL components need their own counter: F.exists(isnan) returns
    # NULL (not true) for a [1.0, NULL] vector, so without this flag a
    # NULL-poisoned vector would hit NO counter and silently vanish
    # from the norm stats — the exact failure mode this audit exists
    # to catch
    null_comp = ~is_null & F.exists(v, lambda x: x.isNull())
    nonfinite = (
        ~is_null
        & ~null_comp
        & F.exists(
            v,
            lambda x: F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == F.lit(float("inf"))),
        )
    )
    sq = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    structurally_ok = ~is_null & ~bad_dim & ~null_comp & ~nonfinite
    zero_norm = structurally_ok & (sq == 0.0)
    norm = F.when(
        structurally_ok & (sq > 0.0), F.round(F.sqrt(sq), 6) + F.lit(0.0)
    )
    t = emb.select(
        F.col(group_col),
        is_null.cast("long").alias("_null"),
        bad_dim.cast("long").alias("_bad_dim"),
        null_comp.cast("long").alias("_null_comp"),
        nonfinite.cast("long").alias("_nonfinite"),
        zero_norm.cast("long").alias("_zero"),
        norm.alias("_norm"),
    )
    return t.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("_null").alias("n_null_vec"),
        F.sum("_bad_dim").alias("n_bad_dim"),
        F.sum("_null_comp").alias("n_null_component"),
        F.sum("_nonfinite").alias("n_nonfinite"),
        F.sum("_zero").alias("n_zero_norm"),
        F.min("_norm").alias("min_norm"),
        F.max("_norm").alias("max_norm"),
        (F.round(F.avg("_norm"), 6) + F.lit(0.0)).alias("avg_norm"),
    )


def embedding_cohort_drift(
    emb: DataFrame,
    cohort: Column,
    vec_col: str = "embedding",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-dimension two-sample mean-shift audit between two cohorts —
    the embedding-space member of the drift family (checks/drift.py does
    KS/PSI/EMD on scalar columns; an embedding column drifts per
    DIMENSION, and a retrained or corrupted encoder shows up as a mean
    shift long before scalar metadata moves).

    ``cohort`` is a boolean Column splitting the table (true = cohort a,
    false/NULL = cohort b). Returns one row per dimension:
    (dim, n_a, n_b, mean_a, mean_b, sd_a, sd_b, shift, z, drifted) where
    z is the two-sample z statistic (mean_a−mean_b)/√(sd_a²/n_a+sd_b²/n_b)
    and ``drifted`` flags |round(z,6)| > z_threshold — the rounded value
    so the boundary decision is engine-deterministic.

    Scale design: one scan — NULL vectors are dropped, the (flag,
    component) pairs fan out via posexplode INSIDE the codegen stage and
    hash-aggregate with map-side combine, so the shuffle is d rows ×
    partitions of partial sums, never the vectors. d is the embedding
    width (constant), so output and shuffle are O(d), independent of
    table size. Components cast to double BEFORE aggregation on both
    engines (float32 parity discipline, CLAUDE.md).
    """
    a = F.when(cohort, F.lit(1)).otherwise(F.lit(0))
    comp = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(a.alias("_a"), F.posexplode(vec_col).alias("dim", "_x"))
        .select("_a", "dim", F.col("_x").cast("double").alias("x"))
    )
    in_a = F.col("_a") == 1
    in_b = F.col("_a") == 0
    agg = comp.groupBy("dim").agg(
        F.count(F.when(in_a, F.lit(1))).alias("n_a"),
        F.count(F.when(in_b, F.lit(1))).alias("n_b"),
        F.avg(F.when(in_a, F.col("x"))).alias("_mean_a"),
        F.avg(F.when(in_b, F.col("x"))).alias("_mean_b"),
        F.stddev_samp(F.when(in_a, F.col("x"))).alias("_sd_a"),
        F.stddev_samp(F.when(in_b, F.col("x"))).alias("_sd_b"),
    )
    z = (F.col("_mean_a") - F.col("_mean_b")) / F.sqrt(
        F.col("_sd_a") * F.col("_sd_a") / F.col("n_a")
        + F.col("_sd_b") * F.col("_sd_b") / F.col("n_b")
    )
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return agg.select(
        "dim",
        "n_a",
        "n_b",
        r6(F.col("_mean_a")).alias("mean_a"),
        r6(F.col("_mean_b")).alias("mean_b"),
        r6(F.col("_sd_a")).alias("sd_a"),
        r6(F.col("_sd_b")).alias("sd_b"),
        r6(F.abs(F.col("_mean_a") - F.col("_mean_b"))).alias("shift"),
        r6(z).alias("z"),
        F.coalesce(
            F.abs(F.round(z, 6)) > F.lit(z_threshold), F.lit(False)
        ).alias("drifted"),
    )
