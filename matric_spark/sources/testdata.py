"""Loaders for the driver-provided parquet tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def rebalance_small_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a tiny single-split scan across the executors BEFORE
    expensive per-row expressions (shingle hashing, langid n-grams,
    signature matmuls): a table that arrives as one parquet row group
    runs its whole map stage on one task otherwise.

    Deliberately conditional — at production scale a scan has ≥ the
    session parallelism in splits, this is a no-op, and NO text bytes
    are ever re-shuffled (the perf invariant in CLAUDE.md). Only when
    the scan's split count is under half the core count (i.e. the
    local-fixture case, a sub-megabyte shuffle) does it repartition.
    `getNumPartitions` is plan metadata, not a job."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {
        n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        for n in (names or TABLES)
    }


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each parquet table as a temp view (matching the DuckDB
    oracle's pre-registered views) so shared-dialect SQL runs on both."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
