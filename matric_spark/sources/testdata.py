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
