"""SparkSession factory tuned for the validation engine.

Design notes (scale-first):
- AQE on, with skew-join handling: conversation length is Zipfian, so any
  per-conv shuffle can produce hot partitions; AQE splits them at runtime.
- Arrow enabled: every custom kernel in this engine is a vectorized
  pandas/Arrow UDF (no per-row Python anywhere).
- Session timezone pinned to UTC so results compare bit-for-bit with the
  DuckDB oracle (duckdb timestamps are UTC-naive).
- shuffle partitions default to the core count locally; on a real cluster
  AQE coalesces from a deliberately-large initial number, so we set
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` high and
  let AQE shrink — this is the setting that survives a 100x scale-up.
- Iceberg: if the runtime jar is on the classpath we register a hadoop
  catalog (``spark.sql.catalog.graft``); otherwise the sources layer falls
  back to partitioned Parquet with identical semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _iceberg_available() -> bool:
    """True when an iceberg-spark-runtime jar is importable by the JVM."""
    try:
        import importlib.util  # noqa: F401
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return any("iceberg-spark-runtime" in j for j in os.listdir(jars))
    except OSError:
        return False


def get_spark(
    app_name: str = "matric_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    warehouse: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` controls local parallelism (``local[cpus]``); defaults to the
    ``SPARK_GRAFT_CPUS`` env var, then ``local[*]``. On a real cluster this
    function is a no-op passthrough to whatever ``spark-submit`` provided —
    all configs below are safe cluster-side too.

    Under ``spark-submit`` (detected via ``PYSPARK_GATEWAY_PORT``) the
    submitted ``--master`` always wins and ``cpus`` only sizes shuffle
    partitions. Corollary: a spark-submit run that OMITS ``--master``
    falls to spark-submit's own ``local[*]`` default — on this host
    (documented 32-thread turbo throttling, BASELINE.md) always pass
    ``--master local[N]`` explicitly when parallelism must be bounded;
    ``SPARK_GRAFT_CPUS`` alone cannot bound it in that path.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cpus = int(env) if env else None
    n_shuffle = shuffle_partitions or (cpus or os.cpu_count() or 8)

    b = SparkSession.builder.appName(app_name)
    # Respect a cluster-provided master; force local[...] only when the
    # process was launched directly (tests/bench), so main.py can share
    # this factory with spark-submit deployments. Two signals, either
    # sufficient: PYSPARK_GATEWAY_PORT marks a python process started by
    # spark-submit's PythonRunner (whose gateway JVM already carries the
    # submitted config — under Spark 4 the submitted master is NOT
    # mirrored into JVM system properties, so the SparkConf probe alone
    # misses it and would silently downgrade a standalone-cluster submit
    # to local mode; caught by tools/cluster_scaling_bench.py), and the
    # SparkConf probe covers an explicitly pre-set spark.master property.
    from pyspark import SparkConf

    under_spark_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if not under_spark_submit and not SparkConf(loadDefaults=True).contains(
        "spark.master"
    ):
        b = b.master(f"local[{cpus}]" if cpus else "local[*]")
    b = (
        b
        # --- determinism / oracle parity ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: the scale story ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        # --- vectorized python boundary ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing: keep file-split tasks balanced ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- shuffle spill dir: this host's disk is ~300 MB/s shared
        # across all writers, which serializes shuffle-heavy stages at
        # high core counts; tmpfs restores the per-node NVMe bandwidth a
        # real cluster has. Override with SPARK_GRAFT_LOCAL_DIR.
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_GRAFT_LOCAL_DIR",
                "/dev/shm/spark-local"
                if os.path.isdir("/dev/shm")
                else "/tmp",
            ),
        )
        # quieter local runs
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if _iceberg_available():
        wh = warehouse or os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/graft_warehouse")
        b = (
            b.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.graft", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.graft.type", "hadoop")
            .config("spark.sql.catalog.graft.warehouse", wh)
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
