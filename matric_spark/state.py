"""Checkpointed validation runs: per-partition lineage + metric state,
resume-without-recompute (SURVEY §7.2 M5; north-rule requirement).

matric carries lineage in fragile data-frame attributes and restores
them by hand (`sim_restore`, R/sim_construct-validate.R:83-140). Here
lineage is a first-class STATE TABLE (partitioned parquet in the
sandbox; 1:1 `writeTo(...).append()` on Iceberg, with the snapshot id
as the fingerprint):

    state/local/      per-partition verdicts for PARTITION-LOCAL checks
                      (ref_role, ref_tool, null_text, null_ts, seq_order)
    state/key_index/  (conv_id, turn_idx, part, cnt) — per-partition key
                      counts; cross-partition uniqueness is an aggregate
                      of this index, never a re-scan. On a cluster this
                      table is bucketed by key so the merge is
                      shuffle-free.
    state/sketch/     (part, v, c) value-counts sketch — KS and PSI for
                      EVERY partition are recomputed from the merged
                      sketch each run (sketch-sized work), because each
                      partition's drift baseline is the complement of
                      the whole table and so changes as partitions land.
    state/log/        (part, fingerprint, run_id, n_rows) completion log

Check taxonomy that makes resume correct:
- row-local checks → attributable to a partition outright.
- conversation-local checks (turn ordering): a conversation may span
  partitions, so new partitions pull their conversations IN FULL via a
  semi-join before the window — a bounded boundary re-read; verdicts
  are then attributed to rows' own partitions.
- global checks (uniqueness, drift) → derived from merged state
  aggregates, O(state) not O(data).

A partition is COMPLETE for an input `fingerprint` iff a log row exists;
completed partitions are pruned from the scan by a partition-column
predicate (partition pruning on Iceberg). If the input changes, the
fingerprint changes and everything re-validates (SURVEY §7.3e).
Differential guarantee (tests/test_state.py): crash-resume ≡ fresh ≡
the one-shot batch suite.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matric_spark.checks.drift import ks_by_partition, psi_by_partition, _counts
from matric_spark.checks.sequence import out_of_order_turns
from matric_spark.checks.suite import SuiteConfig, scalar_check_metrics

_LOG_SCHEMA = "part int, run_id string, n_rows long, fingerprint string"


def input_fingerprint(path: str) -> str:
    """Lineage id of the input: hash of the recursive file listing
    (name, size, mtime) — the parquet stand-in for an Iceberg snapshot id
    (`iceberg_snapshot_fingerprint` below when the catalog is live)."""
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(path)):
        for f in sorted(files):
            p = os.path.join(root, f)
            st = os.stat(p)
            h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def iceberg_snapshot_fingerprint(spark: SparkSession, table: str) -> str:
    """Resume fingerprint of an Iceberg input table = its current
    snapshot id (read from the `.snapshots` metadata table). Any commit
    to the input produces a new snapshot id, so completed-partition state
    keyed on it invalidates exactly when the data changes — the real
    form of what `input_fingerprint` approximates with file stats."""
    rows = spark.sql(
        f"SELECT snapshot_id FROM {table}.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    ).collect()
    return str(rows[0][0]) if rows else "empty-table"


def _catalog_from_env() -> str | None:
    return os.environ.get("SPARK_GRAFT_CATALOG") or None


class StateStore:
    """State-table accessor with two interchangeable backends:

    - parquet (default): `state_dir/<name>` partition-appended files;
      fingerprint rides as a literal column.
    - iceberg (``catalog='iceberg'`` or env SPARK_GRAFT_CATALOG=iceberg,
      requires the `graft` catalog registered by session.get_spark when
      the runtime jar is present): each state relation is a real Iceberg
      table `graft.<ns>.<name>` (namespace derived from state_dir),
      created partitioned-by-fingerprint on first append and extended
      with atomic `writeTo(...).append()` — append atomicity is what
      makes crash-resume safe against torn state on a real cluster,
      and the fingerprint partition key gives O(1) pruning of stale
      lineage. Readers/writers share one code path; only _read/_append
      differ (pytest exercises it end-to-end when jars are present:
      tests/test_state.py::test_resume_on_iceberg).
    """

    def __init__(
        self, spark: SparkSession, state_dir: str, catalog: str | None = None
    ) -> None:
        self.spark = spark
        self.dir = state_dir
        self.catalog = catalog or _catalog_from_env()
        if self.catalog not in (None, "iceberg"):
            raise ValueError(f"unknown state catalog {self.catalog!r}")
        if self.catalog == "iceberg":
            ns = hashlib.sha256(state_dir.encode()).hexdigest()[:12]
            self.ns = f"graft.state_{ns}"

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def _read(self, name: str, schema: str | None = None) -> DataFrame | None:
        try:
            if self.catalog == "iceberg":
                return self.spark.read.table(f"{self.ns}.{name}")
            r = self.spark.read
            if schema:
                r = r.schema(schema)
            return r.parquet(self._path(name))
        except Exception:
            return None

    def _append(self, df: DataFrame, name: str, fingerprint: str) -> None:
        out = df.withColumn("fingerprint", F.lit(fingerprint))
        if self.catalog == "iceberg":
            tbl = f"{self.ns}.{name}"
            # Decide create-vs-append from the catalog, not by swallowing
            # append() failures: a bare try/append-except/create would mask
            # real append errors (schema drift, commit conflict) behind a
            # confusing "table already exists" from the fallback create.
            self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")
            if self.spark.catalog.tableExists(tbl):
                out.writeTo(tbl).append()
            else:
                # first write: create the table partitioned by lineage id
                out.writeTo(tbl).using("iceberg").partitionedBy(
                    F.col("fingerprint")
                ).create()
            return
        out.write.mode("append").parquet(self._path(name))

    def _for(self, name: str, fingerprint: str, schema: str | None = None) -> DataFrame | None:
        df = self._read(name, schema)
        if df is None:
            return None
        return df.filter(F.col("fingerprint") == fingerprint).drop("fingerprint")

    def completed_partitions(self, fingerprint: str) -> list[int]:
        log = self._for("log", fingerprint, _LOG_SCHEMA)
        if log is None:
            return []
        return [r.part for r in log.select("part").distinct().collect()]

    @staticmethod
    def _no_run_id(df: DataFrame) -> DataFrame:
        return df.drop("run_id") if "run_id" in df.columns else df

    def key_index_for(self, fingerprint: str, cfg) -> DataFrame:
        """Merged key index with batch/resume dedup semantics: appends
        are whole partitions, so duplicate (key, part) rows across
        run_ids are replays of identical data — keep one."""
        return self._no_run_id(
            self._for("key_index", fingerprint).dropDuplicates(
                [*cfg.key, "part"]
            )
        )

    def sketch_for(self, fingerprint: str) -> DataFrame:
        """Merged drift sketch, whole-partition replay dedup (see
        key_index_for)."""
        return self._no_run_id(
            self._for("sketch", fingerprint).dropDuplicates(["p", "v"])
        )

    # ------------------------------------------------- schema evolution

    def record_schema(self, df: DataFrame, fingerprint: str, seq: int) -> None:
        """Append the table's (col, dtype) snapshot to the schema log.

        ``seq`` is the caller's monotonically increasing run sequence —
        an explicit ordinal instead of a wall-clock stamp so replays and
        backfills stay deterministic (the state-table convention).
        """
        rows = [(seq, c, t) for c, t in df.dtypes]
        snap = self.spark.createDataFrame(
            rows, "seq int, col string, dtype string"
        )
        self._append(snap, "schema_log", fingerprint)

    def last_schema(self, before_seq: int | None = None) -> list[tuple[str, str]] | None:
        """The most recent recorded schema (optionally strictly before
        ``before_seq``), as [(col, dtype)] — None if never recorded.

        Reads across fingerprints ON PURPOSE: schema history spans input
        versions (yesterday's run had a different snapshot id — that is
        exactly the schema you want to drift against). Like every other
        relation in this store, the schema log therefore assumes ONE
        logical table per state_dir. Crash-replayed appends (same seq
        re-recorded) dedup on (col, dtype); the same (seq, col) recorded
        with CONFLICTING dtypes means two tables were pointed at one
        state_dir and raises rather than silently unioning their columns.
        """
        log = self._read("schema_log", "seq int, col string, dtype string, fingerprint string")
        if log is None:
            return None
        if before_seq is not None:
            log = log.filter(F.col("seq") < before_seq)
        rows = log.collect()  # schema log: O(runs × columns) rows, tiny
        if not rows:
            return None
        top = max(r.seq for r in rows)
        snap: dict[str, str] = {}
        for r in rows:
            if r.seq != top:
                continue
            if r.col in snap and snap[r.col] != r.dtype:
                raise ValueError(
                    f"schema log seq {top} records column {r.col!r} with "
                    f"conflicting dtypes ({snap[r.col]!r} vs {r.dtype!r}): "
                    "a state_dir serves ONE logical table — use separate "
                    "state dirs per table."
                )
            snap[r.col] = r.dtype
        return list(snap.items())


def schema_drift_vs_recorded(
    spark: SparkSession,
    df: DataFrame,
    store: "StateStore",
    before_seq: int | None = None,
) -> DataFrame | None:
    """Schema EVOLUTION check: today's table vs the schema the previous
    run recorded in the state log — added / removed / retyped columns
    surface as extra / missing / type_mismatch rows.

    schema_conformance validates against a DECLARED contract; this
    validates against HISTORY (the silent-upstream-migration detector:
    nobody re-declares the contract when a producer adds a column).
    Pure reuse — the recorded snapshot becomes schema_conformance's
    expected side. Returns None when no prior schema is recorded (first
    run: nothing to drift from).
    """
    from matric_spark.checks.schema_check import schema_conformance

    prev = store.last_schema(before_seq=before_seq)
    if prev is None:
        return None
    return schema_conformance(spark, df, prev)


def run_incremental(
    spark: SparkSession,
    transcripts: DataFrame,
    state_dir: str,
    run_id: str,
    fingerprint: str,
    cfg: SuiteConfig | None = None,
    fail_after_partitions: int | None = None,
    catalog: str | None = None,
    extended: bool = False,
) -> DataFrame:
    """Validate partitions not yet completed for `fingerprint`, append
    their state, and return the full verdict table (identical to
    `run_verdicts(transcripts)` once all partitions are complete).

    `fail_after_partitions=k` simulates a mid-job crash: only the first
    k remaining partitions are processed before 'dying'. `catalog`
    selects the state backend (None = parquet, 'iceberg' = Iceberg state
    tables; defaults to SPARK_GRAFT_CATALOG). `extended=True` also
    checkpoints the declarative families (rule pack, intra-partition FD
    conflicts) per partition — they are partition-local, so they resume
    exactly like the scalar metrics — and assembles the extended verdict
    table (≡ run_verdicts_extended once complete); the volume check is
    derived at assemble time from the completion log's per-partition row
    counts, no extra scan.
    """
    cfg = cfg or SuiteConfig()
    p = cfg.partition_col
    store = StateStore(spark, state_dir, catalog=catalog)

    done = store.completed_partitions(fingerprint)
    remaining = transcripts.filter(~F.col(p).isin(done)) if done else transcripts
    if fail_after_partitions is not None:
        parts = [
            r[0] for r in remaining.select(p).distinct().orderBy(p).collect()
        ][:fail_after_partitions]
        remaining = remaining.filter(F.col(p).isin(parts))

    if remaining.select(p).limit(1).count() > 0:
        # ---- partition-local state for the new partitions ----
        scalar = scalar_check_metrics(remaining, cfg)

        # sequence needs whole conversations (they span partitions):
        # bounded boundary re-read via semi-join, verdicts attributed to
        # each row's own partition
        convs = remaining.select(*cfg.key[:1]).distinct()
        full_convs = transcripts.join(convs, cfg.key[:1], "left_semi")
        seq = (
            out_of_order_turns(full_convs)
            .join(remaining.select(p).distinct(), p, "left_semi")
            .groupBy(F.col(p).alias("part"))
            .agg(F.count(F.lit(1)).alias("seq_order"))
        )
        local = (
            scalar.join(seq, "part", "left")
            .fillna(0, subset=["seq_order"])
            .withColumn("run_id", F.lit(run_id))
        )
        store._append(local, "local", fingerprint)

        # key index: per-partition key counts (uniqueness merges these).
        # run_id rides along so readers can tell appends apart: the batch
        # path dedups on the natural key (a crashed run re-appends whole
        # partitions → identical rows under a new run_id), the streaming
        # path dedups on (run_id, natural key) and SUMS (distinct
        # micro-batches legitimately append the same key again).
        key_index = (
            remaining.groupBy(*cfg.key, F.col(p).alias("part"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("run_id", F.lit(run_id))
        )
        store._append(key_index, "key_index", fingerprint)

        # drift sketch: per-partition value counts (same run_id contract)
        sketch = _counts(remaining, p, F.length("text")).withColumn(
            "run_id", F.lit(run_id)
        )
        store._append(sketch, "sketch", fingerprint)

        if extended:
            # BEFORE the log append: the resume contract is "complete iff
            # a log row exists", so every state relation must be durable
            # before the partition is marked complete — a crash in the
            # gap would otherwise prune the partition from all future
            # scans while its extended state is missing forever
            from matric_spark.checks.constraints import (
                default_transcript_rules,
            )
            from matric_spark.checks.suite import extended_partition_metrics

            ext = extended_partition_metrics(
                remaining, cfg, default_transcript_rules(), ["text", "role"]
            ).withColumn("run_id", F.lit(run_id))
            store._append(ext, "local_ext", fingerprint)

        # the log append comes LAST: it is the commit point
        log = (
            remaining.groupBy(F.col(p).alias("part"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select("part", F.lit(run_id).alias("run_id"), "n_rows")
        )
        store._append(log, "log", fingerprint)

    if extended:
        return assemble_verdicts_extended(spark, store, fingerprint, cfg)
    return assemble_verdicts(spark, store, fingerprint, cfg)


def assemble_verdicts(
    spark: SparkSession,
    store: StateStore,
    fingerprint: str,
    cfg: SuiteConfig,
) -> DataFrame:
    """Full verdict table from state only — no data re-scan.

    Global checks: uniqueness folds the key index (keys duplicated
    ANYWHERE → per-partition participating-row counts); KS/PSI run on
    the merged sketch via the same code path as the batch suite."""
    from pyspark.sql import Column

    local = store._for("local", fingerprint)
    assert local is not None, "no completed partitions in state"
    local = local.dropDuplicates(["part"]).drop("run_id")

    # batch/resume semantics: appends are WHOLE partitions, so rows
    # repeated under a different run_id (crash between state append and
    # log append, then re-run) are exact duplicates — dedup on the
    # natural key. Streaming overrides these accessors with per-batch
    # folds (streaming/validate.stream_verdicts) because there the same
    # natural key across run_ids is NEW data, not a replay.
    key_index = store.key_index_for(fingerprint, cfg)
    glob = key_index.groupBy(*cfg.key).agg(F.sum("cnt").alias("_g"))
    dup_keys = glob.filter(F.col("_g") > 1).select(*cfg.key)
    uniq = (
        key_index.join(dup_keys, cfg.key, "left_semi")
        .groupBy("part")
        .agg(F.sum("cnt").alias("uniqueness"))
    )

    sketch = store.sketch_for(fingerprint)
    ks = ks_by_partition(None, "part", None, precomputed=sketch).select(
        "part", "ks_d"
    )
    psi = psi_by_partition(None, "part", None, precomputed=sketch).select(
        "part", "psi"
    )

    wide = (
        local.join(uniq, "part", "left")
        .join(ks, "part", "left")
        .join(psi, "part", "left")
        .fillna(0, subset=["uniqueness"])
    )

    def entry(metric: Column, fail_when: Column) -> Column:
        status = F.when(fail_when, F.lit("fail")).otherwise(F.lit("pass"))
        return F.struct(metric.cast("double").alias("m"), status.alias("s"))

    structs: dict[str, Column] = {}
    for chk in ["ref_role", "ref_tool", "null_text", "null_ts", "uniqueness", "seq_order"]:
        structs[chk] = entry(F.col(chk), F.col(chk) > 0)
    structs["drift_ks"] = entry(F.col("ks_d"), F.col("ks_d") > cfg.ks_threshold)
    structs["drift_psi"] = entry(F.col("psi"), F.col("psi") > cfg.psi_threshold)

    packed = wide.select("part", *[c.alias(n) for n, c in structs.items()])
    return packed.unpivot(
        ids=["part"],
        values=list(structs),
        variableColumnName="check_id",
        valueColumnName="ms",
    ).select(
        "part",
        "check_id",
        F.col("ms.m").alias("metric"),
        F.col("ms.s").alias("status"),
    )


def assemble_verdicts_extended(
    spark: SparkSession,
    store: StateStore,
    fingerprint: str,
    cfg: SuiteConfig,
    volume_abs_delta: float = 0.5,
) -> DataFrame:
    """Extended verdict table from state only — the resumable emission of
    checks/suite.run_verdicts_extended.

    Rule/FD metrics come from the per-partition `local_ext` appends
    (whole-partition replays deduped on part, like `local`); the volume
    check derives from the completion log's per-partition row counts via
    the SAME volume_profile stage the batch operator uses, and the
    verdict rows are built by the SAME _extended_rows unpivot — so the
    batch and resumed emissions cannot diverge.
    """
    from matric_spark.checks.column_stats import volume_profile
    from matric_spark.checks.constraints import default_transcript_rules
    from matric_spark.checks.suite import _extended_rows

    core = assemble_verdicts(spark, store, fingerprint, cfg)

    ext = store._for("local_ext", fingerprint)
    if ext is None:
        raise ValueError(
            "no extended state for this fingerprint: its partitions were "
            "completed by non-extended runs, and the completion log bars "
            "them from re-scanning. Re-validate under a fresh state_dir "
            "or fingerprint with extended=True."
        )
    ext = ext.dropDuplicates(["part"]).drop("run_id")

    # every completed partition must have extended state (a fingerprint
    # partly completed by non-extended runs would otherwise silently
    # lose its rule/FD/volume verdict rows while keeping core rows)
    local_parts = {r.part for r in core.select("part").distinct().collect()}
    ext_parts = {r.part for r in ext.select("part").collect()}
    missing = sorted(local_parts - ext_parts)
    if missing:
        raise ValueError(
            f"extended state missing for completed partitions {missing}: "
            "mixed extended/non-extended runs under one fingerprint are "
            "not assemblable. Re-validate under a fresh state_dir or "
            "fingerprint with extended=True throughout."
        )

    log = (
        store._for("log", fingerprint, _LOG_SCHEMA)
        .dropDuplicates(["part"])
        .select("part", "n_rows")
    )
    vol = volume_profile(log, "part").select(
        "part", "delta_pct", "gap_months"
    )

    wide = ext.join(vol, "part", "left")
    return core.unionByName(
        _extended_rows(wide, default_transcript_rules(), volume_abs_delta)
    )


def metric_history_drift(
    store: StateStore,
    fingerprint_now: str,
    fingerprint_prev: str,
) -> DataFrame:
    """Run-over-run metric regression report from state ONLY: for each
    (partition, scalar check) present in both runs' `local` state,
    compare violation RATES (count / n_rows — volume-independent, so a
    bigger ingest doesn't masquerade as a quality regression) →
    (part, metric, rate_now, rate_prev, rate_delta).

    The temporal companion of schema_drift_vs_recorded: schema history
    says the COLUMNS changed, this says the VIOLATION PROFILE changed —
    yesterday's run passed with 0.1% null text, today's 4% at the same
    schema is the upstream bug this catches. No data re-scan: both
    sides are completed-run state reads.
    """
    checks = ["ref_role", "ref_tool", "null_text", "null_ts", "seq_order"]

    def rates(fp: str, tag: str) -> DataFrame:
        local = store._for("local", fp)
        # unknown fingerprint = readable relation, zero rows — both are
        # "no completed state" (the head(1) probe is state-sized)
        if local is None or not local.head(1):
            raise ValueError(f"no completed state for fingerprint {fp!r}")
        local = local.dropDuplicates(["part"])
        packed = local.select(
            "part",
            *[
                (
                    F.round(
                        F.col(c) / F.col("n_rows").cast("double"), 6
                    )
                    + F.lit(0.0)
                ).alias(c)
                for c in checks
            ],
        )
        return packed.unpivot(
            ids=["part"],
            values=checks,
            variableColumnName="metric",
            valueColumnName=f"rate_{tag}",
        )

    now = rates(fingerprint_now, "now")
    prev = rates(fingerprint_prev, "prev")
    return now.join(prev, ["part", "metric"]).select(
        "part",
        "metric",
        "rate_now",
        "rate_prev",
        (
            F.round(F.col("rate_now") - F.col("rate_prev"), 6) + F.lit(0.0)
        ).alias("rate_delta"),
    )
