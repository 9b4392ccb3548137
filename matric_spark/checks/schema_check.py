"""Declared-schema conformance check.

The north rule calls the engine a "schema + constraint validation"
engine; this is the schema half as a first-class emitted check rather
than an implicit assumption: every expected column is reported as
ok / type_mismatch / missing, and observed-but-undeclared columns as
extra. The output is a tiny verdict table the suite (or a human) can
gate on before any data-level check runs.

Scale note: this inspects ``df.schema`` — catalog metadata, no scan, no
job — so it costs the same at 10^12 rows as at 10. The analog in the
reference is ``sim_validate``'s structural assertions on the simframe
(R/sim.R:221-260), which likewise fail fast before touching data.

Type canonicalization: Spark's ``timestamp_ntz`` is reported as
``timestamp`` — the table contract (BASELINE.json input_hint) speaks
naive timestamps, and whether Spark reads parquet ts as NTZ is a session
setting, not a property of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OUT_SCHEMA = (
    "col string, expected_type string, actual_type string, status string"
)


def _canon_type(t: str) -> str:
    return t.replace("timestamp_ntz", "timestamp")


def schema_conformance(
    spark: SparkSession,
    df: DataFrame,
    expected: T.StructType | list[tuple[str, str]],
) -> DataFrame:
    """Per-column schema verdicts ->
    DataFrame[col, expected_type, actual_type, status, ok].

    ``expected`` is a StructType or ``[(col, spark_simple_type), ...]``;
    ``status`` is one of ok / type_mismatch / missing / extra, and
    ``ok`` is ``status == 'ok'``.
    """
    if isinstance(expected, T.StructType):
        exp = [(f.name, _canon_type(f.dataType.simpleString())) for f in expected.fields]
    else:
        exp = [(c, _canon_type(t)) for c, t in expected]
    actual = {f.name: _canon_type(f.dataType.simpleString()) for f in df.schema.fields}
    exp_names = {c for c, _ in exp}

    rows: list[tuple[str, str | None, str | None, str]] = []
    for name, etype in exp:
        atype = actual.get(name)
        if atype is None:
            status = "missing"
        elif atype != etype:
            status = "type_mismatch"
        else:
            status = "ok"
        rows.append((name, etype, atype, status))
    for name, atype in actual.items():
        if name not in exp_names:
            rows.append((name, None, atype, "extra"))

    return spark.createDataFrame(rows, _OUT_SCHEMA).withColumn(
        "ok", F.col("status") == F.lit("ok")
    )
