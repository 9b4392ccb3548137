"""Deterministic hash-based sampling and train/val/test splitting.

Training-data pipelines must split and sample REPRODUCIBLY: the same
document must land in the same split on every run, on any cluster size,
regardless of row order — so `rand()` (per-task, order-dependent) is out.
Every assignment here derives from a salted content hash of the row's
natural key:

    u(row) = md5_long(salt || key) / 2^60   ∈ [0, 1)

which is a pure narrow map (no shuffle, no state, trivially pushdown-
friendly) and is recomputed bit-for-bit by the DuckDB oracle via the
shared md5 construction (functions/hashing.py). Changing `salt` yields
an independent re-draw — the standard way to fix "my val split leaked
into pretraining" without touching the key schema.

Reference lineage: matric has no sampling (its populations are already
curated); this is new Spark-native engineering for the corpus-prep
suite. The salted-hash-threshold construction is the standard public
technique (e.g. `hash(id) mod N` bucketing in every large-scale dataset
paper since CC-News).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from matric_spark.functions.hashing import md5_long

#: md5_long yields 15 hex digits = 60 bits
_HASH_SPACE = float(2**60)


def hash_uniform(id_cols: list[str], salt: str = "") -> Column:
    """Deterministic uniform [0,1) draw from the row's key columns.

    Key columns are cast to string and joined with an \\x1f separator
    (never appears in normal keys) so ("ab","c") != ("a","bc"). NULL key
    components are coalesced to the sentinel "\\x1enull" BEFORE the join:
    concat_ws silently skips NULL arguments, so without the sentinel
    ('a', NULL, 'b'), ('a', 'b', NULL) and ('a', 'b') would all hash to
    the same draw, correlating splits/samples across distinct keys. The
    DuckDB twin (duck_oracle.hash_uniform_sql) mirrors the coalesce.
    """
    key = F.concat_ws(
        "\x1f",
        F.lit(salt),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x1enull"))
            for c in id_cols
        ],
    )
    return md5_long(key) / F.lit(_HASH_SPACE)


def hash_split(
    df: DataFrame,
    id_cols: list[str],
    splits: dict[str, float] | None = None,
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by hash threshold.

    `splits` maps name → weight (normalized internally); assignment is by
    cumulative-weight intervals over the uniform draw, in the given dict
    order, so {"train": .9, "val": .05, "test": .05} gives
    u < .9 → train, u < .95 → val, else test. Total coverage and
    disjointness hold by construction.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    u = hash_uniform(id_cols, salt)
    expr: Column | None = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame,
    id_cols: list[str],
    fraction: float,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic ~`fraction` subsample: keep rows with u < fraction."""
    return df.filter(hash_uniform(id_cols, salt) < F.lit(fraction))


def token_budget_mix(
    df: DataFrame,
    id_cols: list[str],
    strata_col: str,
    budgets: dict[str, float],
    tokens_col: str = "n_tokens",
    salt: str = "mix-v1",
    rate_col: str = "mix_rate",
) -> DataFrame:
    """Deterministic data mixing: sample each stratum at the rate that
    hits its TOKEN budget — keep-rate = min(1, budget / total_tokens) —
    the corpus-mixture stage that turns per-domain/language token
    targets (DoReMi/Pile-style mixture weights × total budget) into a
    reproducible document sample.

    One tiny aggregate (stratum → token total, a handful of rows)
    broadcast back onto the corpus, then the same salted-hash filter as
    `hash_sample` — the big table is never shuffled, and the draw is
    row-order independent. The expected sampled token count per stratum
    is its budget (exact only in expectation: whole documents are kept
    or dropped). Strata without a budget get rate 0.
    """
    b = F.lit(0.0)
    for value, budget in sorted(budgets.items()):
        b = F.when(F.col(strata_col) == value, float(budget)).otherwise(b)
    rates = (
        df.groupBy(strata_col)
        .agg(F.sum(tokens_col).alias("_total"))
        .select(
            strata_col,
            F.least(F.lit(1.0), b / F.col("_total").cast("double")).alias(
                rate_col
            ),
        )
    )
    return df.join(F.broadcast(rates), strata_col).filter(
        hash_uniform(id_cols, salt) < F.col(rate_col)
    )


def stratified_hash_sample(
    df: DataFrame,
    id_cols: list[str],
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample by language).

    `fractions` maps stratum value → keep fraction; strata not listed
    keep `default_fraction`. One narrow filter — no shuffle, no
    per-stratum scans (contrast `df.sampleBy`, which is seed-stable but
    partition-order-dependent under repartitioning).
    """
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, float(f)).otherwise(frac)
    return df.filter(hash_uniform(id_cols, salt) < frac)


def weighted_hash_sample(
    df: DataFrame,
    id_cols: list[str],
    weight_col: str,
    fraction: float,
    salt: str = "wsample-v1",
    prob_col: str = "keep_prob",
) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sample: row keep
    probability p_i = min(1, fraction * w_i / mean(w)), so the expected
    kept ROW count is ~fraction * n (exact when no row clips at 1) and
    each row's inclusion odds scale with its weight — the standard
    quality- or length-weighted document sampling stage.

    `weight_col` MUST be integral (token counts, quality buckets):
    its global sum then aggregates exactly (bigint), so p_i is
    bit-reproducible regardless of partitioning — a double-sum's
    floating-point order-dependence would make the selection itself
    nondeterministic across cluster sizes. The draw is the same salted
    md5 uniform as `hash_sample`; p_i is computed in the fixed IEEE
    order ((fraction * w) * n) / sum_w, mirrored exactly by the DuckDB
    oracle (weighted_sample_sql) — only +,*,/ so both engines agree to
    the last bit.

    One tiny global aggregate (sum_w, n) broadcast back onto the
    corpus; the big table is never shuffled. Returns the kept rows with
    `prob_col` attached (round6, for inspection/inverse-probability
    reweighting downstream).
    """
    tot = df.agg(
        F.sum(F.col(weight_col).cast("long")).alias("_sum_w"),
        F.count(F.lit(1)).alias("_n"),
    )
    u = hash_uniform(id_cols, salt)
    p = F.least(
        F.lit(1.0),
        (F.lit(float(fraction)) * F.col(weight_col)) * F.col("_n")
        / F.col("_sum_w"),
    )
    return (
        df.crossJoin(F.broadcast(tot))
        .withColumn("_p", p)
        .filter(u < F.col("_p"))
        .withColumn(prob_col, F.round(F.col("_p"), 6) + F.lit(0.0))
        .drop("_sum_w", "_n", "_p")
    )


def exact_k_per_stratum(
    df: DataFrame,
    id_cols: list[str],
    stratum_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly k rows per stratum, chosen by uniform hash order.

    The rate-based samplers (stratified_hash_sample) give each row an
    independent Bernoulli draw — right for throughput, wrong when the
    consumer needs a FIXED-SIZE set (an eval slice, a labeling batch, a
    per-language probe set). Ranking rows within the stratum by their
    deterministic hash draw and keeping rank ≤ k delivers exact counts
    with the same reproducibility contract: adding rows to OTHER strata
    never changes a stratum's selection, and re-runs are byte-identical.
    (Unlike Bernoulli sampling, adding rows to the SAME stratum can
    displace a previously-chosen row — inherent to any exact-k scheme.)

    Shape: one window keyed by the stratum — and Catalyst inserts a
    partial WindowGroupLimit below the exchange (plan-pinned in
    tests/test_plans.py), so at most k rows per stratum PER INPUT
    PARTITION ever cross the shuffle; the full-stratum sort never
    materializes. No hand-rolled Bernoulli pre-filter needed.
    """
    from pyspark.sql import Window

    u = hash_uniform(id_cols, salt)
    w = Window.partitionBy(stratum_col).orderBy(
        F.asc("_u"), *[F.asc(c) for c in id_cols]
    )
    return (
        df.withColumn("_u", u)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_u", "_rk")
    )
