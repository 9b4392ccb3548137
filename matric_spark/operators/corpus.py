"""Corpus-curation operators a large-scale training-data pipeline needs
beyond pair-level dedup: benchmark decontamination, canonical-document
selection over dup clusters, and deterministic sequence packing.

All three are pure DataFrame compositions (codegen expressions + joins +
windows — no Python in the hot path) and have exact DuckDB oracle twins
(duck_oracle.contamination_sql / cluster_canonical_sql / pack_chunks_sql).

Reference lineage: matric has none of these (its populations are
pre-curated); the shapes are the standard public constructions —
n-gram-overlap decontamination (GPT-3 appendix C / Dolma's
train-test-overlap tooling), keep-best-representative dedup (every
near-dup pipeline), and concat-and-chop packing (GPT-style pretraining
batch prep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from matric_spark.functions.text import bpe_token_count, quality_score
from matric_spark.operators.dedup import shingle_sets


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
) -> DataFrame:
    """Training docs sharing >= `min_overlap` distinct word n-gram
    shingles with any benchmark document ->
    DataFrame[doc_id, bench_id, n_shared].

    Scale shape: both sides shingle to (id, 60-bit hash) pairs; the
    benchmark side (eval sets: thousands of docs, not billions) is
    BROADCAST, so the corpus side never shuffles — the scan streams
    through a broadcast hash join and only the tiny flagged set
    aggregates. Shingles, normalization and hashing are shared with the
    dedup suite (dedup.shingle_sets), so one shingle pass can feed both.
    """
    s_docs = shingle_sets(docs, id_col=id_col, text_col=text_col, n=n)
    s_bench = shingle_sets(
        benchmark, id_col=bench_id_col, text_col=text_col, n=n
    ).withColumnRenamed("doc_id", "bench_id")
    return (
        s_docs.join(F.broadcast(s_bench), "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def cluster_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Resolve dup-pair clusters and pick ONE canonical doc per cluster:
    highest quality_score, doc_id ascending as the deterministic
    tie-break -> DataFrame[doc_id, cluster_id, quality, is_canonical].

    The keep-best step every near-dup pipeline needs after clustering:
    `filter(is_canonical)` is the deduplicated corpus; the non-canonical
    rows carry their cluster_id for lineage. Window is per cluster_id
    (dup clusters are small by construction; a pathological giant
    cluster is already the upstream connected-components' problem).
    """
    from matric_spark.operators.graph import dedup_clusters

    clusters = dedup_clusters(pairs)
    scored = clusters.join(
        docs.select(
            F.col(id_col).alias("doc_id"),
            quality_score(text_col).alias("quality"),
        ),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return scored.select(
        "doc_id",
        "cluster_id",
        "quality",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


def pack_chunks(
    docs: DataFrame,
    budget: int = 512,
    group_cols: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chop sequence packing: within each group, documents in
    deterministic id order are laid end-to-end on a token tape and the
    tape is chopped every `budget` tokens; each doc is tagged with the
    chunk its FIRST token lands in ->
    DataFrame[*group_cols, doc_id, n_tokens, offset, chunk_id].

    This is the GPT-style pretraining packing discipline (docs straddle
    chunk boundaries; no padding waste) — and unlike first/next-fit bin
    packing it is a pure window cumsum, so it stays one shuffle on the
    group key with NO sequential driver dependency, and is exactly
    reproducible by the SQL oracle. Token counts use the BPE-ish
    pre-tokenizer (functions.text.bpe_token_count).
    """
    group_cols = group_cols or []
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = docs.select(
        *group_cols,
        F.col(id_col).alias("doc_id"),
        bpe_token_count(text_col).alias("n_tokens"),
    )
    return toks.withColumn(
        "offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn(
        "chunk_id", F.floor(F.col("offset") / budget)
    )
