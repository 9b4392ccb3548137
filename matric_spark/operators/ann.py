"""Similarity search over embedding columns (`array<float>`).

Two tiers, per the standard scale playbook:
- **brute-force cosine** — exact, O(N·Q) (top-k) or O(N²) (near-dup):
  the correctness baseline and the oracle-checked path. All math is
  Column expressions (codegen; no Python).
- **hyperplane LSH** — the 100 TB path: 16 deterministic random
  hyperplanes → sign-bit signature (vectorized Arrow UDF, one numpy
  matmul per batch) → equi-join on 4-bit signature chunks → exact cosine
  verification on the candidate set only. Recall is differential-tested
  against brute force (tests/test_ops.py); misses are inherent to LSH so
  this variant is excluded from the exact oracle gate.

Reference lineage: matric's cosine kernel is row-normalize + tcrossprod
(R/sim_calculate.R:126-128, R/sparse.R:186-190); its blocked sparse
pairwise (R/sparse.R:20-48) is the same candidates-then-verify shape used
here, with LSH buckets replacing hand-rolled id2-list blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matric_spark.functions.vector import dot

N_PLANES = 16
_CHUNK_BITS = 4


def _lcg_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes, components uniform in [-1, 1] via the
    same LCG family as functions/hashing.py (no RNG library)."""
    state = seed & 0xFFFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1664525 * state + 1013904223) & 0xFFFFFFFF
            row.append(state / 2147483647.5 - 1.0)
        planes.append(row)
    return planes


def _as_double(col: str = "embedding") -> F.Column:
    return F.col(col).cast("array<double>")


def _normalized(
    df: DataFrame, id_col: str, vec_col: str, id_out: str, v_out: str
) -> DataFrame:
    """Pre-normalize rows in STAGED projections (norm as its own column;
    see pairs._preprocess_features for why nesting the aggregate inside
    the transform lambda explodes codegen). Cosine then becomes one dot
    per pair — a third of the inline-norms work."""
    return (
        df.select(F.col(id_col).alias(id_out), _as_double(vec_col).alias(v_out))
        .withColumn(
            "_nrm",
            F.sqrt(F.aggregate(v_out, F.lit(0.0), lambda a, x: a + x * x)),
        )
        .withColumn(
            v_out,
            F.when(
                F.col("_nrm") > 0,
                F.transform(v_out, lambda x: x / F.col("_nrm")),
            ),
        )
        .drop("_nrm")
    )


def ann_topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `queries` is small (it is broadcast); the big side streams through a
    broadcast-nested-loop with the dot product in codegen. Deterministic
    tie-break: (cosine desc, vec_id asc).
    """
    from pyspark.sql.window import Window

    q = _normalized(queries, id_col, vec_col, "qid", "qv")
    e = _normalized(emb, id_col, vec_col, "vec_id", "v")
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", dot("qv", "v").alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (the oracle baseline).

    O(N²) by construction — correct at test scale; the LSH variant below
    is the same operator with candidate pruning for production scale.
    """
    e1 = _normalized(emb, id_col, vec_col, "id1", "v1")
    e2 = _normalized(emb, id_col, vec_col, "id2", "v2")
    return (
        e1.crossJoin(e2)
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", dot("v1", "v2").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_signatures(
    emb: DataFrame,
    dim: int,
    n_planes: int = N_PLANES,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit LSH signature per vector via one Arrow-batched matmul."""
    import numpy as np

    from matric_spark.functions.udfs import make_hyperplane_signature_udf

    planes = np.array(_lcg_planes(n_planes, dim, seed=seed), dtype=np.float64)
    sig = make_hyperplane_signature_udf(planes)

    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        sig(F.col(vec_col)).alias("sig"),
    )


def embedding_near_dup_lsh(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = N_PLANES,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via signature-chunk blocking + exact verification.

    Candidates = pairs agreeing on ≥1 of the 4-bit signature chunks
    (equi-join keyed on (chunk_idx, chunk_val) — uniform buckets, no
    cross join); survivors verified with the exact cosine expression.
    """
    normed = _normalized(emb, id_col, vec_col, id_col, vec_col)
    sigs = hyperplane_signatures(
        normed, dim, n_planes=n_planes, seed=seed, id_col=id_col, vec_col=vec_col
    )
    n_chunks = n_planes // _CHUNK_BITS
    chunk_arr = F.array(
        *[
            F.shiftright(F.col("sig"), c * _CHUNK_BITS).bitwiseAND(
                F.lit((1 << _CHUNK_BITS) - 1)
            )
            for c in range(n_chunks)
        ]
    )
    chunked = sigs.select(
        "vec_id", "v", F.posexplode(chunk_arr).alias("chunk_idx", "chunk_val")
    )
    cand = (
        chunked.alias("x")
        .join(chunked.alias("y"), ["chunk_idx", "chunk_val"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("id1"),
            F.col("y.vec_id").alias("id2"),
            F.col("x.v").cast("array<double>").alias("v1"),
            F.col("y.v").cast("array<double>").alias("v2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cand.select("id1", "id2", dot("v1", "v2").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
