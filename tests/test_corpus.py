"""Corpus-curation operators: decontamination, canonical-doc selection,
sequence packing (operators/corpus.py).

Correctness on hand-built fixtures plus plan pins: the benchmark side of
the contamination join must be broadcast (the corpus side streams), and
packing must be a single window pass — no extra shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matric_spark.operators.corpus import (
    cluster_canonical,
    contamination_flags,
    pack_chunks,
)


@pytest.fixture(scope="module")
def docs(spark):
    # doc 1/2 share a long verbatim span; doc 3 is unrelated; doc 4
    # duplicates doc 1 exactly.
    rows = [
        (1, "en", "the quick brown fox jumps over the lazy dog today"),
        (2, "en", "yesterday the quick brown fox jumps over the lazy dog"),
        (3, "en", "completely different content about spark catalyst plans"),
        (4, "en", "the quick brown fox jumps over the lazy dog today"),
        (5, "de", "der schnelle braune fuchs springt ueber den faulen hund"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_contamination_flags_shared_shingles(docs):
    bench = docs.filter(F.col("doc_id") == 1)
    out = contamination_flags(docs, bench, n=3, min_overlap=2).collect()
    flagged = {(r.doc_id, r.bench_id) for r in out}
    # 2 and 4 overlap doc 1 heavily; 3 and 5 share no 3-gram.
    assert (2, 1) in flagged and (4, 1) in flagged
    assert (1, 1) in flagged  # self-pair: benchmark ⊆ corpus here
    assert not any(d in (3, 5) for d, _ in flagged)
    # exact-dup pair shares every shingle
    n_shingles = {r.doc_id: r.n_shared for r in out}
    assert n_shingles[4] == n_shingles[1]


def test_contamination_min_overlap_threshold(docs):
    bench = docs.filter(F.col("doc_id") == 1)
    # doc 1 has 8 distinct 3-gram shingles; doc 2 shares 7 of them (all
    # but "lazy dog today") — at min_overlap=8 only the exact dup (and
    # the self-pair) survive
    out = contamination_flags(docs, bench, n=3, min_overlap=8).collect()
    assert {r.doc_id for r in out} == {1, 4}


def test_contamination_benchmark_side_broadcast(docs):
    bench = docs.filter(F.col("doc_id") == 1)
    plan = contamination_flags(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_cluster_canonical_picks_best_quality(spark, docs):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 4)], ["doc_id_a", "doc_id_b"]
    ).select(F.col("doc_id_a").alias("id1"), F.col("doc_id_b").alias("id2"))
    out = cluster_canonical(docs, pairs).collect()
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == {1, 2, 4}
    assert len({r.cluster_id for r in out}) == 1
    canon = [r.doc_id for r in out if r.is_canonical]
    assert len(canon) == 1
    best = max(out, key=lambda r: (r.quality, -r.doc_id))
    assert canon[0] == best.doc_id
    # deterministic tie-break: docs 1 and 4 have identical text (equal
    # quality); if best quality ties, lowest doc_id wins
    tied = [r for r in out if r.quality == best.quality]
    assert canon[0] == min(r.doc_id for r in tied)


def test_pack_chunks_offsets_and_boundaries(spark):
    rows = [(i, "en", "w " * 100) for i in range(1, 6)]  # 100 tokens each
    d = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {r.doc_id: r for r in pack_chunks(d, budget=256, group_cols=["lang"]).collect()}
    assert [out[i].offset for i in range(1, 6)] == [0, 100, 200, 300, 400]
    # chunk = floor(offset/256): 0,100,200 → chunk 0; 300,400 → chunk 1
    assert [out[i].chunk_id for i in range(1, 6)] == [0, 0, 0, 1, 1]


def test_pack_chunks_groups_independent(docs):
    out = pack_chunks(docs, budget=512, group_cols=["lang"]).collect()
    de = [r for r in out if r.lang == "de"]
    assert len(de) == 1 and de[0].offset == 0 and de[0].chunk_id == 0
    en = sorted((r for r in out if r.lang == "en"), key=lambda r: r.doc_id)
    assert en[0].offset == 0
    for prev, cur in zip(en, en[1:]):
        assert cur.offset == prev.offset + prev.n_tokens


def test_pack_chunks_single_shuffle(docs):
    plan = pack_chunks(docs, budget=512, group_cols=["lang"])._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


# ---------------------------------------------------------- ingest gate


@pytest.fixture(scope="module")
def gate_inputs(spark):
    """Fixture with one new doc per routing outcome.

    ref corpus: two 8-word docs with disjoint vocabularies + embeddings.
    new batch:
      10 exact copy of ref 1            -> drop_text_dup
      11 novel text                     -> keep
      12 fine text, embedding ~= ref 2  -> drop_semantic_dup
      13 stitched from ref 1 + ref 2    -> quarantine_low_novelty
         (8 words of each: 14 shingles, only the 2 seam shingles novel
         -> novelty 2/14 ~ 0.143; jaccard vs either ref 6/14 ~ 0.43 < 0.5)
      14 NULL text                      -> quarantine_no_text
    """
    a = "aa bb cc dd ee ff gg hh"
    b = "ii jj kk ll mm nn oo pp"
    ref_docs = spark.createDataFrame(
        [(1, a), (2, b)], ["doc_id", "text"]
    )
    new_docs = spark.createDataFrame(
        [
            (10, a),
            (11, "totally fresh words never seen in the corpus before now"),
            (12, "novel text whose embedding collides with reference two"),
            (13, f"{a} {b}"),
            (14, None),
        ],
        "doc_id long, text string",
    )
    ref_emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    new_emb = spark.createDataFrame(
        [
            (10, [0.0, 0.0, 1.0]),
            (11, [0.0, 0.0, -1.0]),
            (12, [0.05, 0.99, 0.0]),
            (13, [-1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    return new_docs, ref_docs, new_emb, ref_emb


def test_ingest_gate_routing(gate_inputs):
    from matric_spark.operators.corpus import ingest_gate

    new_docs, ref_docs, new_emb, ref_emb = gate_inputs
    rows = {
        r.doc_id: r
        for r in ingest_gate(
            new_docs, ref_docs, new_emb, ref_emb, semantic_path="exact"
        ).collect()
    }
    assert set(rows) == {10, 11, 12, 13, 14}  # one verdict per new doc
    assert rows[10].decision == "drop_text_dup"
    assert rows[10].max_jaccard == pytest.approx(1.0)
    assert rows[10].novelty == pytest.approx(0.0)
    assert rows[11].decision == "keep"
    assert rows[11].max_jaccard is None  # no candidate: signal absent
    assert rows[11].novelty == pytest.approx(1.0)
    assert rows[12].decision == "drop_semantic_dup"
    assert rows[12].max_cosine >= 0.45
    assert rows[13].decision == "quarantine_low_novelty"
    assert rows[13].novelty == pytest.approx(round(2 / 14, 6))
    # stitched doc is NOT a textual near-dup of either source
    assert rows[13].max_jaccard is None or rows[13].max_jaccard < 0.5
    assert rows[14].decision == "quarantine_no_text"
    assert rows[14].max_jaccard is None and rows[14].novelty is None


def test_ingest_gate_text_dup_precedes_semantic(spark, gate_inputs):
    """A doc that is BOTH a text dup and a semantic dup routes by the
    first clause (text), pinning the CASE precedence the oracle mirrors."""
    from matric_spark.operators.corpus import ingest_gate

    _, ref_docs, _, ref_emb = gate_inputs
    new_docs = spark.createDataFrame(
        [(20, "aa bb cc dd ee ff gg hh")], ["doc_id", "text"]
    )
    new_emb = spark.createDataFrame(
        [(20, [0.999, 0.01, 0.0])], "vec_id long, embedding array<float>"
    )
    (row,) = ingest_gate(
        new_docs, ref_docs, new_emb, ref_emb, semantic_path="exact"
    ).collect()
    assert row.max_cosine is not None and row.max_cosine >= 0.45
    assert row.decision == "drop_text_dup"


def test_ingest_gate_without_embeddings(gate_inputs):
    """Text-only corpora: the semantic column exists (stable schema) but
    is NULL and never routes."""
    from matric_spark.operators.corpus import ingest_gate

    new_docs, ref_docs, _, _ = gate_inputs
    rows = {r.doc_id: r for r in ingest_gate(new_docs, ref_docs).collect()}
    assert rows[12].decision == "keep"
    assert all(r.max_cosine is None for r in rows.values())


def test_ingest_gate_ivf_path_sound(gate_inputs):
    """The production IVF semantic path may MISS pairs (recall) but every
    decision it makes must be consistent with the exact path: same rows,
    and any doc the IVF path drops semantically is dropped by exact too."""
    from matric_spark.operators.corpus import ingest_gate

    new_docs, ref_docs, new_emb, ref_emb = gate_inputs
    exact = {
        r.doc_id: r
        for r in ingest_gate(
            new_docs, ref_docs, new_emb, ref_emb, semantic_path="exact"
        ).collect()
    }
    ivf = {
        r.doc_id: r
        for r in ingest_gate(
            new_docs, ref_docs, new_emb, ref_emb,
            semantic_path="ivf",
            ivf_opts={"n_centroids": 2, "nprobe": 2, "iters": 2},
        ).collect()
    }
    assert set(ivf) == set(exact)
    for did, r in ivf.items():
        if r.decision == "drop_semantic_dup":
            assert exact[did].decision == "drop_semantic_dup"
        if r.max_cosine is not None:
            # IVF cosines are exact (verify joins real vectors back)
            assert r.max_cosine == pytest.approx(exact[did].max_cosine)
