"""Text-analysis operators over the `documents` table.

Per-doc scoring is a narrow projection + codegen expressions (no shuffle);
the corpus rollup is a single hash aggregate on (lang, source). At 100 TB
this is scan-bound — exactly what you want: no joins, no Python, column
pruning pushes the scan down to (doc_id, text[, lang, source]).

Reference lineage: per-group mean/sd stats shape from matric
R/sim_metrics.R:391-404; scoring-then-rollup mirrors level_1_0 → level_1
aggregation (R/sim_metrics.R:199-233).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matric_spark.functions.hashing import md5_long, word_shingles
from matric_spark.functions.text import (
    bpe_token_count,
    lang_scores,
    predicted_lang,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)


def doc_text_stats(docs: DataFrame) -> DataFrame:
    """Per-document token/char/quality statistics."""
    toks = tokens("text")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_token_count("text").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        (
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.size(toks)
        ).alias("avg_token_len"),
        stopword_ratio("text").alias("stopword_ratio"),
        punct_ratio("text").alias("punct_ratio"),
        quality_score("text").alias("quality"),
    )


def doc_langid(docs: DataFrame) -> DataFrame:
    """Marker-profile language-ID scores + argmax prediction."""
    scores = lang_scores("text")
    cols = [scores[lang].alias(f"score_{lang}") for lang in sorted(scores)]
    return docs.select("doc_id", "lang", *cols, predicted_lang("text").alias("pred_lang"))


def doc_fingerprint(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """Content fingerprints: whole-doc hash of normalized text + the
    minimum shingle hash (a 1-permutation MinHash, the winnowing anchor)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    shingle_hashes = F.transform(
        word_shingles(norm, shingle_n), lambda s: md5_long(s)
    )
    return docs.select(
        "doc_id",
        md5_long(norm).alias("content_fp"),
        F.array_min(shingle_hashes).alias("min_shingle_fp"),
    )


def corpus_quality(docs: DataFrame) -> DataFrame:
    """Rollup of quality stats per (lang, source) — one hash aggregate."""
    scored = docs.select(
        "lang",
        "source",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )
    return scored.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("quality").alias("avg_quality"),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
    )
