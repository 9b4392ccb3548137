"""Text-statistics expressions for the training-data quality suite.

Design rule: every metric is a pure Column expression (codegen, no Python),
with an exactly-equivalent DuckDB formulation (list_filter/list_contains)
so the oracle verifies values bit-for-bit. Reference lineage: matric's
quality metrics are numeric column stats (R/sim_metrics.R:391-404); text
quality re-targets the same per-row → per-group scoring shape to strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tokens counted as "stopwords" for quality scoring (subset of the
#: synthetic corpus vocabulary; any fixed set works — the score is a
#: deterministic function, not a linguistic claim).
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

#: Language marker profiles for the n-gram/stopword language-ID heuristic.
#: Deterministic scoring machinery — swap profiles for real corpora.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["table", "window", "batch", "merge"],
    "en": ["the", "a", "fast", "slow", "big", "small"],
    "es": ["data", "value", "row", "scan"],
    "fr": ["query", "column", "filter", "line"],
    "zh": ["hash", "key", "join", "sort"],
}

PUNCT_CLASS = r"[.,;:!?'\"()\-]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text (empty string → [''])."""
    return F.split(F.trim(_c(text)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


#: BPE-ish token pattern (GPT-2-family shape: contraction suffixes,
#: letter runs, short digit runs, punctuation runs, each with an
#: optional leading space). Deliberately lookahead-free so Java regex
#: (Spark) and RE2 (the DuckDB oracle) match identically.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^\sA-Za-z0-9]+"


def bpe_token_count(text: Column | str) -> Column:
    """Subword-style token count: how many BPE-ish pattern matches the
    text splits into — the standard cheap proxy for LLM token budgets
    (exact BPE needs a merges table; the pattern pre-tokenizer is the
    deterministic, engine-portable part)."""
    return F.regexp_count(_c(text), F.lit(BPE_TOKEN_PATTERN)).cast("long")


def _count_in(toks: Column, vocab: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    return _count_in(toks, STOPWORDS) / F.size(toks)


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    t = _c(text)
    n = F.length(t)
    stripped = F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    return F.when(n > 0, (n - stripped) / n).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality score:
    length_term * stopword_term * (1 - capped punct ratio).

    length_term   = min(1, n_tokens/50)        — favors longer docs
    stopword_term = 1 - |stopword_ratio - 0.2| — favors natural stopword mix
    """
    n = token_count(text).cast("double")
    sw = stopword_ratio(text)
    pr = punct_ratio(text)
    return (
        F.least(F.lit(1.0), n / 50.0)
        * (F.lit(1.0) - F.abs(sw - F.lit(0.2)))
        * (F.lit(1.0) - F.least(F.lit(0.5), pr))
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit rate: hits(lang_markers)/n_tokens."""
    toks = tokens(text)
    n = F.size(toks).cast("double")
    return {
        lang: (_count_in(toks, words) / n)
        for lang, words in LANG_MARKERS.items()
    }


def predicted_lang(text: Column | str) -> Column:
    """Argmax language with alphabetical tie-break (deterministic)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = None
    for lang in sorted(scores):  # alphabetical ⇒ first max wins
        cond = scores[lang] == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr
