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
    from matric_spark.functions.hashing import shingles_of

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    staged = docs.select(
        "doc_id", norm.alias("_norm"), F.split(norm, " ").alias("_toks")
    )
    shingle_hashes = F.transform(
        shingles_of(F.col("_toks"), shingle_n), lambda s: md5_long(s)
    )
    return staged.select(
        "doc_id",
        md5_long(F.col("_norm")).alias("content_fp"),
        F.array_min(shingle_hashes).alias("min_shingle_fp"),
    )


def doc_repetition(docs: DataFrame, ns: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Per-document n-gram repetition signals (the Gopher/C4 quality-rule
    family): for each n, the fraction of n-gram occurrences taken by the
    single most frequent n-gram (`top_frac`) and by all n-grams occurring
    more than once (`dup_frac`) ->
    DataFrame[doc_id, n, total_ngrams, n_distinct, top_frac, dup_frac].

    Scale shape: explode + two-level hash aggregate keyed on
    (doc_id, n, gram) — linear in corpus size with map-side partial
    aggregation, never an O(len²) per-row expression, so a pathological
    100k-token document costs 100k rows, not 10^10 comparison ops.
    n=1 reuses the same machinery for word-level repetition (1 − TTR).
    """
    from matric_spark.functions.hashing import shingles_of
    from matric_spark.operators.dedup import normalized_text

    # NULL text yields zero n-gram rows (not a spurious [""] shingle from
    # size(NULL) = -1) — mirrored by WHERE text IS NOT NULL in the oracle.
    staged = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.split(normalized_text("text"), " ").alias("_toks")
    )
    grams = None
    for n in ns:
        g = staged.select(
            "doc_id",
            F.lit(n).alias("n"),
            F.explode(shingles_of(F.col("_toks"), n)).alias("gram"),
        )
        grams = g if grams is None else grams.unionByName(g)
    counts = grams.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("doc_id", "n").agg(
        F.sum("c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.max("c") / F.sum("c")).alias("top_frac"),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c")
        ).alias("dup_frac"),
    )


def filter_report(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 5000,
    token_len_range: tuple[float, float] = (2.0, 12.0),
    max_punct: float = 0.3,
    min_ttr: float = 0.2,
    min_quality: float = 0.2,
) -> DataFrame:
    """Quality-filter cascade audit (the C4/Gopher rule family): per doc,
    every rule's verdict, the overall keep decision, and a comma-joined
    reason string for failures →
    DataFrame[doc_id, n_tokens, ttr, kept, reasons].

    Rules: too_short / too_long (token count), token_len (mean token
    length outside `token_len_range`), punct (punctuation ratio), and
    repetitive (type-token ratio below `min_ttr` — the narrow proxy for
    word-level repetition; use doc_repetition for the exact n-gram
    fractions), low_quality (composite score).

    Scale shape: ONE narrow projection — every signal is computed from
    the row's own text (no explode, no shuffle, no join), so the audit
    runs at scan speed and pushes the doc_id/text column pruning into
    the parquet reader. reasons uses concat_ws, which skips NULL
    components on both engines, so the reason order is the fixed rule
    order with failures only.
    """
    from matric_spark.functions.text import (
        punct_ratio,
        quality_score,
        token_count,
        tokens,
    )

    toks = tokens("text")
    n = token_count("text")
    avg_len = (
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / F.size(toks)
    )
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    pr = punct_ratio("text")
    q = quality_score("text")
    lo, hi = token_len_range
    rules = [
        ("too_short", n < F.lit(min_tokens)),
        ("too_long", n > F.lit(max_tokens)),
        ("token_len", (avg_len < F.lit(lo)) | (avg_len > F.lit(hi))),
        ("punct", pr > F.lit(max_punct)),
        ("repetitive", ttr < F.lit(min_ttr)),
        ("low_quality", q < F.lit(min_quality)),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    staged = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        n.alias("n_tokens"),
        ttr.alias("ttr"),
        reasons.alias("reasons"),
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        "ttr",
        (F.col("reasons") == "").alias("kept"),
        "reasons",
    )


#: PII patterns — deliberately lookahead/backreference-free so Java regex
#: (Spark) and RE2 (the DuckDB oracle) agree on every match. Counts are
#: taken on the ORIGINAL text per pattern independently; redaction is
#: applied sequentially email → ip → phone on both engines.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact email / IPv4 / phone-shaped spans ->
    DataFrame[doc_id, n_emails, n_ips, n_phones, text_redacted].

    Pure codegen scan (regexp_count + chained regexp_replace): no shuffle,
    no Python — at 100 TB this runs at parquet-scan speed. The redaction
    ORDER is part of the contract (emails contain digits a later phone
    pass must not see; the [EMAIL]/[IP] placeholders contain none).
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL, "[EMAIL]")
    red = F.regexp_replace(red, PII_IP, "[IP]")
    red = F.regexp_replace(red, PII_PHONE, "[PHONE]")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IP)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        red.alias("text_redacted"),
    )


def term_df(docs: DataFrame, min_df: int = 2) -> DataFrame:
    """Corpus vocabulary statistics: per token, the document frequency
    and total term frequency -> DataFrame[token, df, total_tf].

    The classic giant-shuffle aggregation, built to survive it: tokens
    are pre-counted per document (groupBy(doc_id, token) — map-side
    combine collapses each doc's repeats before the exchange), then the
    per-token rollup shuffles one row per (doc, distinct token), never
    one per occurrence. `min_df` prunes the hapax tail on output.
    """
    from matric_spark.operators.dedup import normalized_text

    per_doc = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        per_doc.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
        )
        .filter(F.col("df") >= min_df)
    )


def tfidf_topk(docs: DataFrame, k: int = 5, min_df: int = 1) -> DataFrame:
    """Top-k salient terms per document by TF-IDF ->
    DataFrame[doc_id, token, tf, df, score, rank].

    The idf is the LOG-FREE ratio (n_docs+1)/(df+1): monotone in the
    usual idf, but computed as one exact-integer product and one IEEE
    division — bitwise identical across engines, so rank order (and the
    byte-strict oracle hash) can never diverge by a ulp the way ln()
    results can. Ties break on token ascending.

    Scale shape: per-doc tf via groupBy(doc_id, token) with map-side
    combine; the df table joins back as a plain shuffle-hash join keyed
    on `token` — like doc_lm_score's ctf it has |vocab| rows (1e8-1e9
    distinct normalized tokens on a web corpus), so it must NOT be
    hint-broadcast; per_doc is already hash-partitioned by (doc_id,
    token) and carries ids+counts only, never text. AQE is still free to
    pick a broadcast from runtime size stats when min_df pruning leaves
    a small table. Pinned by tests/test_plans.py. The 1-row n_docs
    scalar IS broadcast. Top-k is one window keyed on doc_id.
    """
    from matric_spark.operators.dedup import normalized_text
    from pyspark.sql import Window

    per_doc = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfx = (
        per_doc.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        per_doc.join(dfx, "token")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (
                (F.col("tf") * (F.col("n_docs") + 1))
                / (F.col("df") + 1)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def doc_lm_score(docs: DataFrame) -> DataFrame:
    """Corpus-unigram LM quality score per document (the CCNet/KenLM
    perplexity-filter pattern with the corpus itself as the LM) ->
    DataFrame[doc_id, n_tokens, lm_logprob].

    p(t) = (ctf_t + 1) / (T + V)  (add-one smoothing over corpus term
    frequency T and vocab size V); lm_logprob is the per-token mean
    log-probability — low values flag gibberish / far-out-of-distribution
    docs, the standard cheap quality gate before training.

    Scale shape: per-doc tf via one groupBy(doc_id, token) with map-side
    combine; the corpus term-frequency relation joins back as a plain
    shuffle-hash join keyed on `token` — per_doc is already partitioned
    by (doc_id, token) and ctf by token, so the join shuffles ids+counts
    only, never text. ctf is deliberately NOT broadcast: it has |vocab|
    rows, and on a web corpus distinct normalized tokens run to 1e8-1e9 —
    a broadcast would OOM the driver (the scalar `totals` relation, 1
    row, IS broadcast). Pinned by tests/test_plans.py. No window, no
    join on the doc axis. ln() is evaluated identically on identical
    doubles on both engines; the 6dp round absorbs the ≤1-ulp
    libm-vs-JVM difference (same contract as the PSI oracle).
    """
    from matric_spark.operators.dedup import normalized_text

    per_doc = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ctf = per_doc.groupBy("token").agg(F.sum("tf").alias("ctf"))
    totals = ctf.agg(
        F.sum("ctf").alias("t_total"), F.count(F.lit(1)).alias("vocab")
    )
    logp = F.log(
        (F.col("ctf") + 1) / (F.col("t_total") + F.col("vocab"))
    )
    return (
        per_doc.join(ctf, "token")
        .join(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (F.sum(F.col("tf") * logp) / F.sum("tf")).alias("lm_logprob"),
        )
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


def zipf_fit(docs: DataFrame, top_n: int = 500, group_col: str = "lang") -> DataFrame:
    """Zipf's-law fit per `group_col`: OLS of ln(term_frequency) on
    ln(rank) over each group's `top_n` most frequent tokens →
    DataFrame[group_col, n_terms, slope, intercept, r2].

    The corpus-health diagnostic behind "does this look like natural
    language": clean prose fits ln(tf) ≈ intercept − s·ln(rank) with
    s ≈ 1 and high r²; boilerplate/template floods flatten the head
    (s « 1), spam/generated gibberish breaks linearity (low r²) — a
    whole-corpus complement to the per-doc quality cascade
    (filter_report).

    Scale shape: the vocabulary rollup is ONE count shuffle keyed on
    (group, token) — map-side combine collapses each partition's
    repeats before the exchange (unlike term_df, no per-doc phase is
    needed: only the total tf is consumed). The ranking window
    partitions BY GROUP (no single-partition exchange), and the
    regression consumes top_n aggregated rows per group — the raw table
    is scanned once. Tie-break (tf desc, token asc) is deterministic on
    both engines.
    """
    from pyspark.sql import Window

    from matric_spark.operators.dedup import normalized_text

    vocab = (
        docs.select(
            F.col(group_col).alias("g"),
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .groupBy("g", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("g").orderBy(F.desc("tf"), F.asc("token"))
    ranked = (
        vocab.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= top_n)
        .select(
            "g",
            "tf",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("tf").cast("double")).alias("y"),
        )
    )
    s = ranked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("tf").alias("tf_min"),
        F.max("tf").alias("tf_max"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    # fixed float op ORDER, mirrored verbatim by the DuckDB oracle.
    # Degenerate groups yield NULL slope/intercept/r2 — guarded by
    # INTEGER predicates (n > 1 ⟺ rank variance > 0; tf_min < tf_max ⟺
    # tf variance > 0), never by float-zero tests: the floating
    # residual of syy - sy²/n under catastrophic cancellation is
    # summation-order dependent, so `vary != 0` could disagree between
    # Spark's partial-agg tree and DuckDB's sequential sum. The guards
    # also keep ANSI mode from raising DIVIDE_BY_ZERO.
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vary = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    slope = F.when(F.col("n") > 1, cov / varx)
    return s.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_terms"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
        F.when(
            (F.col("n") > 1) & (F.col("tf_min") < F.col("tf_max")),
            cov * cov / (varx * vary),
        ).alias("r2"),
    )


def vocab_drift(
    df: DataFrame,
    partition_col: str = "part_month",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary churn between consecutive populated partitions: token-set
    Jaccard + new-token rate — the corpus-health counterpart of the value
    drift suite (checks/drift.py). A crawler source switching domains, a
    template flood, or a language-mix shift all move the VOCABULARY long
    before they move length/value distributions; new_token_rate is the
    canary a training-data pipeline alerts on.

    Returns one row per partition that has a predecessor:
    (partition, prev_part, vocab_size, prev_vocab, inter_size, jaccard,
    new_token_rate) where jaccard = |A∩B| / |A∪B| over the distinct
    token sets and new_token_rate = fraction of this partition's tokens
    unseen in the previous one.

    Scale shape: distinct (partition, token) pairs (map-side partial
    distinct collapses per-partition repeats), one equi-join keyed on
    token to count intersections with the predecessor cohort, and a lag
    window over ONE ROW PER PARTITION for adjacency. The month-adjacency
    table is broadcast; the token join shuffles vocab-sized tables, not
    the corpus.
    """
    from pyspark.sql import Window

    from matric_spark.functions.hashing import md5_long
    from matric_spark.operators.dedup import normalized_text

    # hash-first: tokens become 60-bit longs BEFORE the distinct, so both
    # shuffles (distinct, intersection join) carry 8-byte keys instead of
    # strings; set sizes are identical to string-distinct modulo a 2^-60
    # collision (the fd_violations convention).
    # toks feeds THREE consumers (vocab sizes, both intersection-join
    # sides), so the explode+distinct re-executes per consumer. KEPT
    # LAZY deliberately: each consumer's partial aggregation collapses
    # the exploded tokens map-side (only |partitions|×|vocab| hash rows
    # cross any exchange), so the recompute is scan-bound — and an
    # eager localCheckpoint cut was MEASURED 2.3× slower at sf0.1
    # (34.8 s vs 14.8 s cold) because it serializes the whole pipeline
    # behind one materialization job. At cluster scale, materialize the
    # distinct (partition, token-hash) table to parquet once per run if
    # the corpus scan dominates (CLAUDE.md convention), same shape.
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            partition_col,
            F.explode(F.split(normalized_text(text_col), " ")).alias("_t"),
        )
        .select(partition_col, md5_long(F.col("_t")).alias("token"))
        .distinct()
    )
    vocab = toks.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("vocab_size")
    )
    w = Window.orderBy(partition_col)
    months = vocab.select(
        partition_col,
        "vocab_size",
        F.lag(partition_col).over(w).alias("prev_part"),
        F.lag("vocab_size").over(w).alias("prev_vocab"),
    ).filter(F.col("prev_part").isNotNull())

    b = toks.join(
        F.broadcast(months.select(partition_col, "prev_part")), partition_col
    )
    a = toks.select(
        F.col(partition_col).alias("prev_part"), F.col("token").alias("token")
    )
    inter = (
        b.join(a, ["prev_part", "token"])
        .groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    out = months.join(inter, partition_col, "left").withColumn(
        "inter_size", F.coalesce(F.col("inter_size"), F.lit(0))
    )
    union = (
        F.col("vocab_size") + F.col("prev_vocab") - F.col("inter_size")
    ).cast("double")
    return out.select(
        partition_col,
        "prev_part",
        "vocab_size",
        "prev_vocab",
        "inter_size",
        (F.round(F.col("inter_size") / union, 6) + F.lit(0.0)).alias("jaccard"),
        (
            F.round(
                (F.col("vocab_size") - F.col("inter_size"))
                / F.col("vocab_size").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("new_token_rate"),
    )
