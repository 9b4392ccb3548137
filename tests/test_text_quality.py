"""Repetition signals, PII scrubbing, and vocabulary stats
(operators/text_analysis.doc_repetition / pii_scrub / term_df).
"""

from __future__ import annotations

import pytest

from matric_spark.operators.text_analysis import (
    doc_repetition,
    pii_scrub,
    term_df,
)


@pytest.fixture(scope="module")
def rep_docs(spark):
    rows = [
        (1, "a a a a"),              # one token repeated 4x
        (2, "a b c d"),              # all distinct
        (3, "x y x y x y"),          # bigram "x y" dominates
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_word_level(rep_docs):
    out = {
        (r.doc_id, r.n): r
        for r in doc_repetition(rep_docs, ns=(1, 2)).collect()
    }
    r1 = out[(1, 1)]
    assert r1.total_ngrams == 4 and r1.n_distinct == 1
    assert r1.top_frac == 1.0 and r1.dup_frac == 1.0
    r2 = out[(2, 1)]
    assert r2.top_frac == 0.25 and r2.dup_frac == 0.0
    # doc 3 bigrams: "x y","y x","x y","y x","x y" → top "x y" 3/5
    r3 = out[(3, 2)]
    assert r3.total_ngrams == 5 and r3.n_distinct == 2
    assert r3.top_frac == 0.6 and r3.dup_frac == 1.0


def test_repetition_null_text_emits_no_rows_like_oracle(spark):
    """NULL text must yield zero n-gram rows (Spark's size(NULL) = -1
    would otherwise fabricate a [""] shingle), matching the oracle's
    unnest-over-NULL behavior row for row."""
    import duckdb

    from matric_spark.duck_oracle import doc_repetition_sql

    rows = [(1, None), (2, "a b a")]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted(
        (r.doc_id, r.n, r.total_ngrams, r.n_distinct)
        for r in doc_repetition(d, ns=(1, 2)).collect()
    )
    assert all(doc_id == 2 for doc_id, *_ in got)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        (r[0], r[1], r[2], r[3])
        for r in con.execute(doc_repetition_sql(ns=(1, 2))).fetchall()
    )
    assert got == want


def test_repetition_short_doc_whole_text_shingle(spark):
    d = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    out = doc_repetition(d, ns=(3,)).collect()
    # shorter than n → single whole-text shingle
    assert len(out) == 1 and out[0].total_ngrams == 1 and out[0].top_frac == 1.0


def test_pii_scrub_counts_and_redaction(spark):
    rows = [
        (1, "mail me at jane.doe+x@corp.example.org thanks"),
        (2, "server 192.168.0.1 and 10.0.0.255 rebooted"),
        (3, "call +1 (555) 010-9999 now"),
        (4, "clean text with no pii at all"),
        (5, "mix a@b.io on 8.8.8.8 dial 555-010-1234 end"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in pii_scrub(d).collect()}
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (1, 0, 0)
    assert "[EMAIL]" in out[1].text_redacted and "@" not in out[1].text_redacted
    assert out[2].n_ips == 2 and out[2].text_redacted.count("[IP]") == 2
    assert out[3].n_phones == 1 and "[PHONE]" in out[3].text_redacted
    assert out[4].text_redacted == rows[3][1]
    assert (out[5].n_emails, out[5].n_ips, out[5].n_phones) == (1, 1, 1)
    red = out[5].text_redacted
    assert "[EMAIL]" in red and "[IP]" in red and "[PHONE]" in red


def test_pii_redaction_order_email_digits_not_rematched(spark):
    # the email's digits must not later be matched as a phone: redaction
    # goes email → ip → phone and the placeholder carries no digits
    d = spark.createDataFrame(
        [(1, "reach 12345678a@example.com here")], ["doc_id", "text"]
    )
    r = pii_scrub(d).collect()[0]
    assert r.n_emails == 1
    assert r.text_redacted == "reach [EMAIL] here"


def test_term_df_counts(spark):
    rows = [
        (1, "spark spark duck"),
        (2, "spark row"),
        (3, "duck row row"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.token: r for r in term_df(d, min_df=2).collect()}
    assert set(out) == {"spark", "duck", "row"}
    assert (out["spark"].df, out["spark"].total_tf) == (2, 3)
    assert (out["duck"].df, out["duck"].total_tf) == (2, 2)
    assert (out["row"].df, out["row"].total_tf) == (2, 3)


def test_tfidf_topk_ranks_rare_terms_higher(spark):
    from matric_spark.operators.text_analysis import tfidf_topk

    rows = [
        (1, "common rare common common"),
        (2, "common other"),
        (3, "common thing"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = [r for r in tfidf_topk(d, k=2).collect() if r.doc_id == 1]
    out.sort(key=lambda r: r.rank)
    # doc 1: tf(common)=3 df=3 → 3*4/4=3.0; tf(rare)=1 df=1 → 1*4/2=2.0
    assert [r.token for r in out] == ["common", "rare"]
    assert out[0].score == 3.0 and out[1].score == 2.0


def test_tfidf_topk_k_bound_and_tie_break(spark):
    from matric_spark.operators.text_analysis import tfidf_topk

    d = spark.createDataFrame([(1, "b a c d e f")], ["doc_id", "text"])
    out = sorted(tfidf_topk(d, k=3).collect(), key=lambda r: r.rank)
    # all terms tie (tf=1, df=1) → token-ascending order, only k rows
    assert [r.token for r in out] == ["a", "b", "c"]


def test_conversation_fingerprint_dup_groups(spark):
    import datetime as dt

    from matric_spark.checks.sequence import conversation_fingerprint

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # X and Y: identical (role, text) tapes, different ts → same fp
        ("X", 0, "user", "hi", None, t0),
        ("X", 1, "assistant", "hello", None, t0),
        ("Y", 0, "user", "hi", None, t0),
        ("Y", 1, "assistant", "hello", None, t0),
        # Z: same texts, different role on turn 1 → different fp
        ("Z", 0, "user", "hi", None, t0),
        ("Z", 1, "user", "hello", None, t0),
        # W: null text must not collide with the literal string
        ("W", 0, "user", None, None, t0),
    ]
    d = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {r.conv_id: r for r in conversation_fingerprint(d).collect()}
    assert out["X"].conv_fp == out["Y"].conv_fp
    assert out["X"].group_size == 2 and out["Y"].group_size == 2
    assert out["X"].canonical_conv_id == "X"
    assert out["X"].is_canonical and not out["Y"].is_canonical
    assert out["Z"].conv_fp != out["X"].conv_fp
    assert out["Z"].group_size == 1 and out["Z"].is_canonical
    assert len({r.conv_fp for r in out.values()}) == 3


def test_conversation_fingerprint_order_independent_of_input(spark):
    import datetime as dt

    from matric_spark.checks.sequence import conversation_fingerprint

    t0 = dt.datetime(2024, 1, 1)
    fwd = [("C", i, "user", f"t{i}", None, t0) for i in range(4)]
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    a = conversation_fingerprint(spark.createDataFrame(fwd, schema)).collect()
    b = conversation_fingerprint(
        spark.createDataFrame(list(reversed(fwd)), schema)
    ).collect()
    assert a[0].conv_fp == b[0].conv_fp


def test_pii_scrub_is_shuffle_free(spark):
    d = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = pii_scrub(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_term_df_partial_agg_before_exchange(spark):
    """Both aggregation levels must show partial_ aggregates (map-side
    combine) so per-occurrence rows never cross the wire."""
    d = spark.createDataFrame([(1, "x y x")], ["doc_id", "text"])
    plan = term_df(d)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan


def test_doc_lm_score_closed_form(spark):
    import math

    from matric_spark.operators.text_analysis import doc_lm_score

    d = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in doc_lm_score(d).collect()}
    # ctf: a=3 b=1 c=1; T=5 V=3; p(a)=4/8 p(b)=p(c)=2/8
    exp1 = (2 * math.log(0.5) + math.log(0.25)) / 3
    exp2 = (math.log(0.5) + math.log(0.25)) / 2
    assert out[1].n_tokens == 3 and out[2].n_tokens == 2
    assert out[1].lm_logprob == pytest.approx(exp1)
    assert out[2].lm_logprob == pytest.approx(exp2)
    # rarer-token doc scores lower (the quality-gate direction)
    assert out[2].lm_logprob < out[1].lm_logprob


def test_filter_report_rules_and_reasons(spark):
    from matric_spark.operators.text_analysis import filter_report

    rows = [
        (1, "one two"),                                  # too_short (2 toks)
        (2, " ".join(f"w{i}" for i in range(100))),      # clean long doc
        (3, " ".join(["dup"] * 50)),                     # repetitive: ttr .02
        (4, "!!! ... ;;; " * 10 + "a b c d e f"),        # punct-heavy
        (5, "supercalifragilisticexpialidocious " * 10 + "a b c d"),  # token_len
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in filter_report(df).collect()}
    assert not out[1].kept and "too_short" in out[1].reasons
    assert out[2].kept and out[2].reasons == ""
    assert not out[3].kept and "repetitive" in out[3].reasons
    assert out[3].ttr == pytest.approx(1 / 50)
    assert not out[4].kept and "punct" in out[4].reasons
    assert not out[5].kept and "token_len" in out[5].reasons
    # short docs also trip the quality composite
    assert "low_quality" in out[1].reasons


def test_zipf_fit_planted_power_law(spark):
    """A corpus built to follow tf(r) = C/r exactly fits slope ≈ -1 with
    r² ≈ 1; a degenerate single-term group has zero rank variance and
    yields NULLs instead of an ANSI divide-by-zero error."""
    from matric_spark.operators.text_analysis import zipf_fit

    words = []
    for i in range(1, 21):
        words += [f"w{i:02d}"] * round(720 / i)
    zipfy = spark.createDataFrame(
        [(0, "en", " ".join(words))], "doc_id long, lang string, text string"
    )
    r = zipf_fit(zipfy, top_n=20).collect()[0]
    assert r.n_terms == 20
    assert -1.05 < r.slope < -0.95
    assert r.r2 > 0.99

    single = spark.createDataFrame(
        [(0, "en", "same same same")], "doc_id long, lang string, text string"
    )
    d = zipf_fit(single, top_n=20).collect()[0]
    assert d.n_terms == 1
    assert d.slope is None and d.intercept is None and d.r2 is None
