"""Planted-violation tests for the declarative constraint checks
(checks/constraints.py), the boilerplate detector (dedup.
cross_group_duplicates), and the embedding integrity audit
(checks/embedding.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from matric_spark.checks.constraints import (
    Rule,
    default_transcript_rules,
    fd_violations,
    rule_violations,
)
from matric_spark.checks.embedding import embedding_integrity
from matric_spark.operators.dedup import cross_group_duplicates


def test_fd_violations_flags_only_disagreeing_duplicates(tiny_transcripts):
    # (B, 1) is duplicated with DIFFERENT text ('a1' vs 'a1-dup') → FD hit.
    # No other key is duplicated, so uniqueness ⊋ FD here.
    out = fd_violations(
        tiny_transcripts, ["conv_id", "turn_idx"], ["text", "role"]
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.conv_id, row.turn_idx) == ("B", 1)
    assert row.n_rows == 2 and row.n_text == 2 and row.n_role == 1


def test_fd_violations_agreeing_duplicates_pass(spark):
    # same key twice with identical payload → NOT an FD violation
    df = spark.createDataFrame(
        [("A", 0, "x"), ("A", 0, "x"), ("B", 0, "y")], "k string, i int, v string"
    )
    assert fd_violations(df, ["k", "i"], ["v"]).count() == 0


def test_fd_violations_null_semantics(spark):
    # NULL dependent never conflicts (count-distinct skips it); NULL keys
    # are excluded entirely (join semantics).
    df = spark.createDataFrame(
        [("A", "x"), ("A", None), (None, "p"), (None, "q")], "k string, v string"
    )
    assert fd_violations(df, ["k"], ["v"]).count() == 0


def test_rule_violations_planted(tiny_transcripts):
    out = rule_violations(tiny_transcripts, default_transcript_rules())
    got = {(r.rule, r.conv_id, r.turn_idx) for r in out.collect()}
    assert got == {
        # telnet tool on an assistant row
        ("tool_turns_use_tool_role", "C", 2),
        # moderator at turn 0 / conversation B opens with a user turn
        ("first_turn_is_system", "C", 0),
        ("first_turn_is_system", "B", 0),
        # null text on a user turn
        ("dialogue_text_present", "B", 3),
    }
    # B2 is role='tool' WITH tool set → not a violation of rule 1


def test_rule_violations_multiple_rules_one_row(spark):
    # one row can violate several rules → one output row per (rule, row)
    df = spark.createDataFrame(
        [("A", 0, "user", None, "bash", 1)],
        "conv_id string, turn_idx int, role string, text string, tool string, part_month int",
    )
    out = rule_violations(df, default_transcript_rules())
    assert {r.rule for r in out.collect()} == {
        "tool_turns_use_tool_role",
        "first_turn_is_system",
        "dialogue_text_present",
    }


def test_rule_null_must_is_violation(spark):
    # three-valued logic collapses to failed-check: must==NULL → violated
    df = spark.createDataFrame([("A", 0, None, None, None, 1)],
        "conv_id string, turn_idx int, role string, text string, tool string, part_month int")
    r = Rule("role_known", F.lit(True), F.col("role") == "user")
    assert rule_violations(df, [r]).count() == 1


def test_cross_group_duplicates_counts_containers(spark):
    rows = (
        [("c%d" % i, "the same boilerplate") for i in range(5)]
        + [("c0", "the same boilerplate")]  # within-group repeat: n_rows only
        + [("c0", "unique line"), ("c1", "pair line"), ("c2", "pair line")]
    )
    df = spark.createDataFrame(rows, "conv_id string, text string")
    out = {r.content_fp: r for r in
           cross_group_duplicates(df, "conv_id", "text", min_groups=3).collect()}
    assert len(out) == 1  # only the 5-conversation boilerplate crosses 3
    (row,) = out.values()
    assert row.n_groups == 5 and row.n_rows == 6
    # at min_groups=2 the pair line appears too
    assert cross_group_duplicates(df, "conv_id", "text", min_groups=2).count() == 2


def test_embedding_integrity_planted(spark):
    nan, inf = float("nan"), float("inf")
    rows = [
        (1, [3.0, 4.0], 0),          # valid, norm 5
        (2, [0.0, 0.0], 0),          # zero norm
        (3, [1.0, nan], 0),          # NaN component
        (4, [1.0, -inf], 0),         # Inf component
        (5, None, 0),                # NULL vector
        (6, [1.0, 2.0, 2.0], 0),     # wrong dim
        (7, [6.0, 8.0], 1),          # valid, norm 10 (other group)
        (8, [1.0, None], 0),         # NULL component (review finding:
                                     # F.exists(isnan) is NULL here, so it
                                     # needs its own counter)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in embedding_integrity(df, expected_dim=2).collect()}
    g0 = out[0]
    assert (g0.n_vecs, g0.n_null_vec, g0.n_bad_dim, g0.n_null_component,
            g0.n_nonfinite, g0.n_zero_norm) == (7, 1, 1, 1, 2, 1)
    assert math.isclose(g0.min_norm, 5.0) and math.isclose(g0.max_norm, 5.0)
    assert math.isclose(g0.avg_norm, 5.0)
    g1 = out[1]
    assert (g1.n_vecs, g1.n_zero_norm) == (1, 0)
    assert math.isclose(g1.avg_norm, 10.0)


def test_rule_violations_is_shuffle_free(tiny_transcripts):
    # the rule pack must stay a narrow map: no Exchange in the plan
    plan = rule_violations(
        tiny_transcripts, default_transcript_rules()
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_partition_volume_gap_and_delta(spark):
    from matric_spark.checks.column_stats import partition_volume

    # 202312: 100 rows; 202401: 40 rows (-60%); 202403: 50 rows
    # (202402 missing -> gap_months 1)
    rows = (
        [(202312, i) for i in range(100)]
        + [(202401, i) for i in range(40)]
        + [(202403, i) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "part_month int, x int")
    out = {r.part_month: r for r in partition_volume(df, "part_month").collect()}
    assert out[202312].prev_part is None and out[202312].delta_pct is None
    assert out[202401].gap_months == 0 and abs(out[202401].delta_pct + 0.6) < 1e-9
    assert out[202403].gap_months == 1 and out[202403].prev_part == 202401
    assert abs(out[202403].delta_pct - 0.25) < 1e-9
    # anomaly filter keeps the shrink and the gap, drops the first row
    flagged = partition_volume(df, "part_month", max_abs_delta=0.5).collect()
    assert {r.part_month for r in flagged} == {202401, 202403}


def test_vocab_drift_churn(spark):
    from matric_spark.operators.text_analysis import vocab_drift

    rows = (
        # 202401 vocab {a b c d}; 202402 vocab {c d e f}: inter 2,
        # union 6, jaccard 1/3, new rate 1/2; 202403 identical to 202402
        [(202401, "a b"), (202401, "c d")]
        + [(202402, "c d"), (202402, "e f")]
        + [(202403, "c d e f")]
    )
    df = spark.createDataFrame(rows, "part_month int, text string")
    out = {r.part_month: r for r in vocab_drift(df, "part_month").collect()}
    assert set(out) == {202402, 202403}  # first month has no predecessor
    r2 = out[202402]
    assert (r2.vocab_size, r2.prev_vocab, r2.inter_size) == (4, 4, 2)
    assert abs(r2.jaccard - 1 / 3) < 1e-6 and abs(r2.new_token_rate - 0.5) < 1e-6
    r3 = out[202403]
    assert r3.inter_size == 4 and r3.jaccard == 1.0 and r3.new_token_rate == 0.0


def test_dedup_impact_attribution(spark):
    import datetime as dt

    from matric_spark.operators.dedup import dedup_impact

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # 'dup' first copy lives in A/202401 (kept), two more copies:
        # one in 202401, one in 202402 -> dup mass split across months
        ("A", 0, "dup", t0, 202401),
        ("B", 0, "dup", t0, 202401),
        ("C", 0, "dup", t0, 202402),
        ("A", 1, "unique one", t0, 202401),
        ("C", 1, None, t0, 202402),  # null text: excluded entirely
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp, part_month int"
    )
    out = {r.part_month: r for r in dedup_impact(df, "part_month").collect()}
    m1, m2 = out[202401], out[202402]
    assert (m1.n_text_rows, m1.n_dup_rows) == (3, 1)  # B0 is the 2nd copy
    assert (m2.n_text_rows, m2.n_dup_rows) == (1, 1)  # C0 is the 3rd copy
    assert m1.bytes_total == 3 + 3 + 10 and m1.bytes_dup == 3
    assert abs(m1.dup_pct - 1 / 3) < 1e-6 and m2.dup_pct == 1.0


def test_verdicts_extended_families(tiny_transcripts):
    from matric_spark.checks.suite import (
        SuiteConfig,
        run_verdicts,
        run_verdicts_extended,
    )

    cfg = SuiteConfig()
    ext = run_verdicts_extended(tiny_transcripts, cfg)
    rows = {(r.part, r.check_id): (r.metric, r.status) for r in ext.collect()}
    core_n = run_verdicts(tiny_transcripts, cfg).count()
    # 5 extra families x 2 partitions on top of the core table
    assert len(rows) == core_n + 2 * 5
    # part 2 holds conv C: telnet tool on assistant turn + moderator at 0
    assert rows[(2, "rule_tool_turns_use_tool_role")] == (1.0, "fail")
    assert rows[(2, "rule_first_turn_is_system")] == (1.0, "fail")
    # part 1 holds B3 (null text on user) and B0 (user at turn 0)
    assert rows[(1, "rule_dialogue_text_present")] == (1.0, "fail")
    assert rows[(1, "rule_first_turn_is_system")] == (1.0, "fail")
    # FD conflict: (B,1) duplicated with different text, lives in part 1
    assert rows[(1, "fd_conflict")] == (1.0, "fail")
    assert rows[(2, "fd_conflict")] == (0.0, "pass")
    # volume: part 1 (first) has no predecessor; part 2 drops 8 -> 2 rows
    m1, s1 = rows[(1, "volume_delta")]
    assert m1 is None and s1 == "pass"
    m2, s2 = rows[(2, "volume_delta")]
    assert abs(m2 - (2 - 8) / 8) < 1e-6 and s2 == "fail"


def test_exact_k_per_stratum(spark):
    from matric_spark.operators.sampling import exact_k_per_stratum

    rows = [(i, "en" if i % 3 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = exact_k_per_stratum(df, ["doc_id"], "lang", k=10, salt="t")
    got = out.groupBy("lang").count().collect()
    assert {r.lang: r["count"] for r in got} == {"en": 10, "de": 10}
    # deterministic: re-run selects the identical set
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in exact_k_per_stratum(df, ["doc_id"], "lang", 10, "t").collect()
    )
    assert a == b
    # stratum isolation: adding rows to 'de' never changes 'en's picks
    more = df.union(
        spark.createDataFrame([(1000 + i, "de") for i in range(50)], "doc_id long, lang string")
    )
    en_before = {r.doc_id for r in out.filter("lang = 'en'").collect()}
    en_after = {
        r.doc_id
        for r in exact_k_per_stratum(more, ["doc_id"], "lang", 10, "t")
        .filter("lang = 'en'")
        .collect()
    }
    assert en_before == en_after


def test_quarantine_split(tiny_transcripts):
    from matric_spark.checks.quarantine import quarantine, quarantine_summary

    clean, bad = quarantine(tiny_transcripts)
    # partition: every input row lands on exactly one side
    assert clean.count() + bad.count() == tiny_transcripts.count()
    assert clean.columns == tiny_transcripts.columns
    reasons = {(r.conv_id, r.turn_idx): r.reasons for r in bad.collect()}
    # moderator at C0: bad domain + first-turn rule
    assert reasons[("C", 0)] == "bad_role,rule"
    # telnet at C2: bad tool domain + tool-role rule
    assert reasons[("C", 2)] == "bad_tool,rule"
    # both (B,1) copies held as duplicate-key members
    assert reasons[("B", 1)] == "dup_key"
    # B2 went backwards in time
    assert "ooo" in reasons[("B", 2)]
    # B3: null text on user turn (null_text + rule); B0: user at turn 0
    assert reasons[("B", 3)] == "null_text,rule" and reasons[("B", 0)] == "rule"
    # conv A is fully clean
    assert not any(c == "A" for c, _ in reasons)

    summ = {r.part: r for r in quarantine_summary(tiny_transcripts).collect()}
    assert summ[1].n_rows == 8 and summ[1].n_clean == 3  # all of A
    assert summ[1].n_dup_key == 2 and summ[1].n_ooo == 1
    assert summ[1].n_null_text == 1 and summ[1].n_null_ts == 0
    assert summ[2].n_quarantined == 2 and summ[2].n_clean == 0
    for p in (1, 2):
        assert summ[p].n_quarantined + summ[p].n_clean == summ[p].n_rows


def test_quarantine_conversation_granularity(tiny_transcripts):
    from matric_spark.checks.quarantine import quarantine

    clean, bad = quarantine(tiny_transcripts, granularity="conversation")
    # B and C each contain at least one bad turn -> every turn held;
    # A is fully clean and survives intact
    assert {r.conv_id for r in clean.collect()} == {"A"}
    held = bad.collect()
    assert {r.conv_id for r in held} == {"B", "C"}
    # every held turn of a conversation carries the conversation's
    # reason union
    b_reasons = {r.reasons for r in held if r.conv_id == "B"}
    assert b_reasons == {"null_text,rule,dup_key,ooo"}
    import pytest

    with pytest.raises(ValueError):
        quarantine(tiny_transcripts, granularity="file")


def test_cluster_size_stats(spark):
    from matric_spark.operators.graph import cluster_size_stats

    # clusters: {1,2,3} size 3, {10,11} size 2, {20,21} size 2
    rows = [
        (1, 1, 3), (2, 1, 3), (3, 1, 3),
        (10, 10, 2), (11, 10, 2),
        (20, 20, 2), (21, 20, 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long, cluster_size long")
    out = {r.cluster_size: r for r in cluster_size_stats(df).collect()}
    assert out[3].n_clusters == 1 and out[3].n_docs == 3 and out[3].n_removable == 2
    assert out[2].n_clusters == 2 and out[2].n_docs == 4 and out[2].n_removable == 2


def test_volume_trend_closed_form(spark):
    from matric_spark.checks.column_stats import volume_trend

    # perfectly linear growth: 100, 200, 300 rows over consecutive months
    rows = (
        [(202401, i) for i in range(100)]
        + [(202402, i) for i in range(200)]
        + [(202403, i) for i in range(300)]
    )
    df = spark.createDataFrame(rows, "part_month int, x int")
    r = volume_trend(df, "part_month").collect()[0]
    assert r.n_partitions == 3
    assert abs(r.slope - 100.0) < 1e-6 and abs(r.r2 - 1.0) < 1e-6
    # degenerate: one month -> NULL slope/r2 (nothing to fit)
    one = spark.createDataFrame([(202401, 1), (202401, 2)], "part_month int, x int")
    r1 = volume_trend(one, "part_month").collect()[0]
    assert r1.n_partitions == 1 and r1.slope is None and r1.r2 is None
