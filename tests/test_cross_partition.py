"""Cross-partition semantics: conversations spanning ds values must get
the same violations from (a) the composable pipeline, (b) the fused
single-shuffle plan, and (c) the per-partition checkpoint run with tail
stitching — the scenario the checkpoint path silently diverged on before
boundary context existed.

Covers:
- uniqueness key is global (conv_id, turn_idx), emitted at min(ds)
- window lag rules see across the partition boundary via tail context
- cross-partition duplicate keys are caught in checkpoint mode
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.plans import checkpoint as CP
from faang_pydantics_validation_spark.plans.fused import validate_transcripts_fused
from faang_pydantics_validation_spark.plans.pipeline import validate_transcripts
from faang_pydantics_validation_spark.rules.spec import RuleSpec

CMP = ["conv_id", "turn_idx", "rule_id", "severity", "scope", "observed"]

D1, D2 = dt.date(2026, 2, 1), dt.date(2026, 2, 2)


def _ts(day, h, m):
    return dt.datetime(day.year, day.month, day.day, h, m, 0)


@pytest.fixture(scope="module")
def spanning(spark):
    rows = [
        # cA: boundary gap (2 -> 4) + ts regression at the boundary
        ("cA", 0, D1, "user", "t", None, _ts(D1, 10, 0)),
        ("cA", 1, D1, "assistant", "t", None, _ts(D1, 10, 1)),
        ("cA", 2, D1, "user", "t", None, _ts(D1, 10, 2)),
        ("cA", 4, D2, "assistant", "t", None, _ts(D1, 9, 0)),  # ts < cA turn 2
        ("cA", 5, D2, "user", "t", None, _ts(D1, 9, 1)),
        # cB: contiguous across the boundary with a disallowed transition
        ("cB", 0, D1, "user", "t", None, _ts(D1, 10, 0)),
        ("cB", 1, D1, "assistant", "t", None, _ts(D1, 10, 1)),
        ("cB", 2, D2, "assistant", "t", None, _ts(D2, 10, 2)),
        # cC: duplicate (conv_id, turn_idx) split across partitions
        ("cC", 0, D1, "user", "t", None, _ts(D1, 10, 0)),
        ("cC", 1, D1, "assistant", "t", None, _ts(D1, 10, 1)),
        ("cC", 1, D2, "user", "t", None, _ts(D2, 11, 0)),
    ]
    facts = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, ds date, role string, text string, "
        "tool string, ts timestamp",
    )
    allowed = spark.createDataFrame(
        [("user", "assistant"), ("assistant", "user")], "prev_role string, role string"
    )
    rules = [RuleSpec("R_role_required", "required", ("role",))]
    return facts, {"allowed_transitions": allowed}, rules


EXPECTED = {
    ("cA", 4, "R_turn_contiguous", "warning", "2->4"),
    ("cA", 4, "R_ts_monotonic", "error", "2026-02-01 09:00:00"),
    ("cB", 2, "R_role_transition", "error", "assistant->assistant"),
    ("cC", 1, "R_turn_unique", "error", "2"),
}


def _keyset(df):
    return {
        (r["conv_id"], r["turn_idx"], r["rule_id"], r["severity"], r["observed"])
        for r in df.collect()
    }


def test_fused_equals_pipeline_on_spanning_conversations(spark, spanning):
    facts, dims, rules = spanning
    a = validate_transcripts_fused(facts, dims, scalar_rules=rules)
    b = validate_transcripts(facts, dims, scalar_rules=rules)
    sel = CMP + ["ds"]
    ac = a.violations.select(*[F.col(c).cast("string") for c in sel])
    bc = b.violations.select(*[F.col(c).cast("string") for c in sel])
    assert ac.exceptAll(bc).count() == 0 and bc.exceptAll(ac).count() == 0
    assert _keyset(a.violations) == EXPECTED
    # global uniqueness: emitted once, at the group's min ds
    uniq = a.violations.where(F.col("rule_id") == "R_turn_unique").collect()
    assert len(uniq) == 1 and str(uniq[0]["ds"]) == "2026-02-01"


def test_checkpoint_stitches_partition_boundaries(spark, spanning, tmp_path):
    facts, dims, rules = spanning
    ckpt = str(tmp_path / "ckpt_span")
    res = CP.run_with_checkpoint(spark, facts, dims, ckpt, rules=rules)
    assert res["ran"] == ["2026-02-01", "2026-02-02"]
    loaded = CP.load_results(spark, ckpt)
    assert _keyset(loaded["violations"]) == EXPECTED

    # resume replays nothing and loses nothing
    res2 = CP.run_with_checkpoint(spark, facts, dims, ckpt, rules=rules)
    assert res2["ran"] == []
    assert _keyset(CP.load_results(spark, ckpt)["violations"]) == EXPECTED


def test_checkpoint_kill_resume_spanning(spark, spanning, tmp_path):
    """Kill after partition 1; the resumed run must still see partition 1's
    tails when validating partition 2."""
    facts, dims, rules = spanning
    ckpt = str(tmp_path / "ckpt_span_kill")
    r1 = CP.run_with_checkpoint(spark, facts, dims, ckpt, rules=rules, fail_after=1)
    assert r1["ran"] == ["2026-02-01"]
    r2 = CP.run_with_checkpoint(spark, facts, dims, ckpt, rules=rules)
    assert r2["ran"] == ["2026-02-02"] and r2["skipped"] == ["2026-02-01"]
    assert _keyset(CP.load_results(spark, ckpt)["violations"]) == EXPECTED


def test_checkpoint_flags_out_of_order_late_arrivals(spark, tmp_path):
    """A later partition containing a row whose (turn_idx, ts) sorts BEFORE
    the carried tail must still pair against it (the tail leads the window
    via the __ctx-desc sort key): cD's day-2 rows replay turn 1 (duplicate
    key, earlier ts) and then regress to turn 0 — the docstring's 'flagged
    at the boundary' contract."""
    rows = [
        ("cD", 0, D1, "user", "t", None, _ts(D1, 10, 0)),
        ("cD", 1, D1, "assistant", "t", None, _ts(D1, 10, 1)),
        # day-2: same turn_idx as the tail but EARLIER ts -> without the
        # ctx-first sort the tail becomes the follower and gets filtered
        ("cD", 1, D2, "user", "t", None, _ts(D1, 9, 0)),
        ("cE", 0, D1, "user", "t", None, _ts(D1, 10, 0)),
        ("cE", 1, D1, "assistant", "t", None, _ts(D1, 10, 1)),
        # day-2: turn_idx regresses below the tail with an earlier ts
        ("cE", 0, D2, "user", "t", None, _ts(D1, 9, 0)),
        # cF: the boundary duplicate is NOT lag-adjacent to the tail — a
        # late lower-turn_idx row sorts between the context row and the
        # duplicate, so lag-based detection would pair the duplicate with
        # turn 0 and miss it; key-membership detection must still flag it
        ("cF", 0, D1, "user", "t", None, _ts(D1, 10, 0)),
        ("cF", 1, D1, "assistant", "t", None, _ts(D1, 10, 1)),
        ("cF", 0, D2, "user", "t", None, _ts(D1, 9, 0)),
        ("cF", 1, D2, "user", "t", None, _ts(D1, 9, 1)),
    ]
    facts = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, ds date, role string, text string, "
        "tool string, ts timestamp",
    )
    rules = [RuleSpec("R_role_required", "required", ("role",))]
    ckpt = str(tmp_path / "ckpt_late")
    CP.run_with_checkpoint(spark, facts, {}, ckpt, rules=rules)
    got = _keyset(CP.load_results(spark, ckpt)["violations"])
    assert ("cD", 1, "R_turn_unique", "error", "2") in got
    assert ("cD", 1, "R_ts_monotonic", "error", "2026-02-01 09:00:00") in got
    assert ("cE", 0, "R_ts_monotonic", "error", "2026-02-01 09:00:00") in got
    # non-adjacent boundary duplicate (key membership, not lag adjacency)
    assert ("cF", 1, "R_turn_unique", "error", "2") in got
    # ...and emitted exactly once for cF (no per-copy fan-out)
    assert (
        sum(1 for k in got if k[0] == "cF" and k[2] == "R_turn_unique") == 1
    )
