"""Fused single-shuffle pipeline must produce EXACTLY the same violations,
verdicts, and manifest match as the composable pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.plans.fused import validate_transcripts_fused
from faang_pydantics_validation_spark.plans.pipeline import validate_transcripts

CMP = ["conv_id", "turn_idx", "rule_id", "severity", "scope", "observed"]


def test_fused_matches_manifest(spark, dataset):
    res = validate_transcripts_fused(dataset["transcripts"], dataset)
    got = res.violations.select(*CMP)
    want = dataset["expected_violations"].select(*CMP)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_fused_matches_composable(spark, dataset):
    a = validate_transcripts_fused(dataset["transcripts"], dataset)
    b = validate_transcripts(dataset["transcripts"], dataset)
    assert a.violations.select(*CMP).exceptAll(b.violations.select(*CMP)).count() == 0
    assert b.violations.select(*CMP).exceptAll(a.violations.select(*CMP)).count() == 0
    av = {str(r["ds"]): r.asDict() for r in a.verdicts.collect()}
    bv = {str(r["ds"]): r.asDict() for r in b.verdicts.collect()}
    for k in set(av) | set(bv):
        x, y = av[k], bv[k]
        x["ds"] = y["ds"] = None
        assert x == y, f"verdict mismatch on {k}: {x} vs {y}"


def test_fast_verdicts_match_classic(spark, dataset):
    """The one-pass bench verdict path must agree with the classic
    violations-aggregation path on every field except n_conversations,
    which is HLL++-approximate (checked within the sketch's tolerance)."""
    fast = validate_transcripts_fused(dataset["transcripts"], dataset, fast_verdicts=True)
    classic = validate_transcripts_fused(dataset["transcripts"], dataset)
    f = {str(r["ds"]): r.asDict() for r in fast.verdicts.collect()}
    c = {str(r["ds"]): r.asDict() for r in classic.verdicts.collect()}
    assert set(f) == set(c)
    for k in c:
        for field in ("total_turns", "valid_turns", "error_turns",
                      "warning_only_turns", "relationship_errors", "verdict"):
            assert f[k][field] == c[k][field], (k, field, f[k], c[k])
        assert abs(f[k]["n_conversations"] - c[k]["n_conversations"]) <= max(
            2, 0.05 * c[k]["n_conversations"]
        )


def test_fused_single_fact_shuffle(spark, dataset):
    """The physical plan for the turn-level violations must contain exactly
    ONE fact-sized exchange (the explicit conv_id repartition). The J6
    branch adds only a map-side-combined distinct (post-combine volume =
    one row per conversation)."""
    res = validate_transcripts_fused(dataset["transcripts"], dataset)
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    repart = [
        ln for ln in plan.splitlines() if "REPARTITION_BY_COL" in ln and "conv_id" in ln
    ]
    assert len(repart) == 1, "expected exactly one explicit fact shuffle:\n" + "\n".join(repart)
    # windows must not have forced an extra ENSURE_REQUIREMENTS shuffle of
    # the fact stream on (conv_id, turn_idx)
    extra = [
        ln
        for ln in plan.splitlines()
        if "ENSURE_REQUIREMENTS" in ln and "hashpartitioning(conv_id" in ln and "turn_idx" in ln
    ]
    assert not extra, "window re-shuffled the facts:\n" + "\n".join(extra)


def test_fused_conv_dim_shuffle_gate(spark, dataset):
    """With the J6 registry dim gated OFF broadcast, the tag must become a
    post-exchange shuffled-hash join: identical violations, NO broadcast of
    the conv dim, and still exactly one fact-sized exchange (the dim gets
    its own small exchange; the fact stream reuses its conv_id
    HashPartitioning)."""
    res = validate_transcripts_fused(
        dataset["transcripts"], dataset, conv_dim_broadcast=False
    )
    got = res.violations.select(*CMP)
    want = dataset["expected_violations"].select(*CMP)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    # the only broadcast joins left are the (bounded-small) dim_tools ones
    for ln in plan.splitlines():
        if "BroadcastHashJoin" in ln:
            assert "__tool" in ln or "tool_id" in ln, ln
    repart = [
        ln for ln in plan.splitlines() if "REPARTITION_BY_COL" in ln and "conv_id" in ln
    ]
    assert len(repart) == 1, plan


def test_fused_null_turn_idx_uniqueness_matches_pipeline(spark):
    """NULL turn_idx keys: w_key groups them (__key_cnt>1) but lag(turn_idx)
    is NULL on every row of the group, so a plain isNull first-of-key test
    would emit R_turn_unique once PER ROW; the composable groupBy path
    emits once per key. Both paths must agree."""
    import datetime as dt

    rows = [
        ("c1", None, "user", "t", None, dt.datetime(2024, 1, 1, 0, 0, 0), dt.date(2024, 1, 1)),
        ("c1", None, "assistant", "t", None, dt.datetime(2024, 1, 1, 0, 1, 0), dt.date(2024, 1, 1)),
        ("c1", None, "user", "t", None, dt.datetime(2024, 1, 1, 0, 2, 0), dt.date(2024, 1, 1)),
        ("c2", 0, "user", "t", None, dt.datetime(2024, 1, 1, 0, 0, 0), dt.date(2024, 1, 1)),
        ("c2", 0, "assistant", "t", None, dt.datetime(2024, 1, 1, 0, 1, 0), dt.date(2024, 1, 1)),
    ]
    facts = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, ds date",
    )
    from faang_pydantics_validation_spark.rules.spec import RuleSpec

    rules = [RuleSpec("R_text_required", "required", ("text",))]  # never fires
    fused = validate_transcripts_fused(facts, {}, scalar_rules=rules)
    pipe = validate_transcripts(facts, {}, scalar_rules=rules)
    f_uni = fused.violations.where(F.col("rule_id") == "R_turn_unique")
    p_uni = pipe.violations.where(F.col("rule_id") == "R_turn_unique")
    assert f_uni.count() == p_uni.count() == 2  # once per key: (c1,NULL), (c2,0)
    assert f_uni.select(*CMP).exceptAll(p_uni.select(*CMP)).count() == 0


def test_fast_verdicts_key_grain_on_double_violating_duplicates(spark):
    """A duplicated (conv_id, turn_idx) key whose copies BOTH carry scalar
    errors must count as ONE error turn in the fast path, matching the
    classic per_turn aggregation (the r2 fast path counted per row)."""
    import datetime as dt

    from faang_pydantics_validation_spark.rules.spec import RuleSpec

    rows = [
        ("c1", 0, "", "t", None, dt.datetime(2024, 1, 1, 0, 0, 0), dt.date(2024, 1, 1)),
        ("c1", 0, "", "t", None, dt.datetime(2024, 1, 1, 0, 1, 0), dt.date(2024, 1, 1)),
        ("c1", 1, "user", "t", None, dt.datetime(2024, 1, 1, 0, 2, 0), dt.date(2024, 1, 1)),
    ]
    facts = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, ds date",
    )
    rules = [RuleSpec("R_role_required", "required", ("role",))]
    fast = validate_transcripts_fused(facts, {}, scalar_rules=rules, fast_verdicts=True)
    classic = validate_transcripts_fused(facts, {}, scalar_rules=rules)
    f = fast.verdicts.collect()[0].asDict()
    c = classic.verdicts.collect()[0].asDict()
    assert f["error_turns"] == c["error_turns"] == 1  # key grain, not row grain
    assert f["total_turns"] == c["total_turns"] == 3
    for field in ("valid_turns", "warning_only_turns", "relationship_errors", "verdict"):
        assert f[field] == c[field], field


def test_broadcast_gate_helpers(spark, dataset):
    """Unit coverage for the J6 size gate: threshold parsing and the
    metadata-only fits decision (including the disabled-broadcast and
    huge-estimate paths)."""
    from faang_pydantics_validation_spark.plans.fused import (
        _fits_broadcast,
        _parse_size_bytes,
    )

    assert _parse_size_bytes("10485760b") == 10485760
    assert _parse_size_bytes("64MB") == 64 * 1024 * 1024
    assert _parse_size_bytes("1g") == 1 << 30
    assert _parse_size_bytes("512k") == 512 * 1024
    assert _parse_size_bytes("-1") == -1

    tiny = dataset["dim_conversations"].select("conv_id").distinct()
    assert _fits_broadcast(tiny) is True

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert _fits_broadcast(tiny) is False  # broadcast disabled -> shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        assert _fits_broadcast(tiny) is False  # estimate over threshold
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
