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
