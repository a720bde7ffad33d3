"""Parity: plans/verdicts.verdicts_fast (boolean-flag path, one two-level
aggregation) == verdicts (exploded-violations path) for row-scope rules —
including duplicated (conv_id, turn_idx) keys whose copies differ in
severity, NULL values, and partitions with no violations at all.

The fast path is the r6 optimization used by the contract's
verdicts_events_daily query; the classic path stays the general operator
(it also handles conversation-scope violations, which the fast path
declares out of scope)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.plans.verdicts import verdicts, verdicts_fast
from faang_pydantics_validation_spark.rules.compiler import compile_row_rules, rules_flags
from faang_pydantics_validation_spark.rules.spec import RuleSpec

RULES = [
    RuleSpec("R_type", "enum", ("event_type",), params={"values": ["ok", "fine"]}),
    RuleSpec(
        "R_value", "numeric", ("value",), params={"min": 0, "max": 10}, severity="warning"
    ),
]


def _facts(spark):
    rows = [
        # clean partition
        ("2024-01-01", "c1", 0, "ok", 1.0),
        ("2024-01-01", "c1", 1, "fine", 2.0),
        # error turn + warning turn + warning-and-error turn
        ("2024-01-02", "c2", 0, "bad", 1.0),
        ("2024-01-02", "c2", 1, "ok", 99.0),
        ("2024-01-02", "c2", 2, "bad", -5.0),
        # duplicated key: both copies violate (must count ONCE)
        ("2024-01-03", "c3", 0, "bad", 1.0),
        ("2024-01-03", "c3", 0, "bad", 2.0),
        # duplicated key: only one copy violates (warning)
        ("2024-01-03", "c3", 1, "ok", 50.0),
        ("2024-01-03", "c3", 1, "ok", 5.0),
        # NULL value (numeric rule passes NULL through as no-violation)
        ("2024-01-03", "c4", 0, "ok", None),
    ]
    return spark.createDataFrame(
        rows, "ds string, conv_id string, turn_idx int, event_type string, value double"
    )


def test_verdicts_fast_matches_classic(spark):
    facts = _facts(spark)
    violations = compile_row_rules(facts, RULES)
    classic = verdicts(facts, violations)
    he, hw = rules_flags(RULES)
    fast = verdicts_fast(
        facts.select(
            "ds", "conv_id", "turn_idx", he.alias("has_error"), hw.alias("has_warning")
        )
    )
    assert sorted(classic.columns) == sorted(fast.columns)
    cols = classic.columns
    a = sorted(tuple(r[c] for c in cols) for r in classic.collect())
    b = sorted(tuple(r[c] for c in cols) for r in fast.collect())
    assert a == b
    # sanity on the interesting partition: dup key counted once
    byds = {r["ds"]: r for r in fast.collect()}
    assert byds["2024-01-03"]["error_turns"] == 1
    assert byds["2024-01-03"]["warning_only_turns"] == 1
    assert byds["2024-01-03"]["total_turns"] == 5
    assert byds["2024-01-01"]["verdict"] == "pass"
    assert byds["2024-01-02"]["verdict"] == "fail"
