"""Golden end-to-end test: the engine's violation set must EXACTLY equal
the generator's seeded-violation manifest (FIXTURES.md §5) — no more, no
less. This is the vectorized analog of the reference's golden output
(validation_results.json): exact error entries, exact summary counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.plans.pipeline import (
    VIOLATION_COLS,
    validate_transcripts,
)

CMP_COLS = ["conv_id", "turn_idx", "rule_id", "severity", "scope", "observed"]


def test_violations_exactly_match_manifest(spark, dataset):
    result = validate_transcripts(dataset["transcripts"], dataset)
    got = result.violations.select(*CMP_COLS)
    want = dataset["expected_violations"].select(*CMP_COLS)

    missing = want.exceptAll(got)
    extra = got.exceptAll(want)
    n_missing, n_extra = missing.count(), extra.count()
    if n_missing or n_extra:
        print("MISSING (expected but not emitted):")
        missing.orderBy(*CMP_COLS).show(50, truncate=False)
        print("EXTRA (emitted but not expected):")
        extra.orderBy(*CMP_COLS).show(50, truncate=False)
    assert n_missing == 0 and n_extra == 0
    assert got.count() == want.count() > 0


def test_verdict_trichotomy(spark, dataset):
    """day0 clean -> pass; day1 -> pass_with_warnings; day2/3 -> fail
    (mirrors the reference's valid / warnings / invalid partitioning,
    base_validator.py:132-159)."""
    result = validate_transcripts(dataset["transcripts"], dataset)
    rows = {str(r["ds"]): r for r in result.verdicts.collect()}
    assert len(rows) == 4
    days = sorted(rows)
    assert rows[days[0]]["verdict"] == "pass"
    assert rows[days[0]]["error_turns"] == 0
    assert rows[days[1]]["verdict"] == "pass_with_warnings"
    assert rows[days[1]]["error_turns"] == 0
    assert rows[days[1]]["warning_only_turns"] > 0
    for d in days[2:]:
        assert rows[d]["verdict"] == "fail"
        assert rows[d]["error_turns"] > 0
    # conservation: valid + error = total
    for r in rows.values():
        assert r["valid_turns"] + r["error_turns"] == r["total_turns"]


def test_per_turn_text_equality_invariant(spark, dataset):
    """north_star row-level invariant: under stable turn ordering, each
    turn's text is exactly reconstructable from (conv_id, turn_idx) —
    except the seeded blank-text violations, which are flagged."""
    facts = dataset["transcripts"].dropDuplicates(["conv_id", "turn_idx"])
    mismatch = facts.where(
        (F.col("text") != "")
        & ~F.col("text").startswith(
            F.concat(F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string"), F.lit(":"))
        )
    )
    assert mismatch.count() == 0


def test_export_excludes_error_turns(spark, dataset):
    result = validate_transcripts(dataset["transcripts"], dataset)
    exported = result.export()
    error_keys = result.violations.where(
        (F.col("scope") == "turn") & (F.col("severity") == "error")
    ).select("conv_id", "turn_idx")
    leaked = exported.join(error_keys, on=["conv_id", "turn_idx"], how="inner")
    assert leaked.count() == 0
    assert exported.count() > 0
    # term->URL expansion shape (S7 analog)
    one = exported.where(F.col("tool_url").isNotNull()).first()
    assert one["tool_url"].startswith("http://example.org/tools/TOOL_")


def test_canonical_violations_schema(spark, dataset):
    result = validate_transcripts(dataset["transcripts"], dataset)
    assert result.canonical_violations().columns == VIOLATION_COLS
