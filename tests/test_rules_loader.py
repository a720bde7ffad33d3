from __future__ import annotations

import pytest

from faang_pydantics_validation_spark.plans.rulesets import transcript_scalar_rules
from faang_pydantics_validation_spark.rules.loader import (
    load_ruleset,
    rules_from_json,
    rules_to_json,
)


def test_roundtrip():
    rules = transcript_scalar_rules()
    assert rules_from_json(rules_to_json(rules)) == rules


def test_checked_in_ruleset_matches_code():
    # the JSON document at rulesets/transcripts.rules.json IS the default
    # ruleset — it must stay in lockstep with plans.rulesets
    assert load_ruleset("rulesets/transcripts.rules.json") == transcript_scalar_rules()


def test_unknown_kind_rejected():
    with pytest.raises(ValueError, match="unknown kind"):
        rules_from_json('[{"rule_id": "x", "kind": "nope", "columns": ["a"]}]')


def test_duplicate_rule_ids_rejected():
    doc = (
        '[{"rule_id": "x", "kind": "required", "columns": ["a"]},'
        ' {"rule_id": "x", "kind": "required", "columns": ["b"]}]'
    )
    with pytest.raises(ValueError, match="duplicate"):
        rules_from_json(doc)


def test_loaded_ruleset_validates(spark, dataset):
    from faang_pydantics_validation_spark.plans.fused import validate_transcripts_fused

    rules = load_ruleset("rulesets/transcripts.rules.json")
    res = validate_transcripts_fused(dataset["transcripts"], dataset, scalar_rules=rules)
    want = dataset["expected_violations"]
    cmp = ["conv_id", "turn_idx", "rule_id", "severity", "scope", "observed"]
    assert res.violations.select(*cmp).exceptAll(want.select(*cmp)).count() == 0
    assert want.select(*cmp).exceptAll(res.violations.select(*cmp)).count() == 0


ALL_RULESETS = [
    "transcripts", "organism", "organoid", "teleostei_post_hatching",
    "specimen", "teleostei_embryo", "cell_line", "pool_of_specimens",
    "cell_culture", "cell_specimen", "single_cell_specimen",
    "person", "organization", "submission",
]


@pytest.mark.parametrize("name", ALL_RULESETS)
def test_all_shipped_rulesets_roundtrip(name):
    """Every shipped ruleset document (all 13 reference record types +
    the transcript graft ruleset) loads into RuleSpecs, round-trips
    through the serializer, and hashes stably — 'one engine, many
    rulesets' as data."""
    from faang_pydantics_validation_spark.rules.spec import ruleset_hash

    rules = load_ruleset(f"rulesets/{name}.rules.json")
    assert rules, name
    assert rules_from_json(rules_to_json(rules)) == rules
    assert len(ruleset_hash(rules)) == 16


ARRAY_STRING_KINDS = {"array_size", "array_element_regex", "array_element_enum"}
# columns validated as arrays of nested {text, term} objects (A5 shape)
STRUCT_ARRAY_COLS = {"health_status", "cell_type"}


@pytest.mark.parametrize("name", ALL_RULESETS)
def test_all_shipped_rulesets_compile_and_run(name, spark):
    """Every shipped ruleset must COMPILE against a DataFrame carrying its
    referenced columns and evaluate cleanly on blank and sentinel rows —
    this is what catches column-name drift or kind/param typos that a pure
    load test can't (a ruleset that loads but can't compile is unusable)."""
    from faang_pydantics_validation_spark.rules.compiler import compile_row_rules

    rules = load_ruleset(f"rulesets/{name}.rules.json")
    cols: dict[str, str] = {}
    for r in rules:
        for i, c in enumerate(r.columns):
            if c in ("conv_id", "turn_idx"):
                continue  # already in the key prefix of the schema
            if c in STRUCT_ARRAY_COLS:
                cols[c] = "array<struct<text:string,term:string>>"
            elif i == 0 and r.kind in ARRAY_STRING_KINDS:
                cols[c] = "array<string>"
            else:
                cols.setdefault(c, "string")
    schema = "conv_id string, turn_idx int, " + ", ".join(
        f"{c} {t}" for c, t in sorted(cols.items())
    )
    blank_row = ("r1", 0) + tuple(None for _ in cols)
    sentinel_row = ("r2", 0) + tuple(
        None if t != "string" else "restricted access" for _, t in sorted(cols.items())
    )
    df = spark.createDataFrame([blank_row, sentinel_row], schema)
    v = compile_row_rules(df, rules, key_cols=("conv_id", "turn_idx"), partition_col=None)
    rows = v.collect()  # must evaluate without analysis/runtime errors
    assert all(r["rule_id"] for r in rows)
    # P2 invariant across EVERY kind and every shipped document: an
    # all-NULL row may fire only presence-class rules (required /
    # conditional_required / the recommended-missing expr warnings) —
    # value rules (enum/numeric/regex/url/date/term/pair/array...) must
    # treat absent values as pass, exactly like the reference's
    # strip-empties-before-validators order
    presence = {
        r.rule_id for r in rules if r.kind in ("required", "conditional_required", "expr")
    }
    blank_fired = {r["rule_id"] for r in rows if r["conv_id"] == "r1"}
    assert blank_fired <= presence, (name, blank_fired - presence)
