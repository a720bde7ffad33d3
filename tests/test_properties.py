"""Property-based checks (hypothesis): generate one batch of adversarial
rows per property and run a single Spark job over it — the rule compiler's
behavior must match a plain-Python model of the semantics exactly.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from faang_pydantics_validation_spark.rules.compiler import compile_row_rules
from faang_pydantics_validation_spark.rules.spec import (
    MISSING_VALUE_POLICY,
    SENTINELS,
    RuleSpec,
)

TEXTISH = st.one_of(
    st.none(),
    st.sampled_from(SENTINELS + ["", " ", "ok", "1", "-2.5", "abc", "restricted access "]),
    st.text(alphabet="ab 1.-", max_size=8),
)


def _run(spark, values, rules):
    rows = [("c", i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, v string")
    out = compile_row_rules(df, rules, key_cols=("conv_id", "turn_idx"), partition_col=None)
    return {r["turn_idx"]: (r["rule_id"], r["severity"]) for r in out.collect()}


@settings(max_examples=15, deadline=None)
@given(st.lists(TEXTISH, min_size=1, max_size=40))
def test_required_matches_python_model(spark, values):
    got = _run(spark, values, [RuleSpec("r", "required", ("v",))])
    for i, v in enumerate(values):
        expect = v is None or v.strip() == ""
        assert (i in got) == expect, (i, repr(v))


@settings(max_examples=15, deadline=None)
@given(
    st.lists(TEXTISH, min_size=1, max_size=40),
    st.sampled_from(sorted(MISSING_VALUE_POLICY)),
)
def test_sentinel_tier_matches_policy_table(spark, values, tier):
    got = _run(spark, values, [RuleSpec("r", "required", ("v",), tier=tier)])
    policy = MISSING_VALUE_POLICY[tier]
    for i, v in enumerate(values):
        if v in SENTINELS:  # exact match only, like the reference
            if v in policy:
                assert got[i] == ("r", policy[v]), (i, v, tier)
            else:
                assert i not in got, (i, v, tier)
        else:
            expect = v is None or v.strip() == ""
            assert (i in got) == expect, (i, repr(v), tier)


@settings(max_examples=15, deadline=None)
@given(st.lists(TEXTISH, min_size=1, max_size=40))
def test_numeric_bounds_matches_python_model(spark, values):
    got = _run(
        spark, values, [RuleSpec("r", "numeric", ("v",), params={"min": 0, "max": 10})]
    )
    for i, v in enumerate(values):
        if v is None or v.strip() == "":
            expect = False
        else:
            try:
                x = float(v)
                expect = x < 0 or x > 10
            except ValueError:
                expect = True
        assert (i in got) == expect, (i, repr(v))


CELLISH = st.one_of(
    st.none(),
    st.just(""), st.just("   "),
    st.just("restricted access"), st.just("not provided"),
    st.sampled_from(["0", "2", "2.5", "-1", "1e3"]),
    st.text(alphabet="ab :_-.0123456789", max_size=12),
)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(*[CELLISH] * 6), min_size=1, max_size=8))
def test_export_never_crashes_on_adversarial_cells(spark, rows):
    """Export projections must never throw on any cell content — blanks,
    sentinels, non-numeric strings in numeric fields (the reference's
    Union[float, Literal] shape), scientific notation — and must always
    produce parseable JSON. Guards the ANSI-cast crash class: a plain
    cast('double') on 'restricted access' would kill the executor."""
    import json as _json

    from faang_pydantics_validation_spark.plans.exports import (
        ORGANOID_EXPORT,
        biosample_export,
    )

    data = [
        ("s%d" % i, a, b, c, d, e, f, None, None, None, None, None, None, None,
         None, ["T"])
        for i, (a, b, c, d, e, f) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "sample_name string, organ_model string, organ_model_term string, "
        "organoid_passage string, organoid_passage_unit string, "
        "number_of_frozen_cells string, number_of_frozen_cells_unit string, "
        "organ_part_model string, organ_part_model_term string, "
        "freezing_method string, freezing_date string, freezing_date_unit string, "
        "growth_environment string, type_of_organoid_culture string, "
        "organoid_morphology string, derived_from array<string>",
    )
    from pyspark.sql import functions as F

    out = (
        biosample_export(df, ORGANOID_EXPORT)
        .select("sample_name", F.to_json("biosample_format").alias("js"))
        .collect()
    )
    assert len(out) == len(data)
    for r in out:
        doc = _json.loads(r["js"])
        assert "characteristics" in doc
