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


# ---------------------------------------------------------------------------
# Engine-vs-DuckDB twin agreement per rule kind: random cells (sentinels,
# blanks, unicode-ish text, numeric strings) x every sentinel tier must
# produce the IDENTICAL violating-row set and severities from the compiled
# Spark projection and a hand-written DuckDB predicate over the same data.
# The alphabet deliberately avoids letters that could spell 'nan'/'inf' or
# Java-only numeric suffixes ('d'/'f'), where the two engines' string->
# double parsers legitimately differ.
# ---------------------------------------------------------------------------

import dataclasses

import pytest

from faang_pydantics_validation_spark.rules.spec import SENTINELS as _S

NV = "nullif(trim(v), '')"
NU = "nullif(trim(u), '')"
_TERM_NORM = (
    f"CASE WHEN contains({NV}, ':') THEN {NV} ELSE replace({NV}, '_', ':') END"
)

# (kind-id, RuleSpec, duckdb violation predicate, sentinel-target column)
KIND_TWINS = [
    (
        "required",
        RuleSpec("r", "required", ("v",)),
        "v IS NULL OR trim(v) = ''",
        "v",
    ),
    (
        "enum",
        RuleSpec("r", "enum", ("v",), params={"values": ["ok", "good"]}),
        f"{NV} IS NOT NULL AND {NV} NOT IN ('ok', 'good')",
        "v",
    ),
    (
        "numeric",
        RuleSpec("r", "numeric", ("v",), params={"min": 0, "max": 10}),
        f"{NV} IS NOT NULL AND (TRY_CAST({NV} AS DOUBLE) IS NULL"
        f" OR TRY_CAST({NV} AS DOUBLE) < 0 OR TRY_CAST({NV} AS DOUBLE) > 10)",
        "v",
    ),
    (
        "conditional_upper_bound",
        RuleSpec("r", "conditional_upper_bound", ("v",), params={"abs_max": 15}),
        "TRY_CAST(v AS DOUBLE) > 100 AND TRY_CAST(v AS DOUBLE) > 15",
        "v",
    ),
    (
        "regex",
        RuleSpec("r", "regex", ("v",), params={"pattern": "^[ab]+$"}),
        f"{NV} IS NOT NULL AND NOT regexp_matches({NV}, '^[ab]+$')",
        "v",
    ),
    (
        "regex_negate",
        RuleSpec(
            "r", "regex", ("v",), params={"pattern": "[0-9]", "negate": True}
        ),
        f"{NV} IS NOT NULL AND regexp_matches({NV}, '[0-9]')",
        "v",
    ),
    (
        "url",
        RuleSpec("r", "url", ("v",), params={"schemes": ["http", "https"]}),
        f"{NV} IS NOT NULL AND NOT regexp_matches({NV}, '^(http|https)://')",
        "v",
    ),
    (
        "term_format",
        RuleSpec("r", "term_format", ("v",), params={"pattern": "^T:[0-9]+$"}),
        f"{NV} IS NOT NULL AND NOT regexp_matches({_TERM_NORM}, '^T:[0-9]+$')",
        "v",
    ),
    (
        "date_calendar",
        RuleSpec("r", "date_calendar", ("v",)),
        f"{NV} IS NOT NULL"
        f" AND regexp_matches({NV}, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$')"
        f" AND TRY_STRPTIME({NV}, '%Y-%m-%d') IS NULL",
        "v",
    ),
    (
        "date_by_unit",
        RuleSpec(
            "r",
            "date_by_unit",
            ("v", "u"),
            params={
                "formats": {
                    "YYYY-MM-DD": r"^\d{4}-\d{2}-\d{2}$",
                    "YYYY": r"^\d{4}$",
                }
            },
        ),
        f"{NV} IS NOT NULL AND ("
        f"(u = 'YYYY-MM-DD' AND NOT regexp_matches({NV}, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$'))"
        f" OR (u = 'YYYY' AND NOT regexp_matches({NV}, '^\\d{{4}}$')))",
        "v",
    ),
    (
        "consistency_map",
        RuleSpec(
            "r", "consistency_map", ("u", "v"), params={"mapping": {"a": "x", "b": "y"}}
        ),
        f"(CASE WHEN {NU} = 'a' THEN 'x' WHEN {NU} = 'b' THEN 'y' END) IS NOT NULL"
        f" AND {NV} IS NOT NULL"
        f" AND {NV} != (CASE WHEN {NU} = 'a' THEN 'x' WHEN {NU} = 'b' THEN 'y' END)",
        "u",
    ),
    (
        "pair_required",
        RuleSpec("r", "pair_required", ("v", "u")),
        f"({NV} IS NOT NULL AND {NU} IS NULL) OR ({NV} IS NULL AND {NU} IS NOT NULL)",
        "v",
    ),
    (
        "conditional_required",
        RuleSpec(
            "r", "conditional_required", ("u", "v"), params={"unless_values": ["fresh"]}
        ),
        f"{NU} IS NOT NULL AND {NU} NOT IN ('fresh') AND {NV} IS NULL",
        "u",
    ),
]

_EXTRA_SAMPLES = {
    "enum": ["ok", "good", "bad", "OK"],
    "numeric": ["5", "-1", "11", "1e3", " 7 ", "1.", ".5", "1-1"],
    "conditional_upper_bound": ["50", "120", "14", "200", "16", "99.5"],
    "regex": ["ab", "aab", "abc", "ba"],
    "url": ["http://x", "https://", "ftp://z", "mailto:a", "xx"],
    "term_format": ["T:123", "T_123", "X:1", "T:", "_T", "T_1_2"],
    "date_calendar": [
        "2020-02-30", "2020-02-28", "2021-06-31", "2000-02-29",
        "1900-02-29", "2020-13-01", "2020-1-1",
    ],
    "date_by_unit": ["2020-01-02", "2020", "20-01-02", "2020-1-1"],
    "consistency_map": ["a", "b", "c", "x", "y", "z"],
    "conditional_required": ["fresh", "frozen"],
}

_UNIT_SAMPLES = ["YYYY-MM-DD", "YYYY", "other", "a", "fresh", "x"]


def _cells(kind: str):
    return st.one_of(
        st.none(),
        st.sampled_from(
            SENTINELS + ["", "  ", "restricted access "] + _EXTRA_SAMPLES.get(kind, [])
        ),
        st.text(alphabet="ab 1.-:_", max_size=8),
    )


def _pair_cells(kind: str):
    return st.tuples(
        _cells(kind),
        st.one_of(st.none(), st.sampled_from(_UNIT_SAMPLES), _cells(kind)),
    )


def _tier_wrapped_sql(base: str, sev: str, tier: str | None, col: str):
    """Apply the compiler's sentinel-tier wrapper (rules/compiler.py:38-64)
    to a DuckDB base predicate: any EXACT sentinel value short-circuits the
    base check; firing sentinels take the policy severity."""
    sents = ", ".join(f"'{s}'" for s in _S)
    sev_sql = f"'{sev}'"
    if tier is None:
        return base, sev_sql
    policy = MISSING_VALUE_POLICY[tier]
    firing = [s for s in _S if s in policy]
    fire = (
        f"{col} IN ({', '.join(repr(s) for s in firing)})" if firing else "FALSE"
    )
    pred = f"CASE WHEN {col} IN ({sents}) THEN {fire} ELSE coalesce(({base}), FALSE) END"
    if firing:
        cases = " ".join(
            f"WHEN {col} = '{s}' THEN '{policy[s]}'" for s in firing
        )
        sev_sql = f"CASE {cases} ELSE {sev_sql} END"
    return pred, sev_sql


@pytest.mark.parametrize("kind_id,rule,base_sql,target", KIND_TWINS)
@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_rule_kind_matches_duckdb_twin(spark, kind_id, rule, base_sql, target, data):
    import duckdb
    import pandas as pd

    from faang_pydantics_validation_spark.rules.compiler import compile_row_rules

    tier = data.draw(st.sampled_from([None, "mandatory", "recommended", "optional"]))
    rows = data.draw(st.lists(_pair_cells(kind_id), min_size=1, max_size=30))
    rule = dataclasses.replace(rule, tier=tier)

    sdf = spark.createDataFrame(
        [("c", i, v, u) for i, (v, u) in enumerate(rows)],
        "conv_id string, turn_idx int, v string, u string",
    )
    got = {
        (r["turn_idx"], r["severity"])
        for r in compile_row_rules(
            sdf, [rule], key_cols=("conv_id", "turn_idx"), partition_col=None
        ).collect()
    }

    pred, sev_sql = _tier_wrapped_sql(base_sql, rule.severity, tier, target)
    pdf = pd.DataFrame(
        {
            "turn_idx": range(len(rows)),
            "v": pd.array([v for v, _ in rows], dtype="object"),
            "u": pd.array([u for _, u in rows], dtype="object"),
        }
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        (r[0], r[1])
        for r in con.execute(
            f"SELECT turn_idx, {sev_sql} FROM t WHERE {pred}"
        ).fetchall()
    }
    con.close()
    assert got == want, (kind_id, tier, sorted(got ^ want), rows)


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
