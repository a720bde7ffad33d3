"""Per-kind unit tests for the scalar/cross/array rule library
(SURVEY.md §5 strategy 1: tiny DataFrames, exact violation-row asserts).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.rules.compiler import compile_row_rules
from faang_pydantics_validation_spark.rules.spec import RuleSpec


def run(spark, rows, schema, rules):
    df = spark.createDataFrame(rows, schema).withColumn("ds", F.lit("d0"))
    out = compile_row_rules(df, rules, key_cols=("conv_id", "turn_idx"))
    return {
        (r["conv_id"], r["turn_idx"], r["rule_id"], r["severity"], r["observed"])
        for r in out.collect()
    }


S2 = "conv_id string, turn_idx int, v string"
S3 = "conv_id string, turn_idx int, a string, b string"


def test_required(spark):
    got = run(
        spark,
        [("c", 0, None), ("c", 1, ""), ("c", 2, "  "), ("c", 3, "ok")],
        S2,
        [RuleSpec("r", "required", ("v",))],
    )
    assert got == {
        ("c", 0, "r", "error", "<null>"),
        ("c", 1, "r", "error", ""),
        ("c", 2, "r", "error", "  "),
    }


@pytest.mark.parametrize(
    "tier,value,expect",
    [
        ("mandatory", "not provided", ("error", "not provided")),
        ("mandatory", "restricted access", ("warning", "restricted access")),
        ("recommended", "not collected", ("warning", "not collected")),
        ("recommended", "not applicable", None),  # passes (constants.py:219-223)
        ("recommended", "restricted access", None),
        ("optional", "restricted access", ("error", "restricted access")),
        ("optional", "not applicable", ("error", "not applicable")),
    ],
)
def test_sentinel_tiers(spark, tier, value, expect):
    got = run(spark, [("c", 0, value)], S2, [RuleSpec("r", "required", ("v",), tier=tier)])
    if expect is None:
        assert got == set()
    else:
        assert got == {("c", 0, "r", expect[0], expect[1])}


def test_sentinel_short_circuits_base_check(spark):
    # 'not provided' is not a member of the enum, but the sentinel path
    # wins and the enum check never fires (organism_ruleset.py:120-121)
    got = run(
        spark,
        [("c", 0, "not provided")],
        S2,
        [RuleSpec("r", "enum", ("v",), params={"values": ["a"]}, tier="mandatory")],
    )
    assert got == {("c", 0, "r", "error", "not provided")}


def test_enum_and_skip_sentinels(spark):
    rules = [
        RuleSpec("r", "enum", ("v",), params={"values": ["a", "b"]}, skip_sentinels=True)
    ]
    got = run(
        spark,
        [("c", 0, "a"), ("c", 1, "z"), ("c", 2, "not provided"), ("c", 3, None), ("c", 4, "")],
        S2,
        rules,
    )
    assert got == {("c", 1, "r", "error", "z")}


def test_enum_case_insensitive(spark):
    got = run(
        spark,
        [("c", 0, "Organism"), ("c", 1, "ORGANISMx")],
        S2,
        [RuleSpec("r", "enum", ("v",), params={"values": ["organism"], "case_insensitive": True})],
    )
    assert got == {("c", 1, "r", "error", "ORGANISMx")}


def test_numeric_bounds_and_coercion(spark):
    rules = [RuleSpec("r", "numeric", ("v",), params={"min": 0, "max": 100})]
    got = run(
        spark,
        [("c", 0, "42.5"), ("c", 1, "abc"), ("c", 2, "-1"), ("c", 3, "101"), ("c", 4, None), ("c", 5, "")],
        S2,
        rules,
    )
    assert got == {
        ("c", 1, "r", "error", "abc"),
        ("c", 2, "r", "error", "-1"),
        ("c", 3, "r", "error", "101"),
    }


def test_latitude_longitude(spark):
    # P8 (validation_utils.py:90-117)
    got = run(
        spark,
        [("c", 0, "90.0"), ("c", 1, "-90.1"), ("c", 2, "45")],
        S2,
        [RuleSpec("r", "numeric", ("v",), params={"min": -90, "max": 90})],
    )
    assert got == {("c", 1, "r", "error", "-90.1")}


def test_conditional_upper_bound(spark):
    # P9 water oxygen: <=100 treated as %, else mg/L bound
    got = run(
        spark,
        [("c", 0, "95"), ("c", 1, "101"), ("c", 2, "400"), ("c", 3, "600")],
        S2,
        [RuleSpec("r", "conditional_upper_bound", ("v",), params={"abs_max": 500})],
    )
    assert got == {("c", 3, "r", "error", "600")}


def test_regex_with_allow(spark):
    # P14 photoperiod (validation_utils.py:190-202)
    rules = [
        RuleSpec(
            "r",
            "regex",
            ("v",),
            params={"pattern": r"^\d{1,2}L:\d{1,2}D$", "allow": ["natural light"]},
        )
    ]
    got = run(
        spark,
        [("c", 0, "12L:12D"), ("c", 1, "natural light"), ("c", 2, "24h")],
        S2,
        rules,
    )
    assert got == {("c", 2, "r", "error", "24h")}


def test_time_hhmm_regex(spark):
    # P13 (validation_utils.py:177-187)
    rules = [RuleSpec("r", "regex", ("v",), params={"pattern": r"^([01]\d|2[0-3]):[0-5]\d$"})]
    got = run(spark, [("c", 0, "23:59"), ("c", 1, "24:00"), ("c", 2, "9:5")], S2, rules)
    assert got == {("c", 1, "r", "error", "24:00"), ("c", 2, "r", "error", "9:5")}


def test_date_by_unit(spark):
    # P10 cross-column (validation_utils.py:150-174)
    rules = [
        RuleSpec(
            "r",
            "date_by_unit",
            ("a", "b"),
            params={
                "formats": {
                    "YYYY-MM-DD": r"^[12]\d{3}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$",
                    "YYYY-MM": r"^[12]\d{3}-(0[1-9]|1[0-2])$",
                    "YYYY": r"^[12]\d{3}$",
                }
            },
        )
    ]
    got = run(
        spark,
        [
            ("c", 0, "2021-03-05", "YYYY-MM-DD"),
            ("c", 1, "2021-03", "YYYY-MM-DD"),
            ("c", 2, "2021-03", "YYYY-MM"),
            ("c", 3, "2021", "YYYY-MM"),
            ("c", 4, "2021-13", "YYYY-MM"),
            ("c", 5, "2021-03-05", "parsecs"),  # unknown unit: no format rule fires
        ],
        S3,
        rules,
    )
    assert got == {
        ("c", 1, "r", "error", "2021-03"),
        ("c", 3, "r", "error", "2021"),
        ("c", 4, "r", "error", "2021-13"),
    }


def test_date_calendar_and_strip_time(spark):
    # P11+P12 (organoid_ruleset.py:136-152; pool_of_specimens_ruleset.py:60-62)
    rules = [
        RuleSpec("r", "date_calendar", ("v",), params={"strip_time": True})
    ]
    got = run(
        spark,
        [("c", 0, "2021-02-28 00:00:00"), ("c", 1, "2021-02-30"), ("c", 2, "2021-04-31 12:00:00")],
        S2,
        rules,
    )
    assert got == {
        ("c", 1, "r", "error", "2021-02-30"),
        ("c", 2, "r", "error", "2021-04-31 12:00:00"),
    }


def test_url_schemes(spark):
    # P15 (validation_utils.py:120-147)
    rules = [RuleSpec("r", "url", ("v",), params={"schemes": ["http", "https", "ftp"]})]
    got = run(
        spark,
        [("c", 0, "https://x.org/a"), ("c", 1, "ftp://x"), ("c", 2, "gopher://x"), ("c", 3, "x.org")],
        S2,
        rules,
    )
    assert got == {("c", 2, "r", "error", "gopher://x"), ("c", 3, "r", "error", "x.org")}


def test_term_format_normalizes_underscore(spark):
    # P3 (validation_utils.py:5-15): OBI_0100026 -> OBI:0100026 passes
    rules = [RuleSpec("r", "term_format", ("v",), params={"pattern": r"^OBI:\d{7}$"})]
    got = run(
        spark,
        [("c", 0, "OBI:0100026"), ("c", 1, "OBI_0100026"), ("c", 2, "OBI-bad")],
        S2,
        rules,
    )
    assert got == {("c", 2, "r", "error", "OBI-bad")}


def test_consistency_map(spark):
    # P18 (standard_ruleset.py:49-70): material -> expected term
    rules = [
        RuleSpec(
            "r",
            "consistency_map",
            ("a", "b"),
            params={"mapping": {"organism": "OBI:0100026", "specimen": "OBI:0001479"}},
        )
    ]
    got = run(
        spark,
        [
            ("c", 0, "organism", "OBI:0100026"),
            ("c", 1, "organism", "OBI:9999999"),
            ("c", 2, "other", "whatever"),  # unmapped key: no rule
        ],
        S3,
        rules,
    )
    assert got == {("c", 1, "r", "error", "OBI:9999999")}


def test_pair_required(spark):
    # X1 (organism_ruleset.py:214-229)
    rules = [RuleSpec("r", "pair_required", ("a", "b"))]
    got = run(
        spark,
        [("c", 0, "t", "T:1"), ("c", 1, "t", None), ("c", 2, None, "T:1"), ("c", 3, None, None)],
        S3,
        rules,
    )
    assert got == {
        ("c", 1, "r", "error", "t|<null>"),
        ("c", 2, "r", "error", "<null>|T:1"),
    }


def test_conditional_required(spark):
    # X3 (organoid_ruleset.py:209-217)
    rules = [
        RuleSpec("r", "conditional_required", ("a", "b"), params={"unless_values": ["fresh"]})
    ]
    got = run(
        spark,
        [("c", 0, "fresh", None), ("c", 1, "frozen", None), ("c", 2, "frozen", "2021-01-01")],
        S3,
        rules,
    )
    assert got == {("c", 1, "r", "error", "frozen")}


def test_conditional_required_blank_condition_not_applies(spark):
    """A NULL or blank condition value means the requirement does not
    apply — the reference's `if freezing_method_value and ...` treats both
    None and '' as falsy (organoid_ruleset.py:212)."""
    rules = [
        RuleSpec("r", "conditional_required", ("a", "b"), params={"unless_values": ["fresh"]})
    ]
    got = run(
        spark,
        [("c", 0, "", None), ("c", 1, "  ", None), ("c", 2, None, None),
         ("c", 3, "frozen", None)],
        S3,
        rules,
    )
    assert got == {("c", 3, "r", "error", "frozen")}


def test_array_size(spark):
    # A2/A3/A4 (organism_ruleset.py:249-260 etc.)
    schema = "conv_id string, turn_idx int, v array<string>"
    rows = [
        ("c", 0, ["a"]),
        ("c", 1, ["a", "b", "c"]),
        ("c", 2, ["a", ""]),  # blank dropped (A1) -> size 1
        ("c", 3, None),
    ]
    got_max = run(spark, rows, schema, [RuleSpec("r", "array_size", ("v",), params={"max": 2})])
    assert got_max == {("c", 1, "r", "error", "3")}
    got_eq = run(spark, rows, schema, [RuleSpec("r", "array_size", ("v",), params={"eq": 1})])
    assert got_eq == {("c", 1, "r", "error", "3")}


def test_array_element_regex(spark):
    # A6 (specimen_ruleset.py:284-295)
    schema = "conv_id string, turn_idx int, v array<string>"
    rules = [RuleSpec("r", "array_element_regex", ("v",), params={"pattern": r"^https?://"})]
    got = run(
        spark,
        [("c", 0, ["http://a", "https://b"]), ("c", 1, ["http://a", "nope"])],
        schema,
        rules,
    )
    assert got == {("c", 1, "r", "error", "nope")}


def test_array_element_enum(spark):
    schema = "conv_id string, turn_idx int, v array<string>"
    rules = [RuleSpec("r", "array_element_enum", ("v",), params={"values": ["x", "y"]})]
    got = run(spark, [("c", 0, ["x", "y"]), ("c", 1, ["x", "z"])], schema, rules)
    assert got == {("c", 1, "r", "error", "z")}


def test_expr_escape_hatch(spark):
    rules = [
        RuleSpec("r", "expr", ("v",), params={"sql": "v = 'boom'", "observed_sql": "upper(v)"})
    ]
    got = run(spark, [("c", 0, "boom"), ("c", 1, "ok")], S2, rules)
    assert got == {("c", 0, "r", "error", "BOOM")}


def test_multiple_rules_one_projection(spark):
    # the whole suite compiles into ONE select; a row can violate many rules
    rules = [
        RuleSpec("r1", "required", ("v",)),
        RuleSpec("r2", "enum", ("v",), params={"values": ["a"]}),
        RuleSpec("r3", "regex", ("v",), params={"pattern": "^a"}, severity="warning"),
    ]
    got = run(spark, [("c", 0, "zz")], S2, rules)
    assert got == {
        ("c", 0, "r2", "error", "zz"),
        ("c", 0, "r3", "warning", "zz"),
    }
