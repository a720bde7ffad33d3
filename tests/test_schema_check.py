"""P17 unknown-field rejection (reference: pydantic extra='forbid' in
every ruleset Config, organism_ruleset.py:277-281) — table-grain column
contract checks plus the CLI fail-fast gate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from faang_pydantics_validation_spark.operators.schema import (
    TRANSCRIPT_EXPECTED,
    schema_check,
)


def _facts(spark, extra_col: bool = False):
    df = spark.createDataFrame(
        [("c1", 0, "user", "hi", None, dt.datetime(2026, 1, 1), dt.date(2026, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, ds date",
    )
    if extra_col:
        df = df.withColumn("typo_col", F.lit(1))
    return df


def test_conformant_schema_is_silent(spark):
    assert schema_check(_facts(spark), TRANSCRIPT_EXPECTED).count() == 0


def test_typod_column_flagged(spark):
    rows = schema_check(_facts(spark, extra_col=True), TRANSCRIPT_EXPECTED).collect()
    assert [(r["rule_id"], r["scope"], r["observed"]) for r in rows] == [
        ("R_unknown_column", "table", "typo_col:int")
    ]


def test_missing_and_retyped_columns(spark):
    df = _facts(spark).drop("tool").withColumn("turn_idx", F.col("turn_idx").cast("long"))
    got = {(r["rule_id"], r["observed"]) for r in schema_check(df, TRANSCRIPT_EXPECTED).collect()}
    assert got == {
        ("R_missing_column", "tool:string"),
        ("R_column_type", "turn_idx:bigint!=int"),
    }


def test_structtype_contract_and_untyped_declaration(spark):
    df = _facts(spark)
    st = StructType.fromDDL(
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, ds date"
    )
    assert schema_check(df, st).count() == 0
    # None type declares presence without pinning the type
    loose = dict(TRANSCRIPT_EXPECTED, turn_idx=None)
    assert schema_check(df.withColumn("turn_idx", F.col("turn_idx").cast("long")), loose).count() == 0


def test_pipeline_emits_table_scope_violations(spark):
    from faang_pydantics_validation_spark.plans.fused import validate_transcripts_fused
    from faang_pydantics_validation_spark.plans.pipeline import validate_transcripts
    from faang_pydantics_validation_spark.rules.spec import RuleSpec

    facts = _facts(spark, extra_col=True)
    rules = [RuleSpec("R_role_required", "required", ("role",))]
    for fn in (validate_transcripts, validate_transcripts_fused):
        res = fn(facts, {}, scalar_rules=rules, expected_schema=TRANSCRIPT_EXPECTED)
        tbl = res.violations.where(F.col("scope") == "table").collect()
        assert [(r["rule_id"], r["observed"]) for r in tbl] == [
            ("R_unknown_column", "typo_col:int")
        ]


def test_cli_gate_fails_fast_on_schema_drift(spark, tmp_path, monkeypatch):
    from pyspark.sql import SparkSession

    from faang_pydantics_validation_spark.jobs.validate_cli import main

    # the CLI stops its session on exit; keep the shared test session alive
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    _facts(spark, extra_col=True).write.partitionBy("ds").parquet(
        str(tmp_path / "transcripts")
    )
    assert main(["--input", str(tmp_path)]) == 2
