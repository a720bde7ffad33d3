"""window_rules_salted must be row-identical to window_rules, including
chunk-boundary gaps, duplicates, and gaps that swallow whole chunks."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.datagen import ROLES
from faang_pydantics_validation_spark.operators.joins import (
    window_rules,
    window_rules_salted,
)

CMP = ["conv_id", "turn_idx", "rule_id", "severity", "scope", "observed"]


def _cmp(a, b):
    assert a.select(*CMP).exceptAll(b.select(*CMP)).count() == 0
    assert b.select(*CMP).exceptAll(a.select(*CMP)).count() == 0


def test_salted_equals_plain_on_dataset(spark, dataset):
    facts = dataset["transcripts"]
    allowed = dataset["allowed_transitions"]
    plain = window_rules(facts, ROLES, allowed)
    for chunk in (7, 64):  # prime chunk puts seeds on boundaries
        salted = window_rules_salted(facts, ROLES, allowed, chunk=chunk)
        _cmp(plain, salted)
    assert plain.count() > 0


def test_salted_handles_whole_chunk_gap(spark):
    # turns 0..3 then 40..42: with chunk=8, chunks 1-4 are empty — the
    # stitch must still see 3 as the previous turn of 40
    rows = [("c", i, "user", None) for i in [0, 1, 2, 3, 40, 41, 42]]
    facts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    ).withColumn("ts", F.timestamp_seconds(F.lit(1000) + F.col("turn_idx") * 60)).withColumn(
        "ds", F.lit("d")
    )
    out = window_rules_salted(facts, ROLES, None, chunk=8).collect()
    gaps = [(r["turn_idx"], r["observed"]) for r in out if r["rule_id"] == "R_turn_contiguous"]
    assert gaps == [(40, "3->40")]


def test_salted_spreads_hot_conversation(spark):
    # smoke: a 10k-turn conversation with chunk=256 produces the same
    # violations as plain (and would run on ~40 tasks instead of 1)
    facts = (
        spark.range(10000)
        .select(
            F.lit("hot").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(F.lit(0) + F.col("id") * 60).alias("ts"),
            F.lit("d").alias("ds"),
        )
        .where(F.col("turn_idx") % 1000 != 500)  # seeded gaps
    )
    plain = window_rules(facts, ROLES, None)
    salted = window_rules_salted(facts, ROLES, None, chunk=256)
    _cmp(plain, salted)
    assert plain.count() == 10  # gaps at 500, 1500, ... 9500
