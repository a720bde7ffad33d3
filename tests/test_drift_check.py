from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.plans.drift_check import (
    drift_violations,
    transcript_drift,
)


def test_transcript_drift_stable_partitions(spark):
    """With skew disabled (hot_mult=1) partitions differ only in seeded
    violations (~0.1% of rows) — distributions are near-identical, so no
    drift flags. (With hot conversations on, day-level drift on turn_idx
    is a TRUE positive: at 200 convs only days 0-2 get a hot conv.)"""
    from faang_pydantics_validation_spark.datagen import gen_transcripts

    tables = gen_transcripts(spark, n_convs=200, base_turns=20, hot_mult=1, seed=42)
    d = transcript_drift(tables["transcripts"])
    rows = d.collect()
    # 3 consecutive pairs x 3 columns
    assert len(rows) == 9
    assert all(r["verdict"] == "ok" for r in rows), rows
    assert drift_violations(d).count() == 0


def test_transcript_drift_detects_injected_shift(spark, dataset):
    facts = dataset["transcripts"]
    last_ds = facts.agg(F.max("ds")).first()[0]
    # shift the last partition: all roles become 'user' (categorical) and
    # turn_idx doubled (numeric) — both must flag
    shifted = facts.where(F.col("ds") == last_ds).select(
        "conv_id",
        (F.col("turn_idx") * 2).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        "tool",
        "ts",
        "ds",
    )
    mixed = facts.where(F.col("ds") != last_ds).unionByName(shifted)
    d = transcript_drift(mixed)
    flagged = {
        (r["part_b"], r["column"]) for r in d.collect() if r["verdict"] == "drift"
    }
    assert (str(last_ds), "role") in flagged
    assert (str(last_ds), "turn_idx") in flagged
    v = drift_violations(d).collect()
    assert any(r["rule_id"] == "R_drift_role" and r["scope"] == "partition" for r in v)
