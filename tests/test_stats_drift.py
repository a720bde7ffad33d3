"""Stats pass (G4) and drift (KS/PSI) tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.operators import drift as D
from faang_pydantics_validation_spark.operators import stats as S


def test_column_stats_single_pass(spark, dataset):
    facts = dataset["transcripts"]
    out = S.column_stats(facts, partition_col="ds").collect()
    by_key = {(str(r["ds"]), r["column"]): r for r in out}
    n_parts = facts.select("ds").distinct().count()
    assert len(out) == 6 * n_parts  # 6 non-partition columns x partitions

    # exact cross-check one partition against direct aggregation
    some_ds = sorted({str(r["ds"]) for r in out})[0]
    direct = facts.where(F.col("ds").cast("string") == some_ds).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("role").isNull().cast("long")).alias("n_null"),
        F.min("turn_idx").alias("mn"),
        F.max("turn_idx").alias("mx"),
        F.countDistinct("conv_id").alias("exact_conv"),
    ).first()
    r = by_key[(some_ds, "role")]
    assert r["n"] == direct["n"] and r["n_null"] == direct["n_null"]
    t = by_key[(some_ds, "turn_idx")]
    assert t["min"] == str(direct["mn"]) and t["max"] == str(direct["mx"])
    assert t["quantiles"] is not None and len(t["quantiles"]) == 4
    # HLL++ within rsd tolerance of exact distinct
    c = by_key[(some_ds, "conv_id")]
    assert abs(c["approx_distinct"] - direct["exact_conv"]) <= max(2, 0.1 * direct["exact_conv"])
    # string column has no quantiles
    assert by_key[(some_ds, "text")]["quantiles"] is None


def test_salted_agg_matches_plain(spark, dataset):
    facts = dataset["transcripts"]
    plain = {
        (r["conv_id"],): r["n"]
        for r in facts.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r["conv_id"],): r["n"] for r in S.salted_agg(facts, ["conv_id"], n_salts=8).collect()
    }
    assert salted == plain


def test_conversation_stats(spark, dataset):
    out = S.conversation_stats(dataset["transcripts"]).collect()
    assert len(out) == 4
    for r in out:
        assert r["max_conv_turns"] >= r["conv_turns_q"][0]  # max >= median
        assert r["total_turns"] > r["n_conversations"]


def _mk_hist(spark, rows):
    return spark.createDataFrame(rows, "partition string, column string, bucket string, cnt long")


def test_drift_identical_distributions(spark):
    h = _mk_hist(
        spark,
        [("a", "x", "00000", 50), ("a", "x", "00001", 50), ("b", "x", "00000", 100), ("b", "x", "00001", 100)],
    )
    r = D.drift_metrics_sql(h, "a", "b").first()
    assert r["verdict"] == "ok"
    assert abs(r["ks_stat"]) < 1e-9 and abs(r["psi"]) < 1e-9


def test_drift_shifted_distribution_flags(spark):
    h = _mk_hist(
        spark,
        [("a", "x", "00000", 90), ("a", "x", "00001", 10), ("b", "x", "00000", 10), ("b", "x", "00001", 90)],
    )
    r = D.drift_metrics_sql(h, "a", "b").first()
    assert r["verdict"] == "drift"
    assert abs(r["ks_stat"] - 0.8) < 1e-6
    # PSI closed form: (0.9-0.1)*ln(9) * 2 terms
    assert abs(r["psi"] - 2 * 0.8 * math.log(9)) < 1e-3


def test_drift_sql_and_pandas_agree(spark, dataset):
    facts = dataset["transcripts"]
    h_num = D.numeric_histogram(facts, "turn_idx", bins=10)
    h_cat = D.categorical_histogram(facts, "role", top_k=5)
    hist = h_num.unionByName(h_cat)
    parts = sorted(r[0] for r in hist.select("partition").distinct().collect())
    a, b = parts[0], parts[-1]
    sql_rows = {r["column"]: r for r in D.drift_metrics_sql(hist, a, b).collect()}
    pd_rows = {r["column"]: r for r in D.drift_metrics_pandas(hist, a, b).collect()}
    assert set(sql_rows) == set(pd_rows) == {"turn_idx", "role"}
    for c in sql_rows:
        assert abs(sql_rows[c]["ks_stat"] - pd_rows[c]["ks_stat"]) < 1e-9
        assert abs(sql_rows[c]["psi"] - pd_rows[c]["psi"]) < 1e-9
        assert sql_rows[c]["verdict"] == pd_rows[c]["verdict"]


def test_numeric_histogram_bucket_alignment(spark, dataset):
    """Buckets must align across partitions (global bounds)."""
    h = D.numeric_histogram(dataset["transcripts"], "turn_idx", bins=8)
    per_part = h.groupBy("partition").agg(F.sum("cnt").alias("n")).collect()
    total = sum(r["n"] for r in per_part)
    assert total == dataset["transcripts"].count()
    buckets = {r[0] for r in h.select("bucket").distinct().collect()}
    assert all(len(b) == 5 for b in buckets)  # zero-padded, order-stable


def test_drift_construction_is_lazy(spark):
    """Constructing histograms with explicit bounds/categories must launch
    no Spark job (the dim= convention from similarity/dedup): the eager
    min/max agg and top-K collect are fallbacks for OMITTED bounds only,
    and explicit-bounds results equal the inferred-bounds results when the
    bounds coincide."""
    df = spark.createDataFrame(
        [("a", 0.0, "x"), ("a", 5.0, "y"), ("b", 10.0, "x")],
        "p string, v double, c string",
    )
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup())
    lazy_num = D.numeric_histogram(df, "v", partition_col="p", bins=5, lo=0.0, hi=10.0)
    lazy_cat = D.categorical_histogram(df, "c", partition_col="p", categories=["x", "y"])
    after = len(sc.statusTracker().getJobIdsForGroup())
    assert after == before

    eager_num = D.numeric_histogram(df, "v", partition_col="p", bins=5)
    assert {tuple(r) for r in lazy_num.collect()} == {tuple(r) for r in eager_num.collect()}
    eager_cat = D.categorical_histogram(df, "c", partition_col="p", top_k=2)
    assert {tuple(r) for r in lazy_cat.collect()} == {tuple(r) for r in eager_cat.collect()}
