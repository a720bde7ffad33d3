"""Distribution-drift checks between partition snapshots (north_star,
axis B): per-partition histograms -> KS statistic + PSI.

No reference counterpart (SURVEY.md §2.6): the reference validates rows,
not distributions. Built Spark-first:

- histograms are groupBy aggregations (numeric: fixed-width buckets via
  explicit width arithmetic; categorical: global top-K + OTHER) — fully
  distributed, one shuffle each;
- KS/PSI arithmetic runs over the (tiny) histogram table, either in pure
  SQL window functions (default — stays on the JVM) or in a grouped
  pandas/Arrow UDF (drift_metrics_pandas — the north_star's
  'pandas/Arrow UDF' surface). Both produce identical numbers and are
  cross-checked in tests.

At 10^12 turns the histogram for one column is still only
n_partitions x n_buckets rows — drift math never touches big data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6

HIST_SCHEMA = ["partition", "column", "bucket", "cnt"]


def numeric_histogram(
    df: DataFrame,
    column: str,
    partition_col: str = "ds",
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram per partition. Pass explicit (lo, hi) to keep
    construction fully LAZY (no Spark job — the dim= convention from
    similarity/dedup; asserted by test_drift_construction_is_lazy);
    omitted bounds fall back to the GLOBAL min/max via one eager
    metadata-cheap agg so buckets still align across partitions — required
    for KS/PSI comparability. Two-pass is inherent to fixed-width buckets,
    so production callers that know their column ranges (e.g. ts_hour in
    plans/drift_check.py) should always pass bounds."""
    v = F.col(column).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    width = (hi - lo) / bins or 1.0
    bucket = F.least(
        F.lit(bins - 1), F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)))
    ).cast("int")
    return (
        df.where(v.isNotNull())
        .groupBy(F.col(partition_col).cast("string").alias("partition"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "partition",
            F.lit(column).alias("column"),
            # zero-padded so lexicographic bucket order == numeric order
            # (KS cumsum must walk buckets in value order)
            F.format_string("%05d", F.col("bucket")).alias("bucket"),
            "cnt",
        )
    )


def categorical_histogram(
    df: DataFrame,
    column: str,
    partition_col: str = "ds",
    top_k: int = 20,
    categories: list | None = None,
) -> DataFrame:
    """Top-K categories (by global frequency) + '__OTHER__' bucket. Pass
    an explicit `categories` list to keep construction fully lazy (the
    (lo, hi) / dim= convention); omitted, the top-K is collected eagerly
    (one TakeOrdered over the category counts — metadata-sized)."""
    if categories is not None:
        top = list(categories)
    else:
        top = [
            r[0]
            for r in df.groupBy(column)
            .count()
            .orderBy(F.desc("count"), F.asc(column))
            .limit(top_k)
            .collect()
            if r[0] is not None
        ]
    bucket = (
        F.when(F.col(column).cast("string").isin([str(t) for t in top]), F.col(column).cast("string"))
        .otherwise(F.lit("__OTHER__"))
    )
    return (
        df.where(F.col(column).isNotNull())
        .groupBy(F.col(partition_col).cast("string").alias("partition"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("partition", F.lit(column).alias("column"), "bucket", "cnt")
    )


def _aligned_pq(hist: DataFrame, part_a: str, part_b: str) -> DataFrame:
    """Full-outer align bucket counts of two snapshots; normalize to
    probabilities with epsilon smoothing."""
    a = hist.where(F.col("partition") == part_a).groupBy("column", "bucket").agg(
        F.sum("cnt").alias("cnt_a")
    )
    b = hist.where(F.col("partition") == part_b).groupBy("column", "bucket").agg(
        F.sum("cnt").alias("cnt_b")
    )
    ab = a.join(b, on=["column", "bucket"], how="full_outer").na.fill(
        {"cnt_a": 0, "cnt_b": 0}
    )
    tot = Window.partitionBy("column")
    return ab.select(
        "column",
        "bucket",
        (F.col("cnt_a") / F.sum("cnt_a").over(tot) + F.lit(EPS)).alias("p"),
        (F.col("cnt_b") / F.sum("cnt_b").over(tot) + F.lit(EPS)).alias("q"),
    )


def drift_metrics_sql(
    hist: DataFrame, part_a: str, part_b: str, psi_threshold: float = 0.2, ks_threshold: float = 0.2
) -> DataFrame:
    """KS + PSI per column, pure Spark SQL (window cumsums — JVM-side).

    Output: (column, part_a, part_b, ks_stat, psi, verdict)."""
    pq = _aligned_pq(hist, part_a, part_b)
    cum = Window.partitionBy("column").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scored = pq.select(
        "column",
        F.abs(F.sum("p").over(cum) - F.sum("q").over(cum)).alias("cdf_diff"),
        ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi_term"),
    )
    return (
        scored.groupBy("column")
        .agg(F.max("cdf_diff").alias("ks_stat"), F.sum("psi_term").alias("psi"))
        .select(
            "column",
            F.lit(part_a).alias("part_a"),
            F.lit(part_b).alias("part_b"),
            "ks_stat",
            "psi",
            F.when(
                (F.col("psi") > psi_threshold) | (F.col("ks_stat") > ks_threshold),
                F.lit("drift"),
            )
            .otherwise(F.lit("ok"))
            .alias("verdict"),
        )
    )


def drift_metrics_pandas(
    hist: DataFrame, part_a: str, part_b: str, psi_threshold: float = 0.2, ks_threshold: float = 0.2
) -> DataFrame:
    """Same math as drift_metrics_sql but via applyInPandas grouped by
    column (Arrow-batched, vectorized numpy inside) — the north_star's
    pandas/Arrow UDF surface for sketch/drift arithmetic."""
    pq = _aligned_pq(hist, part_a, part_b)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket")
        p, q = pdf["p"].to_numpy(), pdf["q"].to_numpy()
        ks = float(abs(p.cumsum() - q.cumsum()).max())
        import numpy as np

        psi = float(((p - q) * np.log(p / q)).sum())
        return pd.DataFrame(
            {
                "column": [pdf["column"].iloc[0]],
                "part_a": [part_a],
                "part_b": [part_b],
                "ks_stat": [ks],
                "psi": [psi],
                "verdict": ["drift" if psi > psi_threshold or ks > ks_threshold else "ok"],
            }
        )

    return pq.groupBy("column").applyInPandas(
        score,
        schema="column string, part_a string, part_b string, ks_stat double, psi double, verdict string",
    )
