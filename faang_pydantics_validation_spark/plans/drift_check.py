"""Transcript drift pass (north_star axis B): KS/PSI between consecutive
ds-partition snapshots for the standard transcript profile columns —
role (categorical), turn_idx (numeric), hour-of-ts (numeric).

Histograms for ALL partitions are built in one pass per column (grouped
aggregations); the pairwise KS/PSI over consecutive snapshots runs on the
metadata-sized histogram table. Drift findings are emitted in the
canonical violation schema with scope='partition' so they flow into the
same sinks/verdicts as row rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import drift as DR


def transcript_drift(
    facts: DataFrame,
    partition_col: str = "ds",
    bins: int = 24,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.2,
    severity: str = "warning",
) -> DataFrame:
    """Returns drift metrics per (consecutive partition pair, column):
    (part_a, part_b, column, ks_stat, psi, verdict)."""
    prof = facts.select(
        F.col(partition_col).cast("string").alias(partition_col),
        F.col("turn_idx").cast("double").alias("turn_idx"),
        F.hour("ts").cast("double").alias("ts_hour"),
        "role",
    )
    hist = (
        DR.numeric_histogram(prof, "turn_idx", partition_col, bins=bins)
        .unionByName(DR.numeric_histogram(prof, "ts_hour", partition_col, bins=24, lo=0.0, hi=24.0))
        .unionByName(DR.categorical_histogram(prof, "role", partition_col, top_k=10))
    )
    hist = hist.cache()
    parts = sorted(r[0] for r in hist.select("partition").distinct().collect())
    out = None
    for a, b in zip(parts, parts[1:]):
        m = DR.drift_metrics_sql(hist, a, b, psi_threshold, ks_threshold)
        out = m if out is None else out.unionByName(m)
    if out is None:
        return facts.sparkSession.createDataFrame(
            [], "column string, part_a string, part_b string, ks_stat double, psi double, verdict string"
        )
    return out


def drift_violations(drift_df: DataFrame, severity: str = "warning") -> DataFrame:
    """Project drift findings into the canonical violation schema
    (scope='partition'; conv_id carries the partition pair)."""
    return drift_df.where(F.col("verdict") == "drift").select(
        F.concat(F.col("part_a"), F.lit(".."), F.col("part_b")).alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.col("part_b").cast("date").alias("ds"),
        F.concat(F.lit("R_drift_"), F.col("column")).alias("rule_id"),
        F.lit(severity).alias("severity"),
        F.lit("partition").alias("scope"),
        F.concat(
            F.lit("ks="), F.round("ks_stat", 4).cast("string"),
            F.lit(",psi="), F.round("psi", 4).cast("string"),
        ).alias("observed"),
    )
