"""Per-partition column statistics in ONE hash-aggregation pass (G4 +
north_star): null-rate, min/max, approx-distinct (HyperLogLog++ via
approx_count_distinct), quantiles (KLL-class via percentile_approx).

The reference's only stats are violation counters (base_validator.py:
115-125) and implicit recommended-missing warnings (base_validator.py:
91-103); this generalizes them to the full column-profile pass the
north_star requires.

Scale notes:
- ALL columns' aggregates are computed in a single groupBy(partition) —
  one scan, one (tiny) shuffle of partial aggregation buffers. At 100 TB
  the map-side partials reduce each executor's contribution to a few KB
  per partition before the shuffle.
- Skewed keys: partial aggregation already "salts" algebraic aggregates
  (each task pre-aggregates locally), so a hot partition costs no more
  shuffle volume. For holistic aggregations over skewed *fine-grained*
  keys, use salted_agg below: explicit two-phase salt -> merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)


def column_stats(
    df: DataFrame,
    partition_col: str = "ds",
    columns: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    rsd: float = 0.02,
    accuracy: int = 1000,
    include_approx: bool = True,
) -> DataFrame:
    """Output: (partition, column, n, n_null, null_rate, min, max[,
    approx_distinct, quantiles:array<double>]) — one row per column per
    partition, computed in one pass.

    include_approx=False drops the HLL++ and KLL sketch aggregates (and
    their output columns) entirely: consumers that only read the exact
    profile would otherwise still PAY for the sketches, because nested
    column pruning does not reach through the unpivot explode to remove
    unused struct fields from the aggregation (r6: the sketches were
    ~1.3s of the 2.3s sf1.0 orders profile that selects neither)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = [c for c in (columns or df.columns) if c != partition_col]

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        is_num = isinstance(dt, _NUMERIC)
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null__{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min__{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max__{c}"))
        if not include_approx:
            continue
        aggs.append(F.approx_count_distinct(c, rsd=rsd).alias(f"__dist__{c}"))
        if is_num:
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"), list(quantiles), accuracy
                ).alias(f"__q__{c}")
            )
        else:
            aggs.append(
                F.lit(None).cast(T.ArrayType(T.DoubleType())).alias(f"__q__{c}")
            )
    wide = df.groupBy(partition_col).agg(*aggs)

    # unpivot: one struct per column -> explode (metadata-sized data here)
    approx_fields = (
        lambda c: [
            F.col(f"__dist__{c}").alias("approx_distinct"),
            F.col(f"__q__{c}").alias("quantiles"),
        ]
    ) if include_approx else (lambda c: [])
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n"),
            F.col(f"__null__{c}").alias("n_null"),
            (F.col(f"__null__{c}") / F.col("__n")).alias("null_rate"),
            F.col(f"__min__{c}").alias("min"),
            F.col(f"__max__{c}").alias("max"),
            *approx_fields(c),
        )
        for c in cols
    ]
    return (
        wide.select(partition_col, F.explode(F.array(*structs)).alias("s"))
        .select(partition_col, "s.*")
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    n_salts: int = 32,
    count_alias: str = "n",
) -> DataFrame:
    """Explicit two-phase (salt -> merge) count aggregation for skewed keys
    (north_rule: 'skew in hot conversations handled by key salting').

    Phase 1 groups by (key, salt) — a hot key's rows spread over n_salts
    reducers; phase 2 merges the n_salts partials per key. Generalize by
    adding more algebraic partial/merge pairs as needed."""
    salt = F.pmod(F.crc32(F.concat_ws("\x00", *[F.col(k).cast("string") for k in key_cols], F.monotonically_increasing_id().cast("string"))), F.lit(n_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__pn"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("__pn").alias(count_alias))


def conversation_stats(
    df: DataFrame,
    partition_col: str = "ds",
) -> DataFrame:
    """Per-conversation rollup (turns, distinct roles, ts span) then
    per-partition distribution of conversation sizes. The per-conv groupBy
    benefits from partial aggregation; the result is conversation-
    cardinality sized, so the second agg is cheap."""
    per_conv = df.groupBy(partition_col, "conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("span_sec"),
    )
    return per_conv.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("n_conversations"),
        F.sum("n_turns").alias("total_turns"),
        F.max("n_turns").alias("max_conv_turns"),
        F.percentile_approx("n_turns", [0.5, 0.95, 0.99], 10000).alias("conv_turns_q"),
        F.avg("span_sec").alias("avg_span_sec"),
    )
