"""Deterministic synthetic transcript generator (FIXTURES.md).

Generates the `input_hint` fact table
    transcripts(conv_id, turn_idx, role, text, tool, ts) + ds partition
entirely with Spark expressions (spark.range + sequence/explode) so it
scales to bench sizes without driver loops, plus the dimension tables and
an EXACT expected-violations manifest.

Seeding is pure modular arithmetic on (conv_num, turn_idx):
    h = pmod(conv_num*7919 + turn_idx*104729 + seed, 100000); code = h%1000
Consecutive turns differ by 729 (mod 1000), so no two adjacent turns can
both carry a seed code in 0..13 — seeded mutations provably never collide
with their neighbours, which keeps the manifest exact.

Day layout (ds = date of ts): day0 clean, day1 warnings-only, day2+ errors
— mirroring the reference's valid / pass-with-warnings / invalid trichotomy
(base_validator.py:132-159). ~1% of conversations are "hot" (hot_mult x
turns) to exercise skew handling.

Seed codes (code == h%1000):
  0 day>=2           role='alien_role'          -> R_role_enum error
  1 day>=2           role=''                    -> R_role_required error
  2 day>=2           role='not provided'        -> R_role_required error (sentinel, mandatory)
  3 day>=2           role=NULL                  -> R_role_required error
  4 day==1           role='restricted access'   -> R_role_required warning (sentinel)
  5 day>=2 tool_turn tool='TOOL:9999'           -> R_tool_exists error (anti-join)
  6 day==1 tool_turn tool='TOOL_0003'           -> R_tool_format warning (underscore form)
  7 day==1 tool_turn payload='WRONG_LABEL'      -> R_tool_label warning (J3)
  8 day>=2           text=''                    -> R_text_required error
  9 day>=2 turn>=1   ts -= 7200s                -> R_ts_monotonic error
 10 day>=2 turn>=1   duplicate row              -> R_turn_unique error (obs '2')
 11 day>=2 2<=t<=n-2 drop row                   -> R_turn_contiguous warning at t+1
 12 day>=2 t>=3,t%3==0 role='system'            -> R_role_transition error ('assistant->system')
 13 day==1 tool_turn tool='not collected'       -> R_tool_format warning (sentinel, recommended)
Conversation-level: day>=2 & conv%211==3 -> conv_id absent from
dim_conversations -> R_conv_known error (scope='conv').
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2026_01_01 = 1767225600  # UTC

ROLES = ["system", "user", "assistant", "tool"]
TOOL_FAMILIES = ["search", "code", "io"]
ALLOWED_TRANSITIONS = [
    ("system", "user"),
    ("user", "assistant"),
    ("assistant", "tool"),
    ("tool", "user"),
]
N_TOOLS = 20


def _base_frame(
    spark: SparkSession,
    n_convs: int,
    base_turns: int,
    hot_mult: int,
    seed: int,
    n_days: int,
):
    """Per-turn frame with all derived seeding columns, pre-mutation."""
    convs = spark.range(n_convs).select(
        F.col("id").alias("conv_num"),
        F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
        (F.col("id") % n_days).cast("int").alias("day"),
        F.when(F.col("id") % 97 == 0, F.lit(hot_mult))
        .otherwise(F.lit(1))
        .alias("mult"),
    )
    convs = convs.withColumn(
        "n_turns", ((F.lit(base_turns) + F.col("conv_num") % 7) * F.col("mult")).cast("int")
    )
    turns = convs.select(
        "conv_num",
        "conv_id",
        "day",
        "n_turns",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    h = F.pmod(
        F.col("conv_num") * 7919 + F.col("turn_idx").cast("long") * 104729 + F.lit(seed),
        F.lit(100000),
    )
    return (
        turns.withColumn("h", h)
        .withColumn("code", (F.col("h") % 1000).cast("int"))
        .withColumn(
            "tool_turn", (F.col("turn_idx") > 0) & (F.col("turn_idx") % 3 == 0)
        )
        .withColumn("tool_num", (F.col("h") % N_TOOLS + 1).cast("int"))
        .withColumn(
            "base_role",
            F.when(F.col("turn_idx") == 0, F.lit("system"))
            .when(F.col("turn_idx") % 3 == 1, F.lit("user"))
            .when(F.col("turn_idx") % 3 == 2, F.lit("assistant"))
            .otherwise(F.lit("tool")),
        )
    )


def _seed_conditions(n_days: int):
    """code -> (condition on the base frame) for each seed; shared by the
    mutation pass and the manifest so they can never drift apart."""
    day, code, t = F.col("day"), F.col("code"), F.col("turn_idx")
    err_day = day >= 2
    warn_day = day == F.lit(min(1, n_days - 1))
    tool_turn = F.col("tool_turn")
    return {
        0: err_day & (code == 0),
        1: err_day & (code == 1),
        2: err_day & (code == 2),
        3: err_day & (code == 3),
        4: warn_day & (code == 4),
        5: err_day & (code == 5) & tool_turn,
        6: warn_day & (code == 6) & tool_turn,
        7: warn_day & (code == 7) & tool_turn,
        8: err_day & (code == 8),
        9: err_day & (code == 9) & (t >= 1),
        10: err_day & (code == 10) & (t >= 1),
        11: err_day & (code == 11) & (t >= 2) & (t <= F.col("n_turns") - 2),
        12: err_day & (code == 12) & (t >= 3) & (t % 3 == 0),
        13: warn_day & (code == 13) & tool_turn,
    }


def _conv_excluded():
    """Conversations absent from dim_conversations (J6 seeds)."""
    return (F.col("conv_num") % 211 == 3) & (F.col("day") >= 2)


def gen_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    base_turns: int = 20,
    hot_mult: int = 25,
    seed: int = 42,
    n_days: int = 4,
) -> dict[str, DataFrame]:
    """Returns dict with: transcripts, dim_roles, dim_tools,
    dim_conversations, allowed_transitions, expected_violations."""
    base = _base_frame(spark, n_convs, base_turns, hot_mult, seed, n_days)
    conds = _seed_conditions(n_days)

    role = (
        F.when(conds[0], F.lit("alien_role"))
        .when(conds[1], F.lit(""))
        .when(conds[2], F.lit("not provided"))
        .when(conds[3], F.lit(None).cast("string"))
        .when(conds[4], F.lit("restricted access"))
        .when(conds[12], F.lit("system"))
        .otherwise(F.col("base_role"))
    )
    role_mutated = conds[0] | conds[1] | conds[2] | conds[3] | conds[4] | conds[12]

    tool_id = F.format_string("TOOL:%04d", F.col("tool_num"))
    tool = (
        F.when(role_mutated | ~F.col("tool_turn"), F.lit(None).cast("string"))
        .when(conds[5], F.lit("TOOL:9999"))
        .when(conds[6], F.lit("TOOL_0003"))
        .when(conds[13], F.lit("not collected"))
        .otherwise(tool_id)
    )
    payload = (
        F.when(conds[6], F.lit("label_0003"))
        .when(conds[7], F.lit("WRONG_LABEL"))
        .when(F.col("tool_turn") & ~role_mutated, F.format_string("label_%04d", F.col("tool_num")))
        .otherwise(F.lit("msg"))
    )
    text = F.when(conds[8], F.lit("")).otherwise(
        F.concat(
            F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string"), F.lit(":"), payload
        )
    )
    ts_sec = (
        F.lit(EPOCH_2026_01_01)
        + F.col("day").cast("long") * 86400
        + F.pmod(F.col("conv_num"), F.lit(1000))
        + F.col("turn_idx").cast("long") * 60
        - F.when(conds[9], F.lit(7200)).otherwise(F.lit(0))
    )
    ts = F.timestamp_seconds(ts_sec)

    rows = base.select(
        "conv_num",
        "conv_id",
        F.col("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        F.to_date(F.timestamp_seconds(F.lit(EPOCH_2026_01_01) + F.col("day").cast("long") * 86400)).alias("ds"),
        conds[10].alias("__dup"),
        conds[11].alias("__drop"),
    )
    facts = rows.where(~F.col("__drop"))
    facts = facts.unionByName(facts.where(F.col("__dup")))  # duplicate seeded rows
    transcripts = facts.select("conv_id", "turn_idx", "role", "text", "tool", "ts", "ds")

    # ---- dimensions ----------------------------------------------------
    dim_roles = spark.createDataFrame(
        [(r, "mandatory") for r in ROLES], "role string, tier string"
    )
    dim_tools = spark.range(1, N_TOOLS + 1).select(
        F.format_string("TOOL:%04d", F.col("id")).alias("tool_id"),
        F.format_string("label_%04d", F.col("id")).alias("label"),
        F.element_at(
            F.array(*[F.lit(f) for f in TOOL_FAMILIES]),
            (F.col("id") % len(TOOL_FAMILIES) + 1).cast("int"),
        ).alias("family"),
    )
    dim_conversations = (
        base.select("conv_num", "conv_id", "day")
        .distinct()
        .where(~_conv_excluded())
        .select(
            "conv_id",
            F.array(*[F.lit(r) for r in ROLES]).alias("expected_roles"),
            F.format_string("species_%d", F.col("conv_num") % 5).alias("species_tag"),
        )
    )
    allowed_transitions = spark.createDataFrame(
        ALLOWED_TRANSITIONS, "prev_role string, role string"
    )
    allowed_role_tools = spark.createDataFrame(
        [("tool", f) for f in TOOL_FAMILIES], "role string, allowed_family string"
    )

    # ---- exact expected-violations manifest ----------------------------
    sev = lambda s: F.lit(s).alias("severity")  # noqa: E731
    scope_turn = F.lit("turn").alias("scope")

    def mk(cond, rule_id, severity, observed, turn=F.col("turn_idx")):
        return base.where(cond).select(
            F.col("conv_id"),
            turn.cast("int").alias("turn_idx"),
            F.lit(rule_id).alias("rule_id"),
            sev(severity),
            scope_turn,
            observed.cast("string").alias("observed"),
        )

    ts_obs = F.timestamp_seconds(
        F.lit(EPOCH_2026_01_01)
        + F.col("day").cast("long") * 86400
        + F.pmod(F.col("conv_num"), F.lit(1000))
        + F.col("turn_idx").cast("long") * 60
        - F.lit(7200)
    ).cast("string")

    manifest_parts = [
        mk(conds[0], "R_role_enum", "error", F.lit("alien_role")),
        mk(conds[1], "R_role_required", "error", F.lit("")),
        mk(conds[2], "R_role_required", "error", F.lit("not provided")),
        mk(conds[3], "R_role_required", "error", F.lit("<null>")),
        mk(conds[4], "R_role_required", "warning", F.lit("restricted access")),
        mk(conds[5], "R_tool_exists", "error", F.lit("TOOL:9999")),
        mk(conds[6], "R_tool_format", "warning", F.lit("TOOL_0003")),
        mk(conds[7], "R_tool_label", "warning", F.lit("WRONG_LABEL")),
        mk(conds[8], "R_text_required", "error", F.lit("")),
        mk(conds[9], "R_ts_monotonic", "error", ts_obs),
        mk(conds[10], "R_turn_unique", "error", F.lit("2")),
        mk(
            conds[11],
            "R_turn_contiguous",
            "warning",
            F.concat(
                (F.col("turn_idx") - 1).cast("string"), F.lit("->"), (F.col("turn_idx") + 1).cast("string")
            ),
            turn=F.col("turn_idx") + 1,
        ),
        mk(conds[12], "R_role_transition", "error", F.lit("assistant->system")),
        mk(conds[13], "R_tool_format", "warning", F.lit("not collected")),
        base.select("conv_num", "conv_id", "day")
        .distinct()
        .where(_conv_excluded())
        .select(
            "conv_id",
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit("R_conv_known").alias("rule_id"),
            sev("error"),
            F.lit("conv").alias("scope"),
            F.col("conv_id").cast("string").alias("observed"),
        ),
    ]
    expected = manifest_parts[0]
    for p in manifest_parts[1:]:
        expected = expected.unionByName(p)

    return {
        "transcripts": transcripts,
        "dim_roles": dim_roles,
        "dim_tools": dim_tools,
        "dim_conversations": dim_conversations,
        "allowed_transitions": allowed_transitions,
        "allowed_role_tools": allowed_role_tools,
        "expected_violations": expected,
    }


def write_dataset(spark: SparkSession, out_dir: str, **gen_kwargs) -> None:
    """Materialize the dataset as parquet; transcripts partitioned by ds
    (Iceberg-compatible layout; parquet-partitioned fallback per SURVEY §7)."""
    tables = gen_transcripts(spark, **gen_kwargs)
    os.makedirs(out_dir, exist_ok=True)
    tables["transcripts"].write.mode("overwrite").partitionBy("ds").parquet(
        f"{out_dir}/transcripts"
    )
    for name in (
        "dim_roles",
        "dim_tools",
        "dim_conversations",
        "allowed_transitions",
        "allowed_role_tools",
        "expected_violations",
    ):
        tables[name].write.mode("overwrite").parquet(f"{out_dir}/{name}")
