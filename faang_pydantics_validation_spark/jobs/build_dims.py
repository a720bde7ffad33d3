"""Offline dimension builder: compile JSON registry dumps into the
pre-materialized dimension tables the engine joins at runtime — the
design completion of SURVEY.md §2.1 S2/S3, which replaces the reference's
runtime HTTP + in-memory caches (OLS ontology search and the BioSamples
registry, generic_validator_classes.py:125-216 and :306-402) with
parquet dims refreshed by THIS job on whatever cadence the registry
changes.

    spark-submit faang_pydantics_validation_spark/jobs/build_dims.py \
        --terms ols_dump.json --conversations registry_dump.json \
        --out DIMS_DIR [--max-depth 12]

Input shapes (JSON array files, the shape of an OLS export / registry
dump):

    terms:          [{"term": "TOOL:0001" | "TOOL_0001",
                      "label": "...", "family": "...",
                      "parents": ["TOOL:0000", ...]}, ...]
    conversations:  [{"conv_id": "...",
                      "expected_roles": ["user", ...],
                      "species_tag": "..."}, ...]

Outputs under --out (each a parquet directory, ready for
validate_cli --dims / serve_http --dims / plans.fused):

    dim_tools          (tool_id, label, family)   — J1/J3 join target
    term_closure       (term, is_a_path)          — J4/J5 subclass checks,
                       via operators.ontology.build_term_closure over the
                       dump's parent edges
    dim_conversations  (conv_id, expected_roles, species_tag) — J6 target

Term ids are normalized underscore->colon (P3, validation_utils.py:5-15)
at BUILD time so the runtime join key is canonical; duplicate term rows
keep the FIRST row seen — label, family AND parent edges together (the
reference cache's first-write-wins dict semantics, implemented with a
min_by on the file-order id). Everything is DataFrame-native — the dumps
are read with
explicit schemas (multiLine JSON), so a registry of 10^8 conversations
builds the same way the test fixture does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

TERMS_SCHEMA = (
    "term string, label string, family string, parents array<string>"
)
CONVS_SCHEMA = "conv_id string, expected_roles array<string>, species_tag string"


def build_tool_dims(spark, terms_path: str, max_depth: int = 12):
    """(dim_tools, term_closure) from an OLS-export-shaped dump."""
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.operators.ontology import (
        build_term_closure,
    )
    from faang_pydantics_validation_spark.rules.library import norm_term_colon

    raw = spark.read.schema(TERMS_SCHEMA).option("multiLine", True).json(terms_path)
    # dump order survives the read: a multiLine JSON array file is
    # unsplittable (one partition per file), so monotonically_increasing_id
    # numbers rows in file order — first-write-wins duplicate handling
    # then matches the reference's dict cache EXACTLY (first row's label,
    # family AND parent edges; a min()-per-column winner could mix fields
    # from different duplicate rows and union their edges). Multi-file
    # dumps order within each file.
    canon = raw.withColumn("__ord", F.monotonically_increasing_id()).select(
        norm_term_colon(F.trim("term")).alias("tool_id"),
        F.col("label"),
        F.col("family"),
        F.transform(
            F.coalesce(F.col("parents"), F.array().cast("array<string>")),
            lambda p: norm_term_colon(F.trim(p)),
        ).alias("parents"),
        F.col("__ord"),
    ).where(F.col("tool_id").isNotNull() & (F.col("tool_id") != ""))
    first = (
        canon.groupBy("tool_id")
        .agg(
            F.min_by(
                F.struct("label", "family", "parents"), F.col("__ord")
            ).alias("r")
        )
        .select("tool_id", "r.label", "r.family", "r.parents")
    )
    dim_tools = first.select("tool_id", "label", "family")
    edges = first.select(
        F.col("tool_id").alias("child"), F.explode("parents").alias("parent")
    ).where(F.col("parent").isNotNull() & (F.col("parent") != ""))
    # roots (no parent edge) still need a closure row: self-path only
    roots = dim_tools.select(F.col("tool_id").alias("child")).join(
        edges.select("child").distinct(), on="child", how="left_anti"
    )
    closure = build_term_closure(edges, max_depth=max_depth).unionByName(
        roots.select(
            F.col("child").alias("term"), F.array(F.col("child")).alias("is_a_path")
        )
    )
    return dim_tools, closure


def build_conversation_dim(spark, conversations_path: str):
    from pyspark.sql import functions as F

    raw = (
        spark.read.schema(CONVS_SCHEMA)
        .option("multiLine", True)
        .json(conversations_path)
    )
    # first-write-wins on duplicate conv_ids, like build_tool_dims — a
    # plain dropDuplicates keeps an arbitrary row
    return (
        raw.withColumn("__ord", F.monotonically_increasing_id())
        .where(F.col("conv_id").isNotNull() & (F.trim("conv_id") != ""))
        .groupBy("conv_id")
        .agg(
            F.min_by(
                F.struct("expected_roles", "species_tag"), F.col("__ord")
            ).alias("r")
        )
        .select("conv_id", "r.expected_roles", "r.species_tag")
    )


def build_dims(
    spark,
    out_dir: str,
    terms_path: str | None = None,
    conversations_path: str | None = None,
    max_depth: int = 12,
) -> dict:
    """Build + write every dim whose dump was provided; returns
    {name: row_count} for the job summary."""
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}
    if terms_path:
        dim_tools, closure = build_tool_dims(spark, terms_path, max_depth)
        dim_tools.write.mode("overwrite").parquet(f"{out_dir}/dim_tools")
        closure.write.mode("overwrite").parquet(f"{out_dir}/term_closure")
        counts["dim_tools"] = spark.read.parquet(f"{out_dir}/dim_tools").count()
        counts["term_closure"] = spark.read.parquet(
            f"{out_dir}/term_closure"
        ).count()
    if conversations_path:
        conv = build_conversation_dim(spark, conversations_path)
        conv.write.mode("overwrite").parquet(f"{out_dir}/dim_conversations")
        counts["dim_conversations"] = spark.read.parquet(
            f"{out_dir}/dim_conversations"
        ).count()
    return counts


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="compile JSON registry dumps into runtime dimension parquet"
    )
    ap.add_argument("--terms", default=None, help="OLS-export-shaped JSON array")
    ap.add_argument(
        "--conversations", default=None, help="conversation-registry JSON array"
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-depth", type=int, default=12)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not args.terms and not args.conversations:
        print("nothing to build: pass --terms and/or --conversations", file=sys.stderr)
        return 2

    from faang_pydantics_validation_spark.session import get_spark

    spark = get_spark(master=args.master)
    counts = build_dims(
        spark,
        args.out,
        terms_path=args.terms,
        conversations_path=args.conversations,
        max_depth=args.max_depth,
    )
    print(json.dumps({"out": args.out, "rows": counts}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
