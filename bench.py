"""Per-round benchmark (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the transcript-validation throughput over
a cached synthetic dataset. Prints ONE JSON line:
    {"metric": ..., "value": <total headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}

Noise discipline (the host VM shows 2-5x wall variance — CLAUDE.md):
every query is timed $SPARK_GRAFT_REPEATS (default 3) times within ONE
JVM after a JIT warmup; "queries"/"value" carry the BEST-of-K (the
least-interfered sample — the standard single-box estimator), and
"queries_median" the medians, so round-over-round deltas are signal, not
scheduler luck. Set SPARK_GRAFT_REPEATS=1 for a quick smoke run."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from faang_pydantics_validation_spark.contract import QUERIES  # noqa: E402
from faang_pydantics_validation_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "verdicts_events_daily",
    "uniqueness_lineitem",
    "window_rules_lineitem",
    "column_stats_orders",
    "drift_value_halves",
    "sessionization_events",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "dedup_ngram_jaccard",
    "minhash_lsh_documents",
    "ann_cosine_topk",
    "text_quality",
]

BENCH_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "bench_transcripts")
BENCH_GEN_KWARGS = dict(n_convs=400000, base_turns=20, hot_mult=25, seed=42, n_days=4)


def _force(df) -> int:
    """Execute fully without driver-side materialization cost."""
    return df.write.format("noop").mode("overwrite").save() or 0


def ensure_bench_transcripts(spark) -> str:
    marker = os.path.join(BENCH_DATA_DIR, "_SUCCESS_GEN")
    if not os.path.exists(marker):
        from faang_pydantics_validation_spark.datagen import write_dataset

        write_dataset(spark, BENCH_DATA_DIR, **BENCH_GEN_KWARGS)
        with open(marker, "w") as f:
            f.write(json.dumps(BENCH_GEN_KWARGS))
    return BENCH_DATA_DIR


def main() -> None:
    _repo = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus * 2)

    spark.range(10_000_000).selectExpr("sum(id)").collect()  # JIT/codegen warmup

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # interleave repeats (ABC ABC ABC, not AAA BBB CCC) so a transient
    # host-noise burst degrades ONE sample of many queries instead of all
    # samples of one query
    for _ in range(repeats):
        for name in HEADLINE:
            t0 = time.time()
            _force(QUERIES[name](spark, sf_dir))
            samples[name].append(time.time() - t0)

    # transcript validation throughput (the BASELINE.json metric)
    data_dir = ensure_bench_transcripts(spark)
    from faang_pydantics_validation_spark.plans.fused import validate_transcripts_fused as validate_transcripts

    facts = spark.read.parquet(f"{data_dir}/transcripts")
    dims = {
        n: spark.read.parquet(f"{data_dir}/{n}")
        for n in ("dim_roles", "dim_tools", "dim_conversations", "allowed_transitions")
    }
    n_turns = facts.count()
    # same one-action, execution-only configuration bench_scaling measures
    # (fast_verdicts; parity with the classic path asserted in test_fused).
    # Catalyst analysis + physical planning are forced BEFORE the timer —
    # the 13-rule plan costs ~1-2s of driver time that is identical at any
    # data scale and amortizes to ~0 at the 10^12-turn target (the
    # validate_bench.py / bench_scaling.py timed-region convention). One
    # untimed warmup execution absorbs first-run JIT (CLAUDE.md: never
    # judge throughput from run 1).
    validate_transcripts(facts, dims, fast_verdicts=True).verdicts.collect()
    val_samples = []
    for _ in range(repeats):
        res = validate_transcripts(facts, dims, fast_verdicts=True)
        res.verdicts._jdf.queryExecution().executedPlan()
        t0 = time.time()
        res.verdicts.collect()
        val_samples.append(time.time() - t0)
    samples["transcript_validation"] = val_samples

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    timings = {name: round(min(xs), 3) for name, xs in samples.items()}
    medians = {name: round(_median(xs), 3) for name, xs in samples.items()}
    val_wall = min(val_samples)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "repeats": repeats,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_turns": n_turns,
                "turns_per_sec": round(n_turns / val_wall, 1),
                "cores": cpus,
                **(
                    {"scaling": json.load(open(_sc))}
                    if (
                        # data/ copy appears mid-session, BENCH/ copy is
                        # committed and survives data/ wipes — pick by
                        # mtime so a stale leftover local artifact never
                        # shadows newer committed evidence
                        _sc := max(
                            (
                                p
                                for p in (
                                    os.path.join(_repo, "data", "scaling_summary.json"),
                                    os.path.join(_repo, "BENCH", "scaling_summary.json"),
                                )
                                if os.path.exists(p)
                            ),
                            key=os.path.getmtime,
                            default=None,
                        )
                    )
                    else {}
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
