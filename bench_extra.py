"""Extra benchmarks for the optimization rounds (guide §1): per-query
isolation with the noop sink, job labels, and .explain("formatted")
capture. NOT part of the driver contract — bench.py stays frozen; this
file exists so plan/timing evidence can be produced without touching it.

Usage:
    python bench_extra.py [query ...]            # default: bench.py HEADLINE
    env SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
    env SPARK_GRAFT_CPUS     (default os.cpu_count())
    env SPARK_GRAFT_REPEATS  (default 3, interleaved)
    env SPARK_GRAFT_EXPLAIN_DIR  -> write <dir>/<query>_<tag>.txt plans
    env SPARK_GRAFT_EXPLAIN_TAG  (default "plan")

Prints one JSON line: {"queries": {name: best_sec}, "queries_median": ...,
"samples": ...} — same best-of-K discipline as bench.py (host shows 2-5x
wall variance; never judge a change from one sample).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from faang_pydantics_validation_spark.contract import QUERIES  # noqa: E402
from faang_pydantics_validation_spark.session import get_spark  # noqa: E402

DEFAULT = [
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


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    explain_dir = os.environ.get("SPARK_GRAFT_EXPLAIN_DIR")
    tag = os.environ.get("SPARK_GRAFT_EXPLAIN_TAG", "plan")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # JIT warmup

    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)

    if os.environ.get("SPARK_GRAFT_TIME", "1") == "0":
        print(json.dumps({"explained": names, "dir": explain_dir}))
        spark.stop()
        return

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            _force(QUERIES[name](spark, sf_dir))
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)

    def _median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cores": cpus,
                "repeats": repeats,
                "queries": {n: min(xs) for n, xs in samples.items()},
                "queries_median": {n: round(_median(xs), 3) for n, xs in samples.items()},
                "samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
