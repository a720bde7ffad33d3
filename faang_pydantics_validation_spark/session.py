"""SparkSession factory tuned for the validation engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime re-planning + skew-join splitting), broadcast join threshold high
enough for all dimension tables, Arrow enabled for the few pandas UDFs
(drift math), UTC session timezone for deterministic timestamp handling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "faang-pydantics-validation-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    master defaults to local[$SPARK_GRAFT_CPUS] (env) or local[*].
    shuffle_partitions defaults to the local core count — on a real
    cluster this would be ~2-3x total executor cores, or left to AQE
    coalescing (spark.sql.adaptive.coalescePartitions.enabled=true).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = int(n) if n.isdigit() else (os.cpu_count() or 8)

    # Scale-dependent knobs, parameterised per the optimization guide (§2.2,
    # §6): the LOCAL defaults keep all cores busy on single-box benches whose
    # inputs are a few MB-to-100s-of-MB (split floor ~= cores, AQE advisory
    # small enough that CPU-dense/byte-light stages — regex rule evaluation,
    # shingle tokenization — don't coalesce below the core count). On a real
    # cluster set the env vars to the usual production values
    # (maxPartitionBytes 128m-1g for big sequential scans, advisory 64-256m
    # so shuffle partitions land in the 100MB-1GB range) — the point is the
    # settings scale with the deployment instead of being constants tuned
    # for either mode. These are the same values jobs/validate_bench.py has
    # always used for the N-vs-4N scaling evidence; promoting them to the
    # session factory gives every entrypoint the same scan/shuffle
    # parallelism floor.
    # 8m (not 4m): the 232MB/192-file bench-transcripts scan packs into ~31
    # tasks — one clean wave on 32 cores; 4m gave 50 tasks = 1.6 waves with
    # an idle tail (best-of-3 A/B: 5.48s vs 6.63s on the fused suite)
    max_part = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024))
    open_cost = os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", str(512 * 1024))
    advisory = os.environ.get("SPARK_GRAFT_ADVISORY_BYTES", str(8 * 1024 * 1024))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local[32] runs 32 concurrent tasks inside ONE JVM: at 8g the
        # quadratic-stream aggregations (dedup_ngram's pair count: ~1.8M
        # hash-table entries x 32 tasks) spilled ~13.5 GB memory / ~1.9 GB
        # disk PER STAGE (measured via the stage REST API, r6); 24g runs
        # them spill-free (guide §5: heavy spill -> more memory per
        # concurrent task). Parameterised: a real cluster sizes
        # spark.executor.memory to its own core count instead.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", max_part)
        .config("spark.sql.files.openCostInBytes", open_cost)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
        # let AQE (incl. partition coalescing) apply INSIDE cached plans:
        # off, every persisted intermediate (dedup shingle/banded tables)
        # is stored at the static shuffle-partition count (64), and every
        # downstream stage over the cache pays 64 tasks regardless of how
        # few MB it holds — the banded minhash table is ~3 MB in 64
        # partitions, pure scheduling overhead (guide §2.2).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
