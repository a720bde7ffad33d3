"""Thin table layer: Iceberg when the runtime jar is present, partitioned
parquet otherwise (SURVEY.md §7 'Iceberg in sandbox' risk item).

The engine only relies on three table capabilities, all of which the
parquet fallback provides with the same API:
- partitioned write (ds partition column = Iceberg identity partition)
- partition-pruned read (filter on ds -> PartitionFilters in the scan)
- partition listing for the checkpoint manifest (metadata-only)

On a real deployment the Iceberg path adds snapshot ids to the lineage
manifest (plans/checkpoint.py records the ruleset hash today; the
snapshot id slots into the same entry).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """iceberg | parquet-partitioned switch behind one API."""

    def __init__(self, spark: SparkSession, base: str, catalog: str = "local"):
        self.spark = spark
        self.base = base
        self.use_iceberg = iceberg_available(spark)
        self.catalog = catalog

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.db.{name}"

    def write(self, df: DataFrame, name: str, partition_by: str | None = "ds") -> None:
        if self.use_iceberg:
            w = df.writeTo(self._ident(name)).using("iceberg")
            if partition_by:
                w = w.partitionedBy(F.col(partition_by))
            w.createOrReplace()
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(partition_by)
            w.parquet(os.path.join(self.base, name))

    def append(self, df: DataFrame, name: str, partition_by: str | None = "ds") -> None:
        if self.use_iceberg:
            df.writeTo(self._ident(name)).append()
        else:
            w = df.write.mode("append")
            if partition_by:
                w = w.partitionBy(partition_by)
            w.parquet(os.path.join(self.base, name))

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(os.path.join(self.base, name))

    def partitions(self, name: str, partition_col: str = "ds") -> list[str]:
        """Metadata-only partition listing (Iceberg: partitions metadata
        table; parquet: directory names — no data read either way)."""
        if self.use_iceberg:
            rows = self.spark.sql(
                f"SELECT partition FROM {self._ident(name)}.partitions"
            ).collect()
            return sorted(str(r["partition"][partition_col]) for r in rows)
        root = os.path.join(self.base, name)
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(root)
            if d.startswith(f"{partition_col}=")
        )

    def snapshot_id(self, name: str) -> str | None:
        """Lineage token for the checkpoint manifest."""
        if self.use_iceberg:
            r = self.spark.sql(
                f"SELECT snapshot_id FROM {self._ident(name)}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1"
            ).first()
            return str(r["snapshot_id"]) if r else None
        return None
