from __future__ import annotations

from faang_pydantics_validation_spark.sources.tableio import TableIO, iceberg_available


def test_tableio_roundtrip_and_partitions(spark, dataset, tmp_path):
    tio = TableIO(spark, str(tmp_path / "warehouse"))
    facts = dataset["transcripts"]
    tio.write(facts, "transcripts", partition_by="ds")
    back = tio.read("transcripts")
    assert back.count() == facts.count()
    parts = tio.partitions("transcripts")
    assert len(parts) == 4 and all(p.startswith("2026-01-0") for p in parts)


def test_partition_pruned_read(spark, dataset, tmp_path):
    tio = TableIO(spark, str(tmp_path / "wh2"))
    tio.write(dataset["transcripts"], "t", partition_by="ds")
    df = tio.read("t").where("ds = DATE'2026-01-01'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "2026-01-01" in plan, plan[:2000]


def test_iceberg_probe_doesnt_lie(spark):
    # this container has no Iceberg runtime jar; the probe must say so
    # (rather than failing later at write time)
    assert iceberg_available(spark) is False
