"""Table-provider tests: partitioned write/read roundtrip, partition
pruning in the plan, retention drop; plus the cache's DataFrame-form
lookup (range predicate + membership UDF)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marker_spark.tables import TableProvider

SF_DIR = "/root/testdata/sf0.001"
DAY = 86_400


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    tp = TableProvider(spark, "parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "bucket_start", (F.floor(F.unix_timestamp("ts") / (10 * DAY)) * (10 * DAY)).cast("long")
    )
    loc = str(tmp_path / "buckets")
    tp.write(ev, loc, partition_by=["bucket_start"])
    back = tp.read(loc)
    assert back.count() == ev.count()

    # overlap predicate prunes partitions: plan's partition filters
    q = back.where((F.col("bucket_start") >= 1704672000) & (F.col("bucket_start") <= 1705536000))
    plan = q._jdf.queryExecution().explainString(
        q._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "bucket_start" in pf


def test_retention_drop(spark, tmp_path):
    tp = TableProvider(spark, "parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "bucket_start", (F.floor(F.unix_timestamp("ts") / (10 * DAY)) * (10 * DAY)).cast("long")
    )
    loc = str(tmp_path / "buckets")
    tp.write(ev, loc, partition_by=["bucket_start"])
    starts = sorted(r["bucket_start"] for r in tp.read(loc).select("bucket_start").distinct().collect())
    dropped = tp.drop_partitions_before(loc, "bucket_start", starts[1])
    assert dropped == 1
    remaining = sorted(r["bucket_start"] for r in tp.read(loc).select("bucket_start").distinct().collect())
    assert remaining == starts[1:]


def test_iceberg_requires_catalog(spark):
    with pytest.raises(RuntimeError, match="iceberg provider requires"):
        TableProvider(spark, "iceberg")


def test_cache_lookup_df(spark):
    from marker_spark.cache.sketch_cache import OPEN_END, SketchCache
    from marker_spark.params import CacheParams

    params = CacheParams(duration=10 * DAY, lifespan=30 * DAY, fp=0.001, total_capacity=100_000)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "marker", F.concat_ws("|", F.col("event_id"), F.col("props"))
    )
    cache = SketchCache(params)
    cache.insert_batch(ev, ts_col="ts", marker_col="marker")
    probe = ev.select("marker").limit(200)
    found = cache.lookup_df(0, OPEN_END, probe, "marker")
    assert found.where(F.col("found")).count() == 200
    none = cache.lookup_df(100, 50, probe, "marker")  # inverted range guard
    assert none.where(F.col("found")).count() == 0
