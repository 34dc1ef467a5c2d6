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


def test_bucketed_index_join_skips_index_exchange(spark):
    """The persisted-dedup-index storage shape: the band index written
    bucketed on its join keys is read WITHOUT an exchange in a
    sort-merge join — only the (small) increment side shuffles."""
    from marker_spark.ops.dedup import lsh_band_table, minhash_signatures

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = minhash_signatures(docs, num_perm=32)
    old = lsh_band_table(sigs.where(F.col("doc_id") % 4 != 0), bands=8)
    new = lsh_band_table(sigs.where(F.col("doc_id") % 4 == 0), bands=8)

    tp = TableProvider(spark)
    spark.sql("DROP TABLE IF EXISTS lsh_index_bucketed_test")
    try:
        tp.write_bucketed(
            old, "lsh_index_bucketed_test",
            bucket_by=["band_id", "band_hash"], n_buckets=4,
            sort_by=["band_id", "band_hash"],
        )
        index = tp.read_table("lsh_index_bucketed_test")
        joined = index.join(
            new.hint("merge"), ["band_id", "band_hash"]
        ).where(index["doc_id"] != new["doc_id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # exactly one exchange: the increment side; the bucketed index
        # scan feeds the join directly
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Bucketed: true" in plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS lsh_index_bucketed_test")
