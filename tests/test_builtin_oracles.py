"""Sanity cross-checks against PySpark's own approximate built-ins
(FIXTURES.md §6: independent approximate oracles, band checks only) and
the range-join lookup form vs the driver-API lookup.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
DAY = 86_400


def test_hll_vs_spark_builtins(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).collect()[0][0]

    from marker_spark.sketches.hll import HllSketch

    ours = HllSketch(p=14)
    ids = [int(r["user_id"]).to_bytes(8, "little") for r in ev.select("user_id").collect()]
    ours.update(ids)
    est = ours.estimate()
    assert abs(est - exact) / max(exact, 1) <= 3 * ours.std_error
    assert abs(est - approx) / max(approx, 1) <= 0.10


def test_tdigest_vs_percentile_approx(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sp = ev.select(F.percentile_approx("value", 0.5, 10000)).collect()[0][0]

    from marker_spark.sketches.tdigest import TDigestSketch

    td = TDigestSketch(delta=200)
    vals = np.array([r["value"] for r in ev.select("value").collect()])
    td.update(vals)
    assert abs(td.quantile(0.5) - sp) / max(abs(sp), 1e-9) <= 0.02


def test_kll_vs_spark_kll(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    try:
        row = ev.select(
            F.expr("kll_sketch_to_estimated_quantile(kll_sketch_agg_double(value), 0.5d)")
        ).collect()
        sp = row[0][0]
    except Exception:
        pytest.skip("kll builtins unavailable in this Spark build")
    from marker_spark.sketches.kll import KllSketch

    k = KllSketch(k=256)
    vals = np.array([r["value"] for r in ev.select("value").collect()])
    k.update(vals)
    assert abs(k.quantile(0.5) - sp) / max(abs(sp), 1e-9) <= 0.05


def test_range_join_lookup_matches_driver_api(spark):
    from marker_spark.cache.sketch_cache import OPEN_END, SketchCache
    from marker_spark.params import CacheParams

    params = CacheParams(duration=10 * DAY, lifespan=30 * DAY, fp=0.001, total_capacity=100_000)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "marker", F.concat_ws("|", F.col("event_id"), F.col("props"))
    )
    cache = SketchCache(params)
    cache.insert_batch(ev, ts_col="ts", marker_col="marker")

    t0 = 1_704_067_200
    probe = (
        ev.select("marker").limit(300)
        .withColumn("q_start", F.lit(t0))
        .withColumn("q_end", F.lit(t0 + 10 * DAY - 1))
    )
    joined = cache.lookup_range_join(spark, probe, "marker", "q_start", "q_end")
    got = {r["marker"]: r["found"] for r in joined.collect()}
    probes = [m.encode() for m in got]
    want = cache.lookup_from(t0, t0 + 10 * DAY - 1, probes)
    for m, w in zip(got, want):
        assert got[m] == bool(w), f"range-join vs driver mismatch for {m}"
