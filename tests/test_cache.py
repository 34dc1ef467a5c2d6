"""SketchCache semantics tests: ageing, timerange-lookup edge cases,
idempotent save, resume with gap rebuild — mirroring the reference's
Ageing / TimerangeLookups / restore-path tests
(/root/reference/DBAppUnitTests.cpp:127-174, markercache.cpp:50-141)
against the driver's sf0.001 events table.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from marker_spark.cache import CacheConfig  # noqa: F401  (alias check below)
from marker_spark.cache.sketch_cache import OPEN_END, SketchCache
from marker_spark.params import CacheParams

SF_DIR = "/root/testdata/sf0.001"
DAY = 86_400
DUR = 10 * DAY
PARAMS = CacheParams(duration=DUR, lifespan=30 * DAY, fp=0.001, total_capacity=100_000)
T0 = 1_704_067_200  # 2024-01-01 00:00:00 UTC
NOW = T0 + 31 * DAY


@pytest.fixture(scope="module")
def events(spark):
    # props is low-cardinality ({"k": N}); markers must be unique per
    # event for disjointness assertions, so use event_id|props.
    return spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "marker", F.concat_ws("|", F.col("event_id"), F.col("props"))
    )


@pytest.fixture(scope="module")
def props(events):
    return [r["marker"].encode() for r in events.select("marker").collect()]


@pytest.fixture()
def cache(events):
    c = SketchCache(PARAMS)
    c.insert_batch(events, ts_col="ts", marker_col="marker")
    c.open_bucket(NOW)
    return c


def test_num_filters():
    assert PARAMS.num_filters == 4


def test_timerange_lookup(cache, props):
    # Found in [0, max] (DBAppUnitTests.cpp:160-167)
    found = cache.lookup_from(0, OPEN_END, props)
    assert found.all()
    # start > end -> all false (markercache.cpp:164)
    assert not cache.lookup_from(100, 50, props).any()
    # range entirely before history -> all false (markercache.cpp:166).
    # Buckets are epoch-grid-aligned, so "history" starts at the first
    # bucket's grid start, which can precede the first event's ts.
    assert not cache.lookup_from(0, cache.buckets[0].start - 1, props).any()


def test_timerange_partial_window(cache, events):
    # Probe only events from the first bucket; query restricted to the
    # last bucket's window must miss almost all (only Bloom FPs remain).
    first = [
        r["marker"].encode()
        for r in events.filter(F.unix_timestamp("ts") < T0 + DUR).select("marker").collect()
    ]
    last_window = cache.lookup_from(T0 + 2 * DUR, T0 + 3 * DUR - 1, first)
    assert last_window.mean() < 0.05
    first_window = cache.lookup_from(T0, T0 + DUR - 1, first)
    assert first_window.all()


def test_ageing(events, props):
    # Data survives num_filters-1 forced ageing cycles, gone after more
    # (DBAppUnitTests.cpp:127-158).
    c = SketchCache(PARAMS)
    c.insert_batch(events, ts_col="ts", marker_col="marker")
    c.open_bucket(NOW)
    n_data_buckets = sum(1 for b in c.buckets if b.n_markers > 0)
    now = NOW
    for _ in range(PARAMS.num_filters):
        now += DUR
        assert c.maybe_age(now, force=True)
    # All original data buckets evicted by now.
    assert all(b.n_markers == 0 for b in c.buckets)
    assert not c.lookup_from(0, OPEN_END, props[:100]).any()
    # Epoch-aligned grid: 30 days of events straddle 4 ten-day buckets.
    assert n_data_buckets == 4


def test_save_idempotent_and_resume(tmp_path, events, props, spark):
    ckpt = str(tmp_path / "ckpt")
    c = SketchCache(PARAMS, ckpt_dir=ckpt)
    c.insert_batch(events, ts_col="ts", marker_col="marker")
    c.open_bucket(NOW)
    written1 = c.save()
    assert len(written1) == 4  # four sealed data buckets (grid-aligned)
    written2 = c.save()
    assert written2 == []  # idempotent, markercache.cpp:258
    assert os.path.exists(os.path.join(ckpt, "manifest.json"))

    # Resume from checkpoint: restored buckets answer lookups.
    r = SketchCache.resume(PARAMS, ckpt, now=NOW, source_df=events, ts_col="ts", marker_col="marker")
    assert len(r.buckets) <= PARAMS.num_filters
    found = r.lookup_from(0, OPEN_END, props)
    # newest num_filters-1 sealed buckets restored -> events in the
    # oldest (dropped) bucket may miss; events in restored buckets hit.
    # Epochs computed server-side (unix_timestamp) so the check cannot
    # shift with the host timezone.
    restored_lo = r.buckets[0].start
    found_by_marker = dict(zip(props, found))
    rows = events.select(
        F.unix_timestamp("ts").alias("epoch"), "marker"
    ).collect()
    checked = 0
    for row in rows:
        if row["epoch"] >= restored_lo:
            assert found_by_marker[row["marker"].encode()], (
                f"false negative for restored marker at ts={row['epoch']}"
            )
            checked += 1
    assert checked > 0, "no events fell in the restored window"


def test_resume_gap_rebuild(tmp_path, events, spark):
    """Kill/restart with missing buckets: gaps rebuilt from the source
    table (the reference's TODO at markercache.cpp:117-125)."""
    ckpt = str(tmp_path / "ckpt2")
    c = SketchCache(PARAMS, ckpt_dir=ckpt)
    # Only insert the FIRST bucket's data, seal + save it.
    first_df = events.filter(F.unix_timestamp("ts") < T0 + DUR)
    c.insert_batch(first_df, ts_col="ts", marker_col="marker")
    c.open_bucket(NOW)
    c.save()

    # Resume at NOW: every bucket after the newest restored one is a
    # gap -> rebuilt from events.  Probe only markers inside the
    # rebuilt range (markers falling in a restored-but-incomplete
    # bucket are the reference's blind spot too: it trusts restored
    # filters as-is, markercache.cpp:86-93).
    r = SketchCache.resume(PARAMS, ckpt, now=NOW, source_df=events, ts_col="ts", marker_col="marker")
    rebuilt_lo = max(b.start for b in r.buckets if b.source == "rebuild" or b.n_markers > 0)
    gap_lo = min(
        (b.start for b in r.buckets if b.source == "rebuild"), default=rebuilt_lo
    )
    later = [
        r2["marker"].encode()
        for r2 in events.filter(F.unix_timestamp("ts") >= gap_lo).select("marker").collect()
    ]
    assert later, "fixture should have events in the rebuilt range"
    assert r.lookup_from(gap_lo, OPEN_END, later).all(), "gap rebuild lost markers"


def test_metrics_lineage(cache):
    m = cache.metrics()
    assert len(m) == len(cache.buckets)
    data = [x for x in m if x["n_markers"] > 0]
    assert data and all(x["build_secs"] >= 0 for x in data)
    assert all(0 <= x["fill_ratio"] <= 1 for x in m)


def test_probe_during_age_consistency(spark):
    """Reader/writer interleave (the reference's sharable-vs-exclusive
    lock split, markercache.cpp:175-177,223-226, mapped to the
    share-nothing model): probing between ageing steps must keep the
    zero-FN invariant for every still-live bucket, and eviction must
    only ever remove the OLDEST bucket's answers."""
    import pandas as pd

    params = CacheParams(duration=100, lifespan=300, fp=0.001, total_capacity=10_000)
    c = SketchCache(params)

    def batch(tag, ts):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime([ts] * 50, unit="s", utc=True).tz_localize(None),
             "marker": [f"{tag}-{i}" for i in range(50)]}
        )
        return spark.createDataFrame(pdf)

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    probes = {tag: [f"{tag}-{i}".encode() for i in range(50)] for tag in "abcd"}
    for i, tag in enumerate("abcd"):
        c.insert_batch(batch(tag, 1000 + i * 100), ts_col="ts", marker_col="marker")
        # reader probes between writer steps: everything inserted so far
        # must be found over all-time (zero FN survives interleaving)
        for seen in "abcd"[: i + 1]:
            assert c.lookup_from(0, OPEN_END, probes[seen]).all(), (tag, seen)
    # writer ages far past the last bucket: num_filters = lifespan/duration
    # + 1 = 4, so rotation evicts the oldest bucket(s)
    n_before = len(c.buckets)
    assert c.maybe_age(2000)
    # reader again: still-live buckets keep answering with zero FN
    live_lo = c.buckets[0].start
    for tag, base in zip("abcd", range(1000, 1400, 100)):
        want_live = base >= live_lo
        hits = c.lookup_from(0, OPEN_END, probes[tag])
        if want_live:
            assert hits.all(), tag
        else:
            # evicted bucket: only FPs remain (bounded well below all-hit)
            assert hits.mean() < 0.5, tag
    assert len(c.buckets) <= max(n_before, params.num_filters)


def _tiny_events(spark, rows):
    """rows: list of (epoch_secs, marker)."""
    df = spark.createDataFrame(rows, schema="secs long, marker string")
    return df.withColumn("ts", F.col("secs").cast("timestamp")).drop("secs")


def test_rotation_stays_on_grid_no_false_negatives(spark):
    """Seals must cut on grid-slot boundaries: events arriving for the
    new slot after a rotation must land in a bucket whose time range
    covers them (r3 review scenario: seal-at-now swallowed the next
    slot's start second and produced lookup false negatives)."""
    from marker_spark.params import CacheParams

    p = CacheParams(duration=100, lifespan=300, fp=0.001, total_capacity=10_000)
    c = SketchCache(p)
    c.open_bucket(0)
    assert c.maybe_age(100)  # rotate exactly when the first slot elapses
    assert c.buckets[-2].end == 99 and c.buckets[-1].start == 100
    c.insert_batch(_tiny_events(spark, [(150, "mk")]), ts_col="ts", marker_col="marker")
    assert c.lookup_from(150, 150, [b"mk"]).all(), "event after rotation lost"

    # late ageing seals ALL elapsed slots, still on the grid
    c2 = SketchCache(p)
    c2.open_bucket(0)
    assert c2.maybe_age(250)
    assert c2.buckets[-2].end == 199 and c2.buckets[-1].start == 200
    c2.insert_batch(_tiny_events(spark, [(150, "mk2")]), ts_col="ts", marker_col="marker")
    assert c2.lookup_from(150, 150, [b"mk2"]).all()

    # forced early ageing seals the whole current slot
    c3 = SketchCache(p)
    c3.open_bucket(0)
    assert c3.maybe_age(50, force=True)
    assert c3.buckets[-2].end == 99
    c3.insert_batch(_tiny_events(spark, [(70, "mk3")]), ts_col="ts", marker_col="marker")
    assert c3.lookup_from(70, 70, [b"mk3"]).all()


def test_resume_restores_true_bucket_ends(tmp_path, spark):
    """A late-aged bucket spans several slots; resume must restore its
    TRUE end from the manifest, not shrink it to one slot."""
    from marker_spark.params import CacheParams

    p = CacheParams(duration=100, lifespan=300, fp=0.001, total_capacity=10_000)
    c = SketchCache(p, ckpt_dir=str(tmp_path / "ck"))
    c.open_bucket(0)
    c.insert_batch(_tiny_events(spark, [(150, "late-slot")]), ts_col="ts", marker_col="marker")
    c.maybe_age(250)  # seals [0, 199]
    sealed_end = c.buckets[0].end
    assert sealed_end == 199
    c.save()
    r = SketchCache.resume(p, str(tmp_path / "ck"), now=260)
    restored = [b for b in r.buckets if b.start == 0]
    assert restored and restored[0].end == sealed_end
    assert r.lookup_from(150, 150, [b"late-slot"]).all()


def test_resume_rebuilds_interior_gap(tmp_path, spark):
    """A missing interior checkpoint file must be rebuilt from the
    source table, not silently left as a hole (r3 review scenario)."""
    import os as _os

    from marker_spark.params import CacheParams

    p = CacheParams(duration=100, lifespan=500, fp=0.001, total_capacity=10_000)
    src = _tiny_events(spark, [(50, "a"), (150, "b"), (250, "c")])
    c = SketchCache(p, ckpt_dir=str(tmp_path / "ck2"))
    c.insert_batch(src, ts_col="ts", marker_col="marker")
    for now in (100, 200, 300):
        c.maybe_age(now, force=True)
    c.save()
    _os.remove(str(tmp_path / "ck2" / "100.sketch"))  # middle bucket lost
    r = SketchCache.resume(p, str(tmp_path / "ck2"), now=310, source_df=src,
                           ts_col="ts", marker_col="marker")
    assert r.lookup_from(150, 150, [b"b"]).all(), "interior gap not rebuilt"
    assert r.lookup_from(50, 50, [b"a"]).all()
    assert r.lookup_from(250, 250, [b"c"]).all()
