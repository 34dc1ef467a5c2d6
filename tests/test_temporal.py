"""Temporal operators vs brute-force references: the union+window
as-of join and gaps-and-islands sessionization must agree exactly with
naive per-key Python implementations, including the edge semantics
(inclusive <= at equal timestamps, no-match probes, single-event
sessions)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

EPOCH = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return EPOCH + dt.timedelta(minutes=minutes)


def test_asof_join_matches_bruteforce(spark):
    from marker_spark.ops.temporal import asof_join

    # key 1: interleaved; key 2: probe before any ref (no match);
    # key 3: ref and probe at the IDENTICAL timestamp (inclusive <=)
    refs = [
        (1, _ts(0), 10.0), (1, _ts(10), 11.0), (1, _ts(30), 12.0),
        (2, _ts(50), 20.0),
        (3, _ts(5), 30.0),
    ]
    probes = [
        (1, 100, _ts(5)), (1, 101, _ts(10)), (1, 102, _ts(99)),
        (2, 200, _ts(1)), (2, 201, _ts(50)),
        (3, 300, _ts(5)),
    ]
    rdf = spark.createDataFrame(refs, "user_id int, ts timestamp, value double")
    pdf = spark.createDataFrame(probes, "user_id int, event_id int, ts timestamp")
    got = {
        r["event_id"]: (r["value_asof"], r["ts_asof"])
        for r in asof_join(pdf, rdf, "user_id", "ts", ["value"]).collect()
    }

    def brute(k, t):
        cand = [(ts, v) for (kk, ts, v) in refs if kk == k and ts <= t]
        return max(cand) if cand else None

    for k, eid, t in probes:
        want = brute(k, t)
        if want is None:
            assert got[eid] == (None, None), (eid, got[eid])
        else:
            assert got[eid] == (want[1], want[0]), (eid, got[eid], want)
    # the equal-ts probe must see the ref at its own timestamp
    assert got[300] == (30.0, _ts(5))
    # the at-ref-ts probe must prefer the equal-ts ref over the earlier one
    assert got[101] == (11.0, _ts(10))


def test_sessionize_matches_bruteforce(spark):
    from marker_spark.ops.temporal import sessionize

    rows = [
        # user 1: [0, 5, 20] | gap 40 | [60, 61] — two sessions (gap 30m)
        (1, _ts(0)), (1, _ts(5)), (1, _ts(20)), (1, _ts(60)), (1, _ts(61)),
        # user 2: single event — one 1-event session of duration 0
        (2, _ts(100)),
        # user 3: every event its own session
        (3, _ts(0)), (3, _ts(31)), (3, _ts(62)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        (r["user_id"], r["session"]): (r["n_events"], r["start_us"], r["end_us"], r["duration_us"])
        for r in sessionize(df, "user_id", "ts", gap_s=1800).collect()
    }

    def us(t):
        return int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)

    assert got[(1, 1)] == (3, us(_ts(0)), us(_ts(20)), 20 * 60_000_000)
    assert got[(1, 2)] == (2, us(_ts(60)), us(_ts(61)), 60_000_000)
    assert got[(2, 1)] == (1, us(_ts(100)), us(_ts(100)), 0)
    assert {(u, s) for (u, s) in got if u == 3} == {(3, 1), (3, 2), (3, 3)}
    # exactly-at-gap boundary (31 > 30 min) starts a new session; a gap
    # of exactly 1800s would NOT (strictly-greater contract)
    df2 = spark.createDataFrame([(9, _ts(0)), (9, _ts(30))], "user_id int, ts timestamp")
    got2 = sessionize(df2, "user_id", "ts", gap_s=1800).collect()
    assert len(got2) == 1 and got2[0]["n_events"] == 2


def test_interval_join_matches_bruteforce(spark):
    from marker_spark.ops.temporal import interval_join

    US = 1_000_000
    B = 10  # seconds per bucket
    intervals = [
        # (iv_id, key, start_us, end_us): spanning multiple buckets, zero-length,
        # bucket-boundary-aligned, and overlapping intervals
        (1, 1, 5 * US, 35 * US),
        (2, 1, 20 * US, 20 * US),
        (3, 1, 30 * US, 40 * US),
        (4, 2, 0 * US, 9 * US),
    ]
    points = [
        (100, 1, 5 * US), (101, 1, 20 * US), (102, 1, 36 * US),
        (103, 1, 41 * US), (104, 2, 9 * US), (105, 2, 10 * US),
    ]
    iv = spark.createDataFrame(
        intervals, "iv_id int, user_id int, start_us long, end_us long"
    )
    pt = spark.createDataFrame(points, "event_id int, user_id int, ts_us long")
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(
            pt, iv, "ts_us", "start_us", "end_us", bucket_s=B, key_col="user_id"
        ).collect()
    }
    want = {
        (eid, ivid)
        for (eid, pk, t) in points
        for (ivid, ik, s, e) in intervals
        if pk == ik and s <= t <= e
    }
    assert got == want
    assert (101, 1) in got and (101, 2) in got  # overlapping intervals both hit
    assert (103, 1) not in got  # past the end


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _event_sets(draw):
    # NULL is a real key: both the unsalted window plan and the sliced
    # salt must treat it as its own group (the r6 null-unsafe stitch
    # joins silently dropped it — keep it in the generated region)
    keys: list[int | None] = list(range(draw(st.integers(1, 3))))
    if draw(st.booleans()):
        keys.append(None)
    mk = lambda: sorted(  # noqa: E731
        draw(st.lists(st.integers(0, 5000), min_size=0, max_size=12))
    )
    refs, probes = [], []
    next_id = 0
    for k in keys:
        # unique ref timestamps per key: with duplicates the carried
        # value is unspecified (any implementation may pick either)
        for i, m in enumerate(sorted(set(mk()))):
            refs.append((k, m, float((900 if k is None else k * 100) + i)))
        for m in mk():
            probes.append((k, next_id, m))
            next_id += 1
    return refs, probes


@settings(max_examples=10, deadline=None)
@given(_event_sets())
def test_asof_join_property(spark, data):
    """Randomized as-of parity vs brute force, including duplicate
    probe timestamps and ref/probe timestamp collisions."""
    from marker_spark.ops.temporal import asof_join

    refs, probes = data
    if not probes:
        return
    rdf = spark.createDataFrame(
        [(k, _ts(m), v) for (k, m, v) in refs] or [(99, _ts(0), 0.0)],
        "user_id int, ts timestamp, value double",
    )
    pdf = spark.createDataFrame(
        [(k, pid, _ts(m)) for (k, pid, m) in probes],
        "user_id int, event_id int, ts timestamp",
    )
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(pdf, rdf, "user_id", "ts", ["value"]).collect()
    }
    for k, pid, m in probes:
        cand = [(mm, v) for (kk, mm, v) in refs if kk == k and mm <= m]
        want = max(cand)[1] if cand else None
        assert got[pid] == want, (pid, got[pid], want)


def test_asof_join_forward_matches_bruteforce(spark):
    from marker_spark.ops.temporal import asof_join

    refs = [(1, _ts(0), 10.0), (1, _ts(20), 11.0), (2, _ts(5), 20.0)]
    probes = [(1, 100, _ts(0)), (1, 101, _ts(10)), (1, 102, _ts(25)), (2, 200, _ts(5))]
    rdf = spark.createDataFrame(refs, "user_id int, ts timestamp, value double")
    pdf = spark.createDataFrame(probes, "user_id int, event_id int, ts timestamp")
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(
            pdf, rdf, "user_id", "ts", ["value"], direction="forward"
        ).collect()
    }
    assert got == {100: 10.0, 101: 11.0, 102: None, 200: 20.0}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 12)),
             min_size=0, max_size=12),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 60)),
             min_size=1, max_size=12),
)
def test_interval_join_property(spark, iv_rows, pt_rows):
    """Randomized containment parity vs brute force at a bucket size
    unrelated to the interval lengths."""
    from marker_spark.ops.temporal import interval_join

    US = 1_000_000
    intervals = [
        (i, k, s * US, (s + ln) * US) for i, (k, s, ln) in enumerate(iv_rows)
    ]
    points = [(j, k, t * US) for j, (k, t) in enumerate(pt_rows)]
    if not intervals:
        return
    iv = spark.createDataFrame(
        intervals, "iv_id int, user_id int, start_us long, end_us long"
    )
    pt = spark.createDataFrame(points, "event_id int, user_id int, ts_us long")
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(
            pt, iv, "ts_us", "start_us", "end_us", bucket_s=7, key_col="user_id"
        ).collect()
    }
    want = {
        (eid, ivid)
        for (eid, pk, t) in points
        for (ivid, ik, s, e) in intervals
        if pk == ik and s <= t <= e
    }
    assert got == want


def test_asof_join_carries_reference_rows_atomically(spark):
    """Review-reproduced bug: carrying each output column independently
    with last(ignorenulls) back-filled a NULL ref VALUE from an older
    ref row while taking the newer row's timestamp — columns from two
    different reference rows in one match.  The matched row must be
    all-or-nothing."""
    from marker_spark.ops.temporal import asof_join

    refs = [(1, _ts(0), 5.0), (1, _ts(2), None)]
    probes = [(1, 100, _ts(3))]
    rdf = spark.createDataFrame(refs, "user_id int, ts timestamp, value double")
    pdf = spark.createDataFrame(probes, "user_id int, event_id int, ts timestamp")
    row = asof_join(pdf, rdf, "user_id", "ts", ["value"]).collect()[0]
    # nearest ref is the ts=2 row whose value is NULL: value stays NULL
    # and the timestamp is that row's — never 5.0 from the ts=0 row
    assert row["ts_asof"] == _ts(2)
    assert row["value_asof"] is None
    # NULL-ts refs never match; NULL-ts probes never match
    refs2 = [(1, None, 9.0)]
    rdf2 = spark.createDataFrame(refs2, "user_id int, ts timestamp, value double")
    row2 = asof_join(pdf, rdf2, "user_id", "ts", ["value"]).collect()[0]
    assert row2["value_asof"] is None and row2["ts_asof"] is None
    pdf2 = spark.createDataFrame([(1, 101, None)], "user_id int, event_id int, ts timestamp")
    row3 = asof_join(pdf2, rdf, "user_id", "ts", ["value"]).collect()[0]
    assert row3["value_asof"] is None and row3["ts_asof"] is None


@settings(max_examples=6, deadline=None)
@given(_event_sets())
def test_asof_join_sliced_matches_unsalted(spark, data):
    """The slice_s hot-key salt must be a pure plan change: for both
    directions, salted output == unsalted output on randomized events
    whose timestamps straddle many slice boundaries (slice 120 s vs
    minute-scale events), including NULL-ts probes and empty slices."""
    from marker_spark.ops.temporal import asof_join

    refs, probes = data
    if not probes:
        return
    rdf = spark.createDataFrame(
        [(k, _ts(m), v) for (k, m, v) in refs] or [(99, _ts(0), 0.0)],
        "user_id int, ts timestamp, value double",
    )
    rows = [(k, pid, _ts(m)) for (k, pid, m) in probes]
    rows.append((1, 10_000, None))  # NULL-ts probe must survive the salt path
    pdf = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    for direction in ("backward", "forward"):
        base = {
            r["event_id"]: (r["value_asof"], r["ts_asof"])
            for r in asof_join(pdf, rdf, "user_id", "ts", ["value"],
                               direction=direction).collect()
        }
        sliced = {
            r["event_id"]: (r["value_asof"], r["ts_asof"])
            for r in asof_join(pdf, rdf, "user_id", "ts", ["value"],
                               direction=direction, slice_s=120).collect()
        }
        assert base == sliced, (direction,
                                {k: (base[k], sliced[k])
                                 for k in base if base[k] != sliced.get(k)})


def test_sliced_plans_keep_null_keys(spark):
    """Deterministic pin of the r6 review repro: NULL is a real group
    in the unsalted plans, and every stitch join in the sliced plans
    must be null-safe on the key.  (a) asof_join: a NULL-key probe in a
    LATER slice than the only NULL-key reference must still match
    cross-slice.  (b) sessionize: NULL-key events must emit the same
    sessions salted as unsalted."""
    from marker_spark.ops.temporal import asof_join, sessionize

    # (a) ref at t=0 (slice 0), probe at t=5min (slice 2 at 120 s)
    rdf = spark.createDataFrame(
        [(None, _ts(0), 1.0)], "user_id int, ts timestamp, value double"
    )
    pdf = spark.createDataFrame(
        [(None, 100, _ts(5))], "user_id int, event_id int, ts timestamp"
    )
    for direction in ("backward", "forward"):
        p = pdf if direction == "backward" else spark.createDataFrame(
            [(None, 100, _ts(-5))], "user_id int, event_id int, ts timestamp"
        )
        for kw in ({}, {"slice_s": 120}):
            row = asof_join(
                p, rdf, "user_id", "ts", ["value"], direction=direction, **kw
            ).collect()[0]
            assert (row["value_asof"], row["ts_asof"]) == (1.0, _ts(0)), (
                direction, kw, row,
            )
    # (b) two NULL-key sessions (gap 40 min > 30), straddling slices
    sdf = spark.createDataFrame(
        [(None, _ts(0)), (None, _ts(5)), (None, _ts(45)), (None, _ts(46))],
        "user_id int, ts timestamp",
    )

    def sess(**kw):
        return {
            (r["user_id"], r["session"]): (r["n_events"], r["start_us"], r["end_us"])
            for r in sessionize(sdf, "user_id", "ts", gap_s=1800, **kw).collect()
        }

    base = sess()
    assert len(base) == 2 and all(k is None for (k, _) in base)
    assert sess(slice_s=600) == base


def test_asof_join_sliced_splits_hot_keys_in_plan(spark):
    """The point of slice_s: the window exchange must partition on
    (key, slice), not key alone — one bot user must not become one
    straggling sort partition."""
    import re

    from marker_spark.ops.temporal import asof_join

    rdf = spark.createDataFrame(
        [(1, _ts(i), float(i)) for i in range(8)],
        "user_id int, ts timestamp, value double",
    )
    pdf = spark.createDataFrame(
        [(1, i, _ts(i)) for i in range(8)],
        "user_id int, event_id int, ts timestamp",
    )
    df = asof_join(pdf, rdf, "user_id", "ts", ["value"], slice_s=60)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    specs = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("__slice" in s and "user_id" in s for s in specs), specs


def test_interval_join_rejects_shared_nonkey_columns(spark):
    """A non-key column present on both sides would only surface as an
    ambiguous-column error at a later select, far from the cause — the
    join must raise up front (mirrors asof_join's collision guard)."""
    import pytest

    from marker_spark.ops.temporal import interval_join

    pts = spark.createDataFrame([(1, 0, "x")], "k int, ts bigint, tag string")
    ivs = spark.createDataFrame(
        [(1, 0, 10, "y")], "k int, s bigint, e bigint, tag string"
    )
    with pytest.raises(ValueError, match="tag"):
        interval_join(pts, ivs, "ts", "s", "e", bucket_s=1, key_col="k")


def test_asof_join_dedup_ref_ts_matches_default_on_ties(spark):
    """dedup_ref_ts=True pre-aggregates duplicate (key, ts) reference
    rows with the SAME max-struct rule the window tiebreak applies, so
    both paths must return identical matches — and the winner among an
    equal-ts pair is the row with the larger value struct."""
    from marker_spark.ops.temporal import asof_join

    refs = [
        (1, _ts(0), 1.0), (1, _ts(10), 7.0), (1, _ts(10), 3.0),  # tie at 10
        (2, _ts(5), None), (2, _ts(5), 4.0),                     # NULL vs 4.0
    ]
    probes = [(1, 100, _ts(11)), (2, 200, _ts(6))]
    rdf = spark.createDataFrame(refs, "user_id int, ts timestamp, value double")
    pdf = spark.createDataFrame(probes, "user_id int, event_id int, ts timestamp")
    for direction in ("backward", "forward"):
        p = pdf if direction == "backward" else spark.createDataFrame(
            [(1, 100, _ts(9)), (2, 200, _ts(4))],
            "user_id int, event_id int, ts timestamp",
        )
        base = {
            r["event_id"]: (r["value_asof"], r["ts_asof"])
            for r in asof_join(p, rdf, "user_id", "ts", ["value"],
                               direction=direction).collect()
        }
        dedup = {
            r["event_id"]: (r["value_asof"], r["ts_asof"])
            for r in asof_join(p, rdf, "user_id", "ts", ["value"],
                               direction=direction, dedup_ref_ts=True).collect()
        }
        assert base == dedup, (direction, base, dedup)
        # max-struct rule: 7.0 beats 3.0; 4.0 beats NULL (nulls sort first)
        assert base[100] == (7.0, _ts(10)), (direction, base)
        assert base[200] == (4.0, _ts(5)), (direction, base)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 2000)),
                min_size=1, max_size=24))
def test_sessionize_sliced_matches_unsalted(spark, rows):
    """The slice_s hot-key salt must be a pure plan change: salted
    sessionization (slice 600 s vs minute-scale events spanning many
    slices, gap 300 s) returns the identical session table, including
    duplicate timestamps, cross-boundary session merges, NULL-ts
    events (which fold into the key's first session, nulls-first), and
    NULL-KEY events — a real group in the unsalted window plan that a
    null-unsafe stitch join silently drops (review finding r6); the
    fixed NULL-key rows span slices 1500 s apart so the cross-slice
    stitch itself runs for the NULL key."""
    from marker_spark.ops.temporal import sessionize

    data = [(k, _ts(m)) for (k, m) in rows] + [
        (0, None), (1, None),
        (None, _ts(2)), (None, _ts(3)), (None, _ts(9)), (None, _ts(11)),
        (None, _ts(28)), (None, None),
    ]
    df = spark.createDataFrame(data, "user_id int, ts timestamp")

    def run(**kw):
        return {
            (r["user_id"], r["session"]):
                (r["n_events"], r["start_us"], r["end_us"], r["duration_us"])
            for r in sessionize(df, "user_id", "ts", gap_s=300, **kw).collect()
        }

    base = run()
    sliced = run(slice_s=600)
    assert base == sliced, {k: (base.get(k), sliced.get(k))
                            for k in set(base) | set(sliced)
                            if base.get(k) != sliced.get(k)}


def test_sessionize_sliced_splits_hot_keys_in_plan(spark):
    """With slice_s, the per-event window exchanges must partition on
    (key, slice) — the whole point of the salt."""
    import re

    from marker_spark.ops.temporal import sessionize

    df = spark.createDataFrame(
        [(1, _ts(i)) for i in range(50)], "user_id int, ts timestamp"
    )
    out = sessionize(df, "user_id", "ts", gap_s=300, slice_s=600)
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    specs = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("__slice" in s and "user_id" in s for s in specs), specs


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 2000)),
                min_size=1, max_size=20))
def test_sessionize_property(spark, rows):
    """Randomized session parity vs a per-key Python scan (gap 300 s),
    including duplicate timestamps within a key (zero gap: same
    session under the strictly-greater rule)."""
    from marker_spark.ops.temporal import sessionize

    df = spark.createDataFrame(
        [(k, _ts(m)) for (k, m) in rows], "user_id int, ts timestamp"
    )
    got = {
        (r["user_id"], r["session"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(df, "user_id", "ts", gap_s=300).collect()
    }

    def us(m):
        return int((_ts(m) - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)

    want = {}
    for k in {k for k, _ in rows}:
        ms = sorted(m for kk, m in rows if kk == k)
        sess, start, prev, n = 1, ms[0], ms[0], 0
        for m in ms:
            if (m - prev) * 60 > 300:  # minutes -> seconds vs gap
                want[(k, sess)] = (n, us(start), us(prev))
                sess, start, n = sess + 1, m, 0
            n += 1
            prev = m
        want[(k, sess)] = (n, us(start), us(prev))
    assert got == want
