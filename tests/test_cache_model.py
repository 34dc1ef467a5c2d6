"""Model-based property test: SketchCache vs an exact-set model.

Hypothesis drives random op sequences (insert markers at timestamps /
force-age / timerange lookups) against both the real cache and a naive
exact model.  Invariants (the reference's contract):

 * no false negatives: any marker the exact model says is visible in a
   queried range must be found (DBAppUnitTests.cpp:97-106 generalized);
 * guard behavior: inverted ranges and pre-history ranges return
   nothing (markercache.cpp:164-166);
 * ageing: markers whose bucket was evicted may be forgotten, never
   resurrected into ranges they were not in.

Sketches are built locally (no Spark) via the same BloomSketch kernels
the Spark path uses; the Spark build path's equivalence to local builds
is covered separately (tests/test_agg_spark.py).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from marker_spark.cache.sketch_cache import OPEN_END, SketchCache
from marker_spark.params import CacheParams

DUR = 100
PARAMS = CacheParams(duration=DUR, lifespan=300, fp=0.001, total_capacity=50_000)
T0 = 10_000


def _local_insert(cache: SketchCache, ts: int, markers: list[bytes]) -> None:
    """Driver-side equivalent of insert_batch for one timestamp."""
    from marker_spark.sketches.bloom import BloomSketch

    bp = PARAMS.bloom_params()
    sk = BloomSketch(bp.m, bp.k)
    sk.insert(markers)
    cache._merge_into_bucket(cache.bucket_start_for(ts), sk, 0.0, "model")


op_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), st.integers(0, 12), st.integers(0, 999)),
        st.tuples(st.just("age"), st.integers(1, 12), st.just(0)),
        st.tuples(st.just("lookup"), st.integers(-2, 14), st.integers(-2, 14)),
    ),
    min_size=5,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(ops=op_strategy)
def test_cache_vs_exact_model(ops):
    cache = SketchCache(PARAMS)
    # model: marker -> set of bucket_starts it was inserted into
    model: dict[bytes, set[int]] = {}
    live_buckets: set[int] = set()
    now = T0

    for kind, a, b in ops:
        if kind == "insert":
            ts = T0 + a * DUR + 13
            marker = f"m-{a}-{b}".encode()
            _local_insert(cache, ts, [marker])
            bstart = (ts // DUR) * DUR
            model.setdefault(marker, set()).add(bstart)
            live_buckets.add(bstart)
            now = max(now, ts)
        elif kind == "age":
            now += a * DUR
            before = {bk.start for bk in cache.buckets}
            cache.maybe_age(now, force=True)
            after = {bk.start for bk in cache.buckets}
            evicted = before - after
            live_buckets -= evicted
        else:  # lookup
            lo = T0 + a * DUR
            hi = T0 + b * DUR
            markers = sorted(model)
            if not markers:
                continue
            found = cache.lookup_from(lo, hi, markers)
            for m, f in zip(markers, found):
                # visible = inserted into a still-live bucket overlapping [lo, hi]
                visible = any(
                    bs in live_buckets and bs <= hi and lo <= bs + DUR - 1
                    for bs in model[m]
                )
                if lo > hi:
                    assert not f, "inverted range must return false"
                elif visible:
                    assert f, f"false negative for {m!r} in [{lo},{hi}]"
                # false positives are allowed (bounded by fp), so no
                # assertion on not-visible markers beyond the guards.

    # final guard: range before all history
    if cache.buckets:
        markers = sorted(model)
        if markers:
            pre = cache.lookup_from(0, cache.buckets[0].start - 1, markers)
            assert not pre.any(), "pre-history lookup must be empty"
