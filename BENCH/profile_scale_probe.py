"""table_profile melt-heavy scale probe (verdict r8 #6): pin the
"O(k) sketch bytes vs O(distinct) rows across the exchange" argument
with MEASURED bytes, not an assertion.

Round 8 measured the sketch profiler LOSING 2.5x to a naive exact
profile on one box (local shuffles are memcpys).  The profiler's whole
case is what crosses the exchange on a real cluster network — so this
probe runs BOTH plans at a melt-heavy scale (default 32M rows, ~3/4 of
the melted values distinct) and records each plan's total shuffle
write/read bytes from Spark's own status REST (exact, deterministic)
next to its wall time + steal.

Expected shape (and the claim the artifact carries): the naive plan's
exchange traffic grows O(distinct values) — every (value, count) row of
every column's groupBy crosses the shuffle — while the profiler's
exchange traffic is O(columns × partitions × sketch_bytes), flat in the
distinct count.  On one box wall-time still favors naive; the bytes gap
is the cluster argument.

Usage:  python BENCH/profile_scale_probe.py [n_rows] [cpus_list] [trials]
        (defaults 32000000, "2,8", 2; one JSON line per leg)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _load1, _steal_pct, _steal_ticks  # noqa: E402

_UI_PORT = 4047


def build_probe_session(cpus: str):
    """bench.build_session shape, but with the UI enabled so the status
    REST can report per-stage shuffle bytes (the probe's whole point)."""
    from pyspark.sql import SparkSession

    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 * 1024 * 1024))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(256 * 1024 * 1024))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("marker-profile-probe")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(_UI_PORT))
        .getOrCreate()
    )


def shuffle_totals() -> tuple[int, int]:
    """(write_bytes, read_bytes) summed over every stage so far — read
    deltas around a leg; exact and window-independent."""
    base = f"http://localhost:{_UI_PORT}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages"))
    return (
        sum(st.get("shuffleWriteBytes", 0) for st in stages),
        sum(st.get("shuffleReadBytes", 0) for st in stages),
    )


def _table_parquet(n_rows: int) -> str:
    """3-column synthetic with a melt-heavy distinct profile:
    uid n/2 distinct, category 1000 distinct (zipf-ish head so MG has
    real heavy hitters), score n/4 distinct — ~0.75*n distinct melted
    values total.  Deterministic index arithmetic, no RNG."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"/tmp/marker_profile_probe_{n_rows}.parquet"
    if os.path.exists(path):
        return path
    tmp = f"{path}.tmp-{os.getpid()}"
    writer = None
    chunk = 4_000_000
    for lo in range(0, n_rows, chunk):
        hi = min(lo + chunk, n_rows)
        i = np.arange(lo, hi, dtype=np.int64)
        uid = i // 2
        # head: 30% of rows in 3 hot categories, tail uniform over 1000
        cat_id = np.where(i % 10 < 3, i % 3, i % 1000)
        category = np.char.add("cat", cat_id.astype("U4"))
        score = ((i * 37) % (n_rows // 4)).astype(np.float64) / 7.0
        tbl = pa.table({
            "uid": uid,
            "category": pa.array(category.tolist(), type=pa.string()),
            "score": score,
        })
        if writer is None:
            writer = pq.ParquetWriter(tmp, tbl.schema)
        writer.write_table(tbl, row_group_size=262_144)
    writer.close()
    os.replace(tmp, path)
    return path


def naive_exact_profile(df) -> None:
    """The plan a user would write without sketches: one scalar agg for
    the exact stats, then PER COLUMN a full-value groupBy for top-5 and
    a countDistinct — every (value, count) row crosses the exchange.
    (Separate aggs on purpose: countDistinct alongside count(*) plans
    an EXPAND that doubles input rows — the r4 lesson — and the naive
    baseline should be the BEST naive plan, not a strawman.)"""
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1))]
    for c, num in (("uid", True), ("category", False), ("score", True)):
        aggs.append(F.count(F.col(c)))
        aggs.append(F.min(F.col(c)))
        aggs.append(F.max(F.col(c)))
        if num:
            aggs.append(F.avg(F.col(c)))
    df.agg(*aggs).collect()
    for c in ("uid", "category", "score"):
        df.select(F.countDistinct(F.col(c).cast("string"))).collect()
        (df.groupBy(c).count().orderBy(F.desc("count"), c).limit(5).collect())


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    cpu_list = (sys.argv[2] if len(sys.argv) > 2 else "2,8").split(",")
    n_trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    path = _table_parquet(n_rows)

    from marker_spark.cacheutil import release_all
    from marker_spark.ops.profile import profile_table

    for cpus in cpu_list:
        spark = build_probe_session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1000).count()  # warm JVM + python workers
        df = spark.read.parquet(path)

        def _leg(fn, variant: str) -> None:
            best = None
            bytes_w = bytes_r = None
            for trial in range(n_trials):
                w0, r0 = shuffle_totals()
                s0 = _steal_ticks()
                load_before = _load1()
                t0 = time.monotonic()
                fn()
                secs = time.monotonic() - t0
                st = _steal_pct(s0, _steal_ticks())
                w1, r1 = shuffle_totals()
                release_all()
                if bytes_w is None:
                    bytes_w, bytes_r = w1 - w0, r1 - r0  # deterministic
                best = secs if best is None else min(best, secs)
                print(json.dumps({
                    "variant": variant, "cpus": int(cpus), "trial": trial,
                    "n_rows": n_rows, "secs": round(secs, 2),
                    "shuffle_write_bytes": w1 - w0,
                    "shuffle_read_bytes": r1 - r0,
                    "steal_pct": None if st is None else round(st, 2),
                    "load1_before": load_before,
                }), flush=True)

        _leg(lambda: (profile_table(df, top_k=5).collect(), None),
             "sketch_profiler")
        _leg(lambda: naive_exact_profile(df), "naive_exact")
        spark.stop()


if __name__ == "__main__":
    main()
