"""Bucketed-vs-plain band-index join probe (r10): pin the
`jobs/incremental_dedup.py --bucketed` claim with MEASURED exchange
bytes, not an assertion.

The daily-crawl join keys every batch on (band_id, band_hash).  With a
plain parquet index the sort-merge join re-shuffles the ENTIRE
ever-growing index side every batch; stored bucketed on the join keys
the index scan already satisfies the join's distribution and only the
day's small increment moves.  On one box wall-time barely cares (local
shuffles are memcpys — the table_profile lesson); the bytes crossing
the exchange are the cluster argument, so this probe runs the SAME
increment join against both storages and records each leg's shuffle
write+read deltas from Spark's status REST (exact, deterministic).

Broadcast is disabled to expose the sort-merge regime — the regime a
large increment (or a broadcast-threshold-exceeding batch) actually
hits; small batches take the broadcast path where NEITHER storage
shuffles the index (plan-asserted in tests/test_incremental_dedup.py).

Usage: python BENCH/bucketed_index_probe.py [index_rows] [new_rows] [cpus]
       (defaults 4000000, 20000, 8; one JSON line per leg)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _load1, _steal_pct, _steal_ticks  # noqa: E402
from BENCH.profile_scale_probe import build_probe_session, shuffle_totals  # noqa: E402

TABLE = "probe_band_index"
N_BUCKETS = 16
BANDS = 32


def main() -> None:
    n_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cpus = sys.argv[3] if len(sys.argv) > 3 else "8"

    from pyspark.sql import functions as F

    from marker_spark.ops.dedup import incremental_pairs_from_bands

    spark = build_probe_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # expose the sort-merge regime: a large increment does not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    tmp = tempfile.mkdtemp(prefix="bucketed_probe_")
    plain_path = os.path.join(tmp, "plain")
    bucketed_loc = os.path.join(tmp, "bucketed")

    # avg bucket ~8 index rows: band_hash cardinality n/(BANDS*8) per band
    n_hashes = max(n_idx // (BANDS * 8), 1)
    idx = spark.range(n_idx).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % BANDS).cast("int").alias("band_id"),
        ((F.col("id") / BANDS).cast("long") % n_hashes).alias("band_hash"),
    )
    idx.write.mode("overwrite").parquet(plain_path)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    spark.sql(
        f"CREATE TABLE {TABLE} (doc_id BIGINT, band_id INT, band_hash BIGINT) "
        f"USING parquet CLUSTERED BY (band_id, band_hash) "
        f"SORTED BY (band_id, band_hash) INTO {N_BUCKETS} BUCKETS "
        f"LOCATION '{bucketed_loc}'"
    )
    spark.read.parquet(plain_path).write.mode("append").insertInto(TABLE)

    new = spark.range(n_new).select(
        (F.col("id") + 1_000_000_000).alias("doc_id"),
        (F.col("id") % BANDS).cast("int").alias("band_id"),
        ((F.col("id") / BANDS).cast("long") % n_hashes).alias("band_hash"),
    ).persist()
    new.count()

    def leg(storage: str):
        index = (
            spark.read.parquet(plain_path)
            if storage == "plain"
            else spark.read.table(TABLE)
        )
        w0, r0 = shuffle_totals()
        s0, l0 = _steal_ticks(), _load1()
        t0 = time.monotonic()
        pairs = incremental_pairs_from_bands(index, new, max_bucket=None)
        n_pairs = pairs.count()
        wall = time.monotonic() - t0
        w1, r1 = shuffle_totals()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        print(json.dumps({
            "storage": storage,
            "index_rows": n_idx,
            "new_rows": n_new,
            "cpus": int(cpus),
            "n_pairs": n_pairs,
            "wall_s": round(wall, 2),
            "shuffle_write_bytes": w1 - w0,
            "shuffle_read_bytes": r1 - r0,
            "bucketed_scan": "Bucketed: true" in plan,
            "steal_pct": _steal_pct(s0, _steal_ticks()),
            "load1": l0,
        }), flush=True)

    # plain first, then bucketed (same increment, same session)
    leg("plain")
    leg("bucketed")
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
