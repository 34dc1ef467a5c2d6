"""compact_band_index maintenance-pass scale probe (r10): the
compaction is a periodic rewrite job — one retention semi-join keyed on
doc_id (the only full-index shuffle), one map-side-combining bucket-size
aggregation, and a broadcast anti-join — so its cost should be linear
in index size with a small constant.  This probe measures wall +
exchange bytes for the full pass (compact + materialize both outputs)
at two index sizes and records the reclaim ratio.

Usage: python BENCH/compaction_scale_probe.py [rows_list] [cpus]
       (defaults "16000000,64000000", 8; one JSON line per point)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _load1, _steal_pct, _steal_ticks  # noqa: E402
from BENCH.profile_scale_probe import build_probe_session, shuffle_totals  # noqa: E402

BANDS = 32


def main() -> None:
    rows_list = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                                  else "16000000,64000000").split(",")]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "8"

    from pyspark.sql import functions as F

    from marker_spark.cacheutil import release_all
    from marker_spark.ops.dedup import compact_band_index

    spark = build_probe_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    for n_idx in rows_list:
        n_docs = n_idx // BANDS
        # ~1/64 of buckets are degenerate (shared hash 0 within a band)
        idx = spark.range(n_idx).select(
            (F.col("id") % n_docs).alias("doc_id"),
            (F.col("id") % BANDS).cast("int").alias("band_id"),
            F.when((F.col("id") / BANDS).cast("long") % 64 == 0, F.lit(0))
            .otherwise((F.col("id") / BANDS).cast("long"))
            .alias("band_hash"),
        ).persist()
        idx.count()
        keep = spark.range(n_docs).where(F.col("id") % 4 != 0).select(
            F.col("id").alias("doc_id")
        )
        w0, r0 = shuffle_totals()
        s0, l0 = _steal_ticks(), _load1()
        t0 = time.monotonic()
        compacted, frozen = compact_band_index(idx, keep, max_bucket=8)
        n_after = compacted.count()
        n_frozen = frozen.count()
        wall = time.monotonic() - t0
        w1, r1 = shuffle_totals()
        print(json.dumps({
            "index_rows": n_idx,
            "cpus": int(cpus),
            "rows_after": n_after,
            "frozen_buckets": n_frozen,
            "wall_s": round(wall, 2),
            "shuffle_write_bytes": w1 - w0,
            "shuffle_read_bytes": r1 - r0,
            "steal_pct": _steal_pct(s0, _steal_ticks()),
            "load1": l0,
        }), flush=True)
        idx.unpersist()
        release_all()
    spark.stop()


if __name__ == "__main__":
    main()
