"""compact_band_index maintenance-pass scale probe (r10): the
compaction is a periodic rewrite job — one retention semi-join keyed on
doc_id (the only full-index shuffle), one map-side-combining bucket-size
aggregation, and a broadcast anti-join — so its cost should be linear
in index size with a small constant.  This probe measures wall +
exchange bytes for the full pass (compact + materialize both outputs)
at two index sizes and records the reclaim ratio.

Usage: python BENCH/compaction_scale_probe.py [rows_list] [cpus] [arms]
       (defaults "16000000,64000000", 8, "none,0.01"; one JSON line per
       point per arm)

r11: each point now runs per retention ARM — "none" is the plain
semi-join (the r10 measurement), a float is compact_band_index's
``prefilter_fp`` (drop-list Bloom pre-filter, exchange O(dropped + thin
id columns) instead of the full-index doc_id shuffle).  The synthetic
also moved to the REAL band-table layout: ``lsh_band_table`` explodes
per doc, so a doc's BANDS rows are adjacent in the store (doc_id =
id // BANDS), which is what makes the thin distinct-id pass collapse
map-side.  Both arms run on the same layout, same 25% drop fraction as
r10.
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
    arms = [None if a == "none" else float(a)
            for a in (sys.argv[3] if len(sys.argv) > 3 else "none,0.01").split(",")]
    # 5th arg: foreign-id multiplier for the keep list — 0 reproduces
    # the r10 shape (keep (subset of) index docs); N > 0 unions N x n_docs
    # FOREIGN ids (the realistic maintenance call: keep = the whole
    # corpus retention list, the index covers one shard), which pushes
    # keep past any broadcast threshold
    foreign_mult = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from pyspark.sql import functions as F

    from marker_spark.cacheutil import release_all
    from marker_spark.ops.dedup import compact_band_index

    spark = build_probe_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    for n_idx in rows_list:
        n_docs = n_idx // BANDS
        # real band-table layout: a doc's BANDS rows adjacent; docs
        # == 1 mod 64 share band_hash 0 -> degenerate buckets (1 mod 64
        # survives the retention rule below, so the freeze path fires).
        # doc ids are xxhash64-mixed: REAL ids are digests (high
        # entropy), which is what pushes a real keep list past the
        # broadcast threshold — monotone range ids delta-encode to
        # nearly nothing in parquet and silently stay broadcast
        doc = (F.col("id") / BANDS).cast("long")
        doc_key = F.xxhash64(doc)
        idx = spark.range(n_idx).select(
            doc_key.alias("doc_id"),
            (F.col("id") % BANDS).cast("int").alias("band_id"),
            F.when(doc % 64 == 1, F.lit(0)).otherwise(doc_key).alias("band_hash"),
        ).persist()
        idx.count()
        # the job's --keep is a PARQUET path: stage through parquet so
        # the retention join sees a file-size estimate (past the
        # broadcast threshold at 64M -> the full-index SMJ the
        # prefilter exists to avoid), not spark.range's exact 8B/row
        keep_path = f"/tmp/compaction_probe_keep_{n_idx}"
        kept = spark.range(n_docs).where(F.col("id") % 4 != 0)
        if foreign_mult:
            kept = kept.unionByName(
                spark.range(n_docs, n_docs * (1 + foreign_mult))
            )
        kept.select(
            F.xxhash64(F.col("id")).alias("doc_id")
        ).write.mode("overwrite").parquet(keep_path)
        keep = spark.read.parquet(keep_path)
        for fp in arms:
            for max_bucket in (None, 8):
                w0, r0 = shuffle_totals()
                s0, l0 = _steal_ticks(), _load1()
                t0 = time.monotonic()
                compacted, frozen = compact_band_index(
                    idx, keep, max_bucket=max_bucket, prefilter_fp=fp
                )
                n_after = compacted.count()
                n_frozen = frozen.count() if frozen is not None else None
                wall = time.monotonic() - t0
                w1, r1 = shuffle_totals()
                print(json.dumps({
                    "index_rows": n_idx,
                    "cpus": int(cpus),
                    "prefilter_fp": fp,
                    "foreign_keep_mult": foreign_mult,
                    "mode": "retention_only" if max_bucket is None else "full",
                    "rows_after": n_after,
                    "frozen_buckets": n_frozen,
                    "wall_s": round(wall, 2),
                    "shuffle_write_bytes": w1 - w0,
                    "shuffle_read_bytes": r1 - r0,
                    "steal_pct": _steal_pct(s0, _steal_ticks()),
                    "load1": l0,
                }), flush=True)
                release_all()
        idx.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
