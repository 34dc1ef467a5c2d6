"""spark-submit entry point: incremental MinHash-LSH dedup of a new
document batch against a persisted band index (ops/dedup.py — the
daily-crawl shape: the corpus is banded once; each increment joins the
index instead of re-running corpus-squared discovery).

Usage:
    zip -r dist/marker_spark.zip marker_spark
    # first batch (no index yet): builds it
    spark-submit --py-files dist/marker_spark.zip \\
        jobs/incremental_dedup.py --input day0.parquet \\
        --index /data/lsh_index --pairs-out /tmp/pairs_day0
    # every later batch: joins + appends
    spark-submit ... --input day1.parquet \\
        --index /data/lsh_index --pairs-out /tmp/pairs_day1

The index directory is plain parquet (doc_id, band_id, band_hash) —
append-only across batches; on a cluster store it bucketed on
(band_id, band_hash) (marker_spark.tables.TableProvider.write_bucketed)
so the per-batch join never shuffles the index side.  Candidate pairs
are verified with exact shingle Jaccard bounded by the candidate count
(never a discovery-shaped self-join), and only pairs >= --jaccard are
reported.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="new batch parquet (doc_id, text)")
    ap.add_argument("--index", required=True, help="band-index parquet dir (created if absent)")
    ap.add_argument("--pairs-out", required=True)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--rows-per-band", type=int, default=4)
    ap.add_argument("--max-bucket", type=int, default=200)
    ap.add_argument("--jaccard", type=float, default=0.7)
    ap.add_argument("--no-append", action="store_true",
                    help="report pairs only; do not append the batch to the index")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from marker_spark.cacheutil import release_all
    from marker_spark.ops.dedup import (
        incremental_lsh_pairs,
        lsh_band_table,
        minhash_signatures,
        ngram_jaccard_for_pairs,
    )

    spark = (
        SparkSession.builder.appName("marker-spark-incremental-dedup")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    t0 = time.monotonic()
    num_perm = args.bands * args.rows_per_band
    batch = spark.read.parquet(args.input)
    sigs = minhash_signatures(batch, num_perm=num_perm)

    fresh = not os.path.exists(args.index)
    if fresh:
        # first batch: the index IS this batch's bands; pairs are the
        # within-batch candidates (cross leg joins an empty index)
        index = spark.createDataFrame(
            [], "doc_id long, band_id int, band_hash long"
        )
    else:
        index = spark.read.parquet(args.index)

    pairs, new_bands = incremental_lsh_pairs(
        index, sigs,
        bands=args.bands, rows_per_band=args.rows_per_band,
        max_bucket=args.max_bucket,
    )

    # verification bounded by candidate pairs: both sides' text comes
    # from the batch for within-batch pairs; cross pairs need the old
    # text too, which a real deployment reads from the corpus store —
    # here the caller's --input is the only text source, so cross pairs
    # are emitted unverified with jaccard = NULL (the index stores no
    # text, by design: it must stay O(corpus) rows of 24-byte bands)
    batch_ids = batch.selectExpr("doc_id").distinct()
    within = pairs.join(batch_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi") \
                  .join(batch_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
    cross = pairs.exceptAll(within)
    verified = ngram_jaccard_for_pairs(within, batch).where(
        f"jaccard >= {args.jaccard}"
    )
    out = verified.unionByName(
        cross.selectExpr("id_a", "id_b", "CAST(NULL AS DOUBLE) AS jaccard")
    )
    out.write.mode("overwrite").parquet(args.pairs_out)

    if not args.no_append:
        # append AFTER the pairs are materialized: the pair plan reads
        # the index, and appending first would double-count the batch
        new_bands.write.mode("overwrite" if fresh else "append").parquet(args.index)
    release_all()

    n_pairs = spark.read.parquet(args.pairs_out).count()
    print(json.dumps({
        "input": args.input,
        "index": args.index,
        "index_created": fresh,
        "batch_docs": batch.count(),
        "candidate_pairs": n_pairs,
        "secs": round(time.monotonic() - t0, 2),
    }))


if __name__ == "__main__":
    main()
