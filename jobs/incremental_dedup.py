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

Index storage (doc_id, band_id, band_hash), append-only across batches:

* default: plain parquet at ``--index``;
* ``--bucketed``: a BUCKETED external table at the same location
  (``CREATE TABLE IF NOT EXISTS ... CLUSTERED BY (band_id, band_hash)
  INTO --n-buckets BUCKETS LOCATION ...`` re-issued per run — the
  in-memory catalog forgets between sessions but the bucket layout is
  in the files, so every run's index-side scan is ``Bucketed: true``
  and the per-batch join NEVER shuffles the ever-growing index side;
  only the day's small increment moves).  At 100 TB this is the
  difference between re-shuffling the corpus index every increment and
  never moving it at all (zero-exchange plan asserted in
  tests/test_tables.py and tests/test_incremental_dedup.py).

Candidate pairs are verified with exact shingle Jaccard bounded by the
candidate count (never a discovery-shaped self-join).  Within-batch
pairs always verify against ``--input``; CROSS-batch pairs need the old
docs' text, which the index doesn't store (it must stay O(corpus) rows
of 24-byte bands) — pass ``--corpus`` (the accumulated text store,
doc_id + text) to verify them too, else they ship with jaccard = NULL.
Existence probes go through the Hadoop FileSystem API, so hdfs:// and
s3a:// index paths behave exactly like local ones (os.path.exists is
silently False for every non-local URI).
"""

from __future__ import annotations

import argparse
import json
import time

INDEX_TABLE = "lsh_band_index"
INDEX_SCHEMA = "doc_id BIGINT, band_id INT, band_hash BIGINT"


def _register_bucketed_index(spark, location: str, n_buckets: int) -> None:
    """(Re-)declare the bucketed external index table on its location.
    Idempotent per session and across sessions: the catalog entry dies
    with the session, the bucket layout lives in the files."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {INDEX_TABLE} ({INDEX_SCHEMA}) "
        f"USING parquet CLUSTERED BY (band_id, band_hash) "
        f"SORTED BY (band_id, band_hash) INTO {n_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="new batch parquet (doc_id, text)")
    ap.add_argument("--index", required=True, help="band-index dir (created if absent)")
    ap.add_argument("--pairs-out", required=True)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--rows-per-band", type=int, default=4)
    ap.add_argument("--max-bucket", type=int, default=200)
    ap.add_argument("--jaccard", type=float, default=0.7)
    ap.add_argument("--bucketed", action="store_true",
                    help="store the index as a bucketed table on (band_id, "
                         "band_hash): the per-batch join reads it without an "
                         "exchange")
    ap.add_argument("--n-buckets", type=int, default=16,
                    help="bucket count for --bucketed (must stay constant "
                         "across runs on one index)")
    ap.add_argument("--corpus", default=None,
                    help="accumulated corpus text store (doc_id, text) — "
                         "verifies CROSS-batch pairs too; without it they "
                         "ship with jaccard = NULL")
    ap.add_argument("--no-append", action="store_true",
                    help="report pairs only; do not append the batch to the index")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from marker_spark.cacheutil import release_all
    from marker_spark.ops.dedup import (
        incremental_lsh_pairs,
        minhash_signatures,
        ngram_jaccard_for_pairs,
    )
    from marker_spark.tables import path_exists

    spark = (
        SparkSession.builder.appName("marker-spark-incremental-dedup")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    t0 = time.monotonic()
    num_perm = args.bands * args.rows_per_band
    batch = spark.read.parquet(args.input)
    sigs = minhash_signatures(batch, num_perm=num_perm)

    fresh = not path_exists(spark, args.index)
    if args.bucketed:
        _register_bucketed_index(spark, args.index, args.n_buckets)
        # an empty just-created table reads as an empty index — the
        # first batch's pairs are simply its within-batch candidates
        index = spark.read.table(INDEX_TABLE)
    elif fresh:
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

    # verification bounded by candidate pairs (never a discovery-shaped
    # self-join).  Text sources: the batch always; plus --corpus for the
    # old side of cross pairs when the deployment provides it.
    if args.corpus:
        texts = (
            spark.read.parquet(args.corpus)
            .select("doc_id", "text")
            .unionByName(batch.select("doc_id", "text"))
            .dropDuplicates(["doc_id"])
        )
        out = ngram_jaccard_for_pairs(pairs, texts).where(
            f"jaccard >= {args.jaccard}"
        )
    else:
        batch_ids = batch.selectExpr("doc_id").distinct()
        within = (
            pairs.join(batch_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi")
            .join(batch_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
        )
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
        if args.bucketed:
            # insertInto resolves positionally — pin the DDL column order
            (
                new_bands.select(
                    F.col("doc_id").cast("long"),
                    F.col("band_id").cast("int"),
                    F.col("band_hash").cast("long"),
                )
                .write.mode("append")
                .insertInto(INDEX_TABLE)
            )
        else:
            # plain append (creates the directory on the first batch) —
            # never a conditional overwrite that could clobber an index
            # a mis-probed existence check said wasn't there
            new_bands.write.mode("append").parquet(args.index)
    release_all()

    n_pairs = spark.read.parquet(args.pairs_out).count()
    print(json.dumps({
        "input": args.input,
        "index": args.index,
        "index_created": fresh,
        "bucketed": bool(args.bucketed),
        "batch_docs": batch.count(),
        "candidate_pairs": n_pairs,
        "secs": round(time.monotonic() - t0, 2),
    }))


if __name__ == "__main__":
    main()
