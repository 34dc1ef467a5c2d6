"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and
prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "tokens_per_sec": ..., "n_tokens": ...}

The primary BASELINE.json metric is tokens/sec sketch-build throughput
over the synthetic tokenized-sequence table (seed 42, deterministic,
cached under /tmp keyed by size); `value` is total wall seconds across
the headline queries.  Scaling runs (local[8] vs local[32]) for
BENCH/BASELINE.md: SPARK_GRAFT_CPUS=8 python bench.py, then =32.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_session(cpus: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("marker-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _tokseq_parquet(n_docs: int, seed: int = 42) -> str:
    """Deterministic synthetic tokenized table, cached across runs so
    both scaling legs read identical input."""
    path = f"/tmp/marker_bench_tokseq_n{n_docs}_s{seed}.parquet"
    if not os.path.exists(path):
        from marker_spark.datagen import write_tokenized_sequences

        write_tokenized_sequences(path, n_docs=n_docs, seed=seed)
    return path


def sketch_build_throughput(spark, n_docs: int) -> tuple[float, int, float]:
    """Headline: Bloom over 3-grams + HLL + CMS + KLL in ONE pass over
    the tokenized table (shared scan, four sketch states per group).
    Returns (secs, total_tokens, tokens_per_sec)."""
    from pyspark.sql import functions as F

    from marker_spark.agg import collect_sketches, sketch_agg
    from marker_spark.kernels import bloom_factory, bloom_ngram_updater
    from marker_spark.ngrams import list_column_to_flat, ngram_bytes
    from marker_spark.sketches.bloom import BloomSketch
    from marker_spark.sketches.cms import CmsSketch
    from marker_spark.sketches.hll import HllSketch
    from marker_spark.sketches.kll import KllSketch

    path = _tokseq_parquet(n_docs)
    df = spark.read.parquet(path)
    n_tokens = int(df.agg(F.sum("n_tok")).collect()[0][0])
    # Size the per-group Bloom for the hottest group (~45% of a zipf
    # source distribution) — the reference's sizing formulas, data-driven.
    capacity = max(int(n_tokens * 0.5), 100_000)

    class Multi:
        """Composite state: one shared hash pass feeds all sketches."""

        def __init__(self):
            self.bloom = bloom_factory(capacity=capacity, fp=0.001)()
            self.hll = HllSketch(p=14)
            self.cms = CmsSketch(d=5, w=1 << 16)
            self.kll = KllSketch(k=256)

        def update(self, pdf):
            from marker_spark.hashing import mmh3_fixed_width

            flat, offsets = list_column_to_flat(pdf["tokens"])
            mat, _ = ngram_bytes(flat, offsets, 3)
            if len(mat):
                h1, h2 = mmh3_fixed_width(mat)  # hash ONCE for all sketches
                self.bloom.insert_hashes(h1, h2)
                self.hll.update_hashes(h1)
                self.cms.update_hashes(h1, h2)
            self.kll.update(pdf["n_tok"].to_numpy(dtype="float64"))

        def to_bytes(self):
            parts = [self.bloom.to_bytes(), self.hll.to_bytes(), self.cms.to_bytes(), self.kll.to_bytes()]
            import struct

            return b"".join(struct.pack("<I", len(p)) + p for p in parts)

        @classmethod
        def from_bytes(cls, buf):
            import struct

            obj = cls.__new__(cls)
            off = 0
            parts = []
            while off < len(buf):
                (ln,) = struct.unpack_from("<I", buf, off)
                off += 4
                parts.append(buf[off : off + ln])
                off += ln
            obj.bloom = BloomSketch.from_bytes(parts[0])
            obj.hll = HllSketch.from_bytes(parts[1])
            obj.cms = CmsSketch.from_bytes(parts[2])
            obj.kll = KllSketch.from_bytes(parts[3])
            return obj

        def merge_in_place(self, other):
            self.bloom.merge_in_place(other.bloom)
            self.hll.merge_in_place(other.hll)
            self.cms.merge_in_place(other.cms)
            self.kll.merge_in_place(other.kll)
            return self

    t0 = time.monotonic()
    # shuffle mode: Bloom states are MBs — shuffle raw rows once, salted
    # to spread the zipf-hot source over multiple tasks, instead of
    # shipping P*G bitmaps.
    result = sketch_agg(
        df, Multi, lambda sk, pdf: sk.update(pdf), Multi,
        group_cols=["source"], mode="shuffle", salt=8,
    )
    sketches = collect_sketches(result, Multi, ["source"])
    secs = time.monotonic() - t0
    assert sketches, "no sketches built"
    return secs, n_tokens, n_tokens / secs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(max(int(1_000_000 * sf), 2_000))))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # Headline sketch-build throughput (the BASELINE.json metric).
    secs, n_tokens, tps = sketch_build_throughput(spark, n_docs)
    timings["sketch_build_multi"] = round(secs, 3)

    bench_queries = [
        "flagship_bloom_by_source",
        "pricing_summary",
        "top_customers",
        "bucket_counts",
        "token_counts",
        "exact_dedup",
        "top_words",
        "knn_bruteforce",
        "minhash_lsh_pairs",
        "simhash_near_dup",
        "hll_distinct_ngrams",
        "cms_heavy_tokens",
        "kll_ntok_quantiles",
        "tdigest_value_quantiles",
        "cache_timerange_lookup",
    ]
    qmap = entrymod.queries()
    for name in bench_queries:
        t0 = time.monotonic()
        df = qmap[name](spark, sf_dir)
        df.collect()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
                "n_tokens": n_tokens,
                "tokens_per_sec": round(tps, 1),
                "bench_docs": n_docs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
