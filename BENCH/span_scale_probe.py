"""Span-family scale probe: the frequency-cap / broadcast-bound claims
of duplicated_spans + boilerplate_spans are strongest at scale, but the
driver fixture tops out at sf0.1 (5k docs / 1.5M chars).  This probe
synthesizes the SAME corpus shape at 1x and 10x that scale and measures
wall-time growth of the three span operators — sub-quadratic growth
(~= the row growth) is the pass criterion.

Corpus shape (deterministic, no RNG, index arithmetic only — the
formula-synthesis pattern from the media_metadata oracle):
 * every doc is a unique word-soup (words drawn from a 200k-id space by
   a fixed affine formula of (doc, position)) — the mostly-clean bulk a
   real deduplicated crawl presents;
 * every 10th doc appends one of a pool of 120-char passages, each
   shared by exactly 3 docs (df=3: inside the pair path's 2..max_df
   window — the content duplicated_spans exists to find);
 * every 3rd doc is prepended a fixed license header (df = n/3 >>
   max_df: the pair path's cap excludes it, the boilerplate broadcast
   path must catch it) — the q_boilerplate_excision augmentation
   pattern at scale.

Usage:  python BENCH/span_scale_probe.py [sizes]
        (default "5000,50000"; prints one JSON line per size)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HEADER = (
    "=== STANDARD LICENSE HEADER v2.1: redistribution and use of this "
    "document are permitted under the common corpus terms. ===\n"
)


def _passage(pid: int) -> str:
    # 120+ chars, unique per pid, formula-only
    words = [f"shared{pid}w{(pid * 31 + j * 7) % 9973}" for j in range(12)]
    return " ".join(words)


def _doc_text(i: int) -> str:
    n_words = 35 + (i * 13) % 30
    words = [
        f"w{(i * 2654435761 + j * 1000003 + (i % 97) * j) % 200000}"
        for j in range(n_words)
    ]
    text = " ".join(words)
    if i % 10 == 0:
        text = text + " " + _passage((i // 10) // 3)
    if i % 3 == 0:
        text = _HEADER + text
    return text


# bump when _HEADER/_passage/_doc_text change: the cache below is keyed
# on (formula version, n_docs) — without the version a formula edit
# would silently re-measure the OLD corpus from /tmp
_FORMULA_V = 1


def build_corpus(n_docs: int) -> str:
    path = f"/tmp/marker_span_probe_v{_FORMULA_V}_n{n_docs}.parquet"
    if os.path.exists(path):
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = list(range(n_docs))
    texts = [_doc_text(i) for i in ids]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    tmp = f"{path}.tmp-{os.getpid()}"
    # 16384-row groups: a single-row-group file serializes the scan AND
    # freezes thin partitioning through persists (CLAUDE.md gotcha)
    pq.write_table(tbl, tmp, row_group_size=16384)
    os.replace(tmp, path)
    return path


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "5000,50000").split(",")]
    import bench
    from pyspark.sql import functions as F

    from marker_spark.cacheutil import register, release_all
    from marker_spark.ops.dedup import (
        boilerplate_spans,
        char_grams,
        duplicated_spans,
        remove_duplicated_spans,
    )

    spark = bench.build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        path = build_corpus(n)
        docs = spark.read.parquet(path)
        n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
        docs.count()  # warm page cache/scan
        results: dict[str, float | int] = {}

        def trial() -> float:
            t0 = time.monotonic()
            # one shared gram pass feeds both span paths (the grams=
            # contract), as jobs/dedup_pipeline.py --span-k --boilerplate
            grams = register(char_grams(docs, k=24).persist())
            dup = duplicated_spans(docs, k=24, min_len=40, max_df=16,
                                   max_occ=64, grams=grams)
            bp = boilerplate_spans(docs, k=24, min_len=40, max_df=16,
                                   grams=grams)
            all_spans = dup.select(
                "doc_b", "start_b", "span_len"
            ).unionByName(
                bp.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("start").alias("start_b"),
                    "span_len",
                )
            )
            cleaned = remove_duplicated_spans(docs, all_spans)
            agg = cleaned.agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_chars_after").alias("chars_after"),
            ).collect()[0]
            dt = time.monotonic() - t0
            # `not in`, not falsy-or: a legitimate 0 count must not
            # trigger a full span-subtree recompute every trial
            if "n_dup_spans" not in results:
                results["n_dup_spans"] = dup.count()
            if "n_bp_spans" not in results:
                results["n_bp_spans"] = bp.count()
            results["chars_after"] = int(agg["chars_after"])
            release_all()
            return dt

        best, steal, trials = bench.timed_trials(trial, min_trials=2, max_trials=4)
        print(json.dumps({
            "n_docs": n,
            "n_chars": int(n_chars),
            "pipeline_sec": round(best, 3),
            "steal_pct": None if steal is None else round(steal, 2),
            "trials": trials,
            **{k: int(v) for k, v in results.items()},
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
