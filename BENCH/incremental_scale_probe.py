"""Incremental-dedup scale probe: the whole case for a persisted band
index is that a daily increment costs O(increment), not O(corpus) —
this measures it instead of asserting it.

For each corpus size N the probe builds the band index ONCE (untimed,
cached to /tmp as parquet — the production shape), then times two legs
over an identical fixed-size increment (default 10k docs):

 * incremental — signatures for the INCREMENT only, band, join the
   parquet index (:func:`incremental_lsh_pairs`); touches the corpus
   only through a columnar index scan;
 * batch rerun — what a user without the index must do: signatures for
   corpus+increment, full banded self-join
   (:func:`lsh_candidate_pairs`).

Pass criterion: batch wall grows ~linearly in N while incremental
stays near-flat, so the batch/incremental ratio widens with N.  Pair
counts are cross-checked: batch pairs restricted to new-involving ids
must equal the incremental pairs (the tests/test_incremental_dedup.py
equivalence, re-verified at every probe scale).

Corpus shape (deterministic, index arithmetic only): unique word-soup
docs; every 20th doc is a near-copy of its predecessor (last 3 words
perturbed) so real near-dup pairs exist at every scale, both within
the corpus and across the corpus/increment boundary.

Usage:  python BENCH/incremental_scale_probe.py [sizes] [increment]
        (defaults "50000,200000,800000" 10000; one JSON line per size)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANDS, RPB = 16, 4  # 64 perms

_FORMULA_V = 1


def _doc_words(i: int) -> list[str]:
    n_words = 35 + (i * 13) % 30
    return [
        f"w{(i * 2654435761 + j * 1000003 + (i % 97) * j) % 200000}"
        for j in range(n_words)
    ]


def _doc_text(i: int) -> str:
    if i % 20 == 19:  # near-copy of predecessor: high-Jaccard pair
        words = _doc_words(i - 1)
        words[-3:] = [f"edit{i}a", f"edit{i}b", f"edit{i}c"]
        return " ".join(words)
    return " ".join(_doc_words(i))


def build_corpus(lo: int, hi: int) -> str:
    path = f"/tmp/marker_inc_probe_v{_FORMULA_V}_{lo}_{hi}.parquet"
    if os.path.exists(path):
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = list(range(lo, hi))
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": [_doc_text(i) for i in ids],
    })
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(tbl, tmp, row_group_size=16384)
    os.replace(tmp, path)
    return path


def main() -> None:
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "50000,200000,800000").split(",")
    ]
    inc = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    import bench

    from marker_spark.cacheutil import release_all
    from marker_spark.ops.dedup import (
        incremental_lsh_pairs,
        lsh_band_table,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    spark = bench.build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        corpus = spark.read.parquet(build_corpus(0, n))
        new_docs = spark.read.parquet(build_corpus(n, n + inc))
        corpus.count(), new_docs.count()  # warm scans

        # untimed setup: the persisted index (the production state a
        # real pipeline maintains across batches)
        idx_path = f"/tmp/marker_inc_probe_v{_FORMULA_V}_index_{n}.parquet"
        if not os.path.exists(idx_path):
            lsh_band_table(
                minhash_signatures(corpus, num_perm=BANDS * RPB),
                bands=BANDS, rows_per_band=RPB,
            ).write.mode("overwrite").parquet(idx_path)

        counts: dict[str, int] = {}

        def inc_trial() -> float:
            t0 = time.monotonic()
            index = spark.read.parquet(idx_path)
            sigs = minhash_signatures(new_docs, num_perm=BANDS * RPB)
            pairs, _ = incremental_lsh_pairs(
                index, sigs, bands=BANDS, rows_per_band=RPB
            )
            counts["inc_pairs"] = pairs.count()
            release_all()
            return time.monotonic() - t0

        def batch_trial() -> float:
            t0 = time.monotonic()
            both = corpus.unionByName(new_docs)
            sigs = minhash_signatures(both, num_perm=BANDS * RPB)
            pairs = lsh_candidate_pairs(sigs, bands=BANDS, rows_per_band=RPB)
            counts["batch_pairs"] = pairs.count()
            # equivalence re-check at probe scale: batch pairs touching
            # a new id == incremental pairs (ids >= n are the increment)
            counts["batch_new_involving"] = pairs.where(
                (pairs.id_a >= n) | (pairs.id_b >= n)
            ).count()
            release_all()
            return time.monotonic() - t0

        inc_best, inc_steal, inc_trials = bench.timed_trials(
            inc_trial, min_trials=2, max_trials=4
        )
        batch_best, batch_steal, batch_trials = bench.timed_trials(
            batch_trial, min_trials=2, max_trials=4
        )
        print(json.dumps({
            "n_corpus": n,
            "n_increment": inc,
            "incremental_sec": round(inc_best, 3),
            "batch_sec": round(batch_best, 3),
            "ratio_batch_over_inc": round(batch_best / inc_best, 2),
            "equivalence_ok": counts["inc_pairs"] == counts["batch_new_involving"],
            "inc_steal_pct": None if inc_steal is None else round(inc_steal, 2),
            "batch_steal_pct": None if batch_steal is None else round(batch_steal, 2),
            "trials": [inc_trials, batch_trials],
            **counts,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
