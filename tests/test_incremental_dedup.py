"""Incremental MinHash-LSH dedup against a persisted band index —
the daily-crawl shape at corpus scale (build the index once, each
increment joins its bands against it instead of re-running discovery).

The load-bearing invariant: incremental pairs over an (old, new)
split == batch pairs over the union MINUS batch pairs over old alone
— pinned here on real splitmix signatures, with and without the
joint-size bucket cap.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from marker_spark.cacheutil import release_all
from marker_spark.ops.dedup import (
    incremental_lsh_pairs,
    incremental_pairs_from_bands,
    lsh_band_table,
    lsh_candidate_pairs,
    minhash_signatures,
)

SF_DIR = "/root/testdata/sf0.001"
BANDS, RPB = 8, 4  # 32 perms; small so the fixture yields pairs


def _pairs_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


@pytest.fixture(scope="module")
def split(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = minhash_signatures(docs, num_perm=BANDS * RPB).persist()
    old = sigs.where(F.col("doc_id") % 4 != 0)
    new = sigs.where(F.col("doc_id") % 4 == 0)
    yield sigs, old, new
    sigs.unpersist()
    release_all()


def test_incremental_equals_batch_difference(spark, split):
    sigs, old, new = split
    batch_all = _pairs_set(lsh_candidate_pairs(sigs, bands=BANDS, rows_per_band=RPB))
    batch_old = _pairs_set(lsh_candidate_pairs(old, bands=BANDS, rows_per_band=RPB))
    index = lsh_band_table(old, bands=BANDS, rows_per_band=RPB).persist()
    inc, new_bands = incremental_lsh_pairs(index, new, bands=BANDS, rows_per_band=RPB)
    got = _pairs_set(inc)
    assert got == batch_all - batch_old
    assert got, "fixture produced no incremental pairs — test is vacuous"
    # every incremental pair touches >= 1 new doc
    assert all(a % 4 == 0 or b % 4 == 0 for a, b in got)
    index.unpersist()
    release_all()


def test_incremental_cap_equals_batch_cap_restricted(spark, split):
    """Joint-size cap semantics: a bucket's cap counts index rows + new
    rows, so incremental-with-cap == batch-with-cap over the full
    corpus, restricted to pairs with >= 1 new side."""
    sigs, old, new = split
    cap = 3
    batch_capped = _pairs_set(
        lsh_candidate_pairs(sigs, bands=BANDS, rows_per_band=RPB, max_bucket=cap)
    )
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = {p for p in batch_capped if p[0] in new_ids or p[1] in new_ids}
    index = lsh_band_table(old, bands=BANDS, rows_per_band=RPB).persist()
    inc, _ = incremental_lsh_pairs(
        index, new, bands=BANDS, rows_per_band=RPB, max_bucket=cap
    )
    assert _pairs_set(inc) == want
    index.unpersist()
    release_all()


def test_second_increment_against_appended_index(spark, split):
    """The index-append contract: after increment 1, index' = index
    UNION new_bands; increment 2 against index' emits exactly the
    batch-over-all pairs that touch increment 2."""
    sigs, old, new = split
    inc1 = new.where(F.col("doc_id") % 8 == 0)
    inc2 = new.where(F.col("doc_id") % 8 != 0)
    index = lsh_band_table(old, bands=BANDS, rows_per_band=RPB).persist()
    _, bands1 = incremental_lsh_pairs(index, inc1, bands=BANDS, rows_per_band=RPB)
    index2 = index.unionByName(bands1).persist()
    pairs2, _ = incremental_lsh_pairs(index2, inc2, bands=BANDS, rows_per_band=RPB)
    got = _pairs_set(pairs2)

    batch_all = _pairs_set(lsh_candidate_pairs(sigs, bands=BANDS, rows_per_band=RPB))
    inc2_ids = {r["doc_id"] for r in inc2.select("doc_id").collect()}
    want = {p for p in batch_all if p[0] in inc2_ids or p[1] in inc2_ids}
    assert got == want
    index.unpersist()
    index2.unpersist()
    release_all()


def test_broadcast_new_keeps_index_unshuffled(spark, split):
    """With broadcast_new the cross join must be a BroadcastHashJoin —
    the persisted index side never moves through an exchange (the small
    daily-batch plan on a real cluster)."""
    _, old, new = split
    index = lsh_band_table(old, bands=BANDS, rows_per_band=RPB)
    nb = lsh_band_table(new, bands=BANDS, rows_per_band=RPB).persist()
    pairs = incremental_pairs_from_bands(index, nb, broadcast_new=True)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    pairs.count()
    nb.unpersist()
    release_all()


def test_direct_call_evaluates_bands_once(spark):
    """incremental_pairs_from_bands feeds new_bands to THREE consumers
    (cross leg + both self-join sides); called DIRECTLY with an
    unpersisted input and max_bucket=None it must persist internally so
    the band subtree runs once, not once per consumer (r9 verdict #7 —
    previously only the public wrapper persisted)."""
    from pyspark.sql.types import LongType

    acc = spark.sparkContext.accumulator(0)

    def _counted(v: pd.Series) -> pd.Series:
        acc.add(len(v))
        return v

    counted = F.pandas_udf(_counted, LongType())

    nb = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band_id"),
        counted((F.col("id") % 2).cast("long")).alias("band_hash"),
    )
    index = spark.createDataFrame([], "doc_id long, band_id int, band_hash long")
    pairs = incremental_pairs_from_bands(index, nb, max_bucket=None)
    # two buckets {0,2,4} and {1,3,5} -> 3 pairs each
    assert pairs.count() == 6
    assert acc.value == 6, f"band subtree ran {acc.value / 6:.0f}x, want once"
    release_all()


def test_empty_increment_is_safe(spark, split):
    _, old, new = split
    index = lsh_band_table(old, bands=BANDS, rows_per_band=RPB)
    empty = new.where(F.lit(False))
    pairs, bands_df = incremental_lsh_pairs(index, empty, bands=BANDS, rows_per_band=RPB)
    assert pairs.count() == 0
    assert bands_df.count() == 0
    release_all()


def test_incremental_dedup_job_two_batches(spark, tmp_path, capsys):
    """jobs/incremental_dedup.py across two batches: batch 0 creates
    the index, batch 1 joins + appends; cross-batch candidates surface
    with NULL jaccard (the index stores no text, by design), within-
    batch pairs arrive Jaccard-verified."""
    import json

    from jobs.incremental_dedup import main

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    day0 = str(tmp_path / "day0.parquet")
    day1 = str(tmp_path / "day1.parquet")
    docs.where(F.col("doc_id") % 4 != 0).write.parquet(day0)
    # make one guaranteed cross-batch near-dup: clone an old doc into
    # the new batch under a fresh id
    clone = (
        docs.where((F.col("doc_id") % 4 != 0) & (F.length("text") > 50))
        .orderBy("doc_id").limit(1)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
                "lang", "source", "n_chars")
    )
    docs.where(F.col("doc_id") % 4 == 0).unionByName(clone).write.parquet(day1)

    index = str(tmp_path / "lsh_index")
    out0 = str(tmp_path / "pairs0")
    out1 = str(tmp_path / "pairs1")

    main(["--input", day0, "--index", index, "--pairs-out", out0])
    rep0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep0["index_created"] is True
    idx_rows_after0 = spark.read.parquet(index).count()
    assert idx_rows_after0 > 0

    main(["--input", day1, "--index", index, "--pairs-out", out1])
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep1["index_created"] is False
    # index grew by the new batch's bands
    assert spark.read.parquet(index).count() > idx_rows_after0

    pairs1 = spark.read.parquet(out1)
    # the injected clone must be caught as a cross-batch candidate
    # (identical text -> identical signature -> all bands collide)
    cross = pairs1.where(F.col("jaccard").isNull())
    assert cross.where(F.col("id_b") >= 1_000_000).count() >= 1


def test_incremental_dedup_job_bucketed_with_corpus(spark, tmp_path, capsys):
    """--bucketed stores the index as a CLUSTERED BY (band_id,
    band_hash) external table: batch 1 — run after the catalog forgot
    the table, as a fresh spark-submit session would — re-declares it
    on the same location, reads the bucketed layout from the files,
    and its index-side join scan carries the bucket spec (zero
    exchange on the index side).  --corpus verifies CROSS-batch pairs
    with real Jaccard instead of NULL."""
    import json

    from jobs.incremental_dedup import INDEX_TABLE, main

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    day0 = str(tmp_path / "day0.parquet")
    day1 = str(tmp_path / "day1.parquet")
    old = docs.where(F.col("doc_id") % 4 != 0)
    old.write.parquet(day0)
    clone = (
        docs.where((F.col("doc_id") % 4 != 0) & (F.length("text") > 50))
        .orderBy("doc_id").limit(1)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
                "lang", "source", "n_chars")
    )
    docs.where(F.col("doc_id") % 4 == 0).unionByName(clone).write.parquet(day1)

    index = str(tmp_path / "lsh_index_bucketed")
    out0 = str(tmp_path / "pairs0")
    out1 = str(tmp_path / "pairs1")
    spark.sql(f"DROP TABLE IF EXISTS {INDEX_TABLE}")
    try:
        main(["--input", day0, "--index", index, "--pairs-out", out0,
              "--bucketed", "--n-buckets", "4"])
        rep0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep0["index_created"] is True and rep0["bucketed"] is True
        rows0 = spark.read.table(INDEX_TABLE).count()
        assert rows0 > 0

        # emulate the next day's FRESH session: the in-memory catalog
        # forgot the table; only the files (with bucket layout) remain
        spark.sql(f"DROP TABLE {INDEX_TABLE}")
        main(["--input", day1, "--index", index, "--pairs-out", out1,
              "--bucketed", "--n-buckets", "4", "--corpus", day0])
        rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep1["index_created"] is False
        assert spark.read.table(INDEX_TABLE).count() > rows0

        # cross-batch clone pair arrives VERIFIED (jaccard = 1), not NULL
        pairs1 = spark.read.parquet(out1)
        hit = pairs1.where(F.col("id_b") >= 1_000_000).collect()
        assert hit and all(r["jaccard"] is not None and r["jaccard"] >= 0.99
                           for r in hit)

        # the production property: a join keyed on (band_id, band_hash)
        # reads the index WITHOUT an exchange on the index side
        idx = spark.read.table(INDEX_TABLE)
        probe = (
            idx.limit(10).select("band_id", "band_hash").distinct()
        )
        plan = (
            idx.hint("merge").join(probe, ["band_id", "band_hash"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Bucketed: true" in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {INDEX_TABLE}")
    release_all()
