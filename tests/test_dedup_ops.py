"""Dedup operator tests beyond the oracle queries: scalable exact
dedup equivalence, MinHash-LSH candidate quality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marker_spark.ops.dedup import (
    exact_dedup,
    exact_dedup_scalable,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )


def test_exact_dedup_variants_agree(spark, docs):
    a = exact_dedup(docs).select("doc_id", "dup_count")
    b = exact_dedup_scalable(docs).select("doc_id", "dup_count")
    ra = {(r["doc_id"], r["dup_count"]) for r in a.collect()}
    rb = {(r["doc_id"], r["dup_count"]) for r in b.collect()}
    assert ra == rb


def test_scalable_dedup_keeps_full_rows(spark, docs):
    out = exact_dedup_scalable(docs)
    assert set(out.columns) == set(docs.columns) | {"dup_count"}
    assert out.count() == docs.select("text").distinct().count()


def test_lsh_candidates_cover_high_jaccard_pairs(spark, docs):
    """Every pair with true 3-gram Jaccard >= 0.8 must appear among the
    MinHash-LSH candidates (b=32, r=4 -> ~1 collision prob at s=0.8)."""
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, shingle=3, threshold=0.8).collect()
    }
    if not truth:
        pytest.skip("fixture has no >=0.8 jaccard pairs at this sf")
    sigs = minhash_signatures(docs, num_perm=128, shingle=3)
    cands = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, bands=32, rows_per_band=4).collect()
    }
    missed = truth - cands
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
