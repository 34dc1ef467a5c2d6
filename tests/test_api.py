"""High-level API tests: each one-call aggregation returns correct
estimates against exact answers computed from the same fixture."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from marker_spark import (
    BloomSketch,
    CmsSketch,
    HllSketch,
    KllSketch,
    MinHashSketch,
    TDigestSketch,
    collect_sketch,
    collect_sketches,
)
from marker_spark.api import bloom_agg, cms_agg, hll_agg, kll_agg, minhash_agg, tdigest_agg
from marker_spark.datagen import gen_tokenized_sequences
from marker_spark.ngrams import list_column_to_flat, ngram_bytes


@pytest.fixture(scope="module")
def tok(spark, tokseq_path):
    return spark.read.parquet(tokseq_path)


@pytest.fixture(scope="module")
def pdf():
    return gen_tokenized_sequences(2000, seed=42).to_pandas()


def test_bloom_agg(spark, tok, pdf):
    sk = collect_sketch(bloom_agg(tok, capacity=500_000, fp=0.001), BloomSketch)
    flat, offsets = list_column_to_flat(pdf["tokens"])
    mat, _ = ngram_bytes(flat, offsets, 3)
    assert bool(sk.contains_fixed_width(mat).all())


def test_hll_agg(spark, tok, pdf):
    sk = collect_sketch(hll_agg(tok, precision=14), HllSketch)
    flat, offsets = list_column_to_flat(pdf["tokens"])
    mat, _ = ngram_bytes(flat, offsets, 3)
    exact = len(set(map(bytes, mat)))
    assert abs(sk.estimate() - exact) / exact <= 3 * sk.std_error


def test_cms_agg(spark, tok, pdf):
    sk = collect_sketch(cms_agg(tok, ngram=1), CmsSketch)
    flat, _ = list_column_to_flat(pdf["tokens"])
    uniq, counts = np.unique(flat, return_counts=True)
    top = np.argsort(counts)[-5:]
    mat = uniq[top].astype("<i4").reshape(-1, 1).view(np.uint8).reshape(-1, 4)
    est = sk.query_fixed_width(mat).astype(np.int64)
    assert (est >= counts[top]).all()
    assert (est - counts[top] <= sk.eps * sk.total + 1).all()


def test_kll_tdigest_agg_grouped(spark, tok, pdf):
    kll = collect_sketches(kll_agg(tok, "n_tok", group_cols=["source"]), KllSketch, ["source"])
    td = collect_sketches(tdigest_agg(tok, "n_tok", group_cols=["source"]), TDigestSketch, ["source"])
    for src, sub in pdf.groupby("source"):
        if len(sub) < 50:
            continue
        # rank-based gate: a correct k=256 KLL has ~1-2% rank error, so
        # the estimated median must land within the 35th-65th percentile
        # band (the old IQR-sized tolerance let a 25th/75th-percentile
        # answer pass)
        lo = float(sub["n_tok"].quantile(0.35))
        hi = float(sub["n_tok"].quantile(0.65))
        assert lo <= kll[(src,)].quantile(0.5) <= hi, src
        assert lo <= td[(src,)].quantile(0.5) <= hi, src


def test_minhash_agg_self_similarity(spark, tok):
    sigs = collect_sketches(minhash_agg(tok, group_cols=["source"]), MinHashSketch, ["source"])
    keys = sorted(sigs)
    # identical sketch vs itself
    assert sigs[keys[0]].jaccard(sigs[keys[0]]) == 1.0
    # different zipf-token sources share head n-grams but not all
    j = sigs[keys[0]].jaccard(sigs[keys[1]])
    assert 0.0 <= j < 1.0


def test_lsh_topk_recall_vs_scan_fraction(spark):
    """ANN recall/cost tradeoff.  The synthetic embeddings are random
    (near-orthogonal: best non-self cosine ~0.33), the hardest case for
    LSH — a true neighbor at cos 0.3 disagrees on ~40% of hyperplanes.
    Assert the tradeoff rather than a clustered-data recall figure:
    multiprobe LSH at 6 planes must beat random selection's expected
    recall while scanning well under half the corpus, and must always
    find the query itself."""
    from marker_spark.ops.similarity import brute_force_topk, hyperplane_signatures, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_total = emb.count()
    query = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, query, k=10).collect()}
    wb = hyperplane_signatures(emb, dim=len(query), n_planes=6).cache()
    approx_df = lsh_topk(wb, query, k=10, n_planes=6, probe_hamming=2)
    approx = {r["vec_id"] for r in approx_df.collect()}
    recall = len(exact & approx) / len(exact)
    # fraction of corpus the probe actually scanned (bucket filter)
    import numpy as np

    rng = np.random.default_rng(42)
    planes = rng.standard_normal((len(query), 6))
    qb = int(((np.asarray(query) @ planes) > 0).astype(np.int64) @ (1 << np.arange(6)))
    probe = {qb} | {qb ^ (1 << i) for i in range(6)} | {
        qb ^ (1 << i) ^ (1 << j) for i in range(6) for j in range(i + 1, 6)
    }
    scanned = wb.where(F.col("bucket").isin(list(probe))).count()
    frac = scanned / n_total
    assert 0 in approx, "query vector itself must be found"
    assert frac < 0.6, f"scanned {frac:.2f} of corpus"
    assert recall > frac, f"recall {recall} should beat random-scan baseline {frac:.2f}"


def test_bucketed_grouped_bloom_membership(spark, tok, pdf):
    """Per-(source, bucket) bounded filters: every doc's n-grams are
    found in its own group's sketch — the production shape of the
    bucketed bench variant."""
    from pyspark.sql import functions as F

    dpb = 500
    with_bucket = tok.withColumn(
        "bucket", (F.substring("doc_id", 5, 12).cast("long") / dpb).cast("int").cast("string")
    )
    out = bloom_agg(with_bucket, capacity=100_000, fp=0.001, group_cols=["source", "bucket"])
    sketches = collect_sketches(out, BloomSketch, ["source", "bucket"])
    p = pdf.copy()
    p["bucket"] = (p["doc_id"].str[4:].astype(int) // dpb).astype(str)
    for (src, bkt), sub in p.groupby(["source", "bucket"]):
        sk = sketches[(src, bkt)]
        flat, offsets = list_column_to_flat(sub["tokens"])
        mat, _ = ngram_bytes(flat, offsets, 3)
        assert bool(sk.contains_fixed_width(mat).all()), (src, bkt)


def test_mg_agg_finds_heavy_items(spark):
    """One-call MG aggregation: per-group summaries whose candidates
    contain every item above N/(k+1)."""
    import numpy as np
    import pandas as pd

    from marker_spark.agg import collect_sketches
    from marker_spark.api import mg_agg
    from marker_spark.sketches.misra_gries import MisraGriesSketch

    rng = np.random.default_rng(3)
    rows = []
    for g in ["x", "y"]:
        heavy = 1 if g == "x" else 2
        items = np.where(rng.random(5_000) < 0.3, heavy, rng.integers(100, 10_000, 5_000))
        rows.append(pd.DataFrame({"g": g, "item": items.astype("int64")}))
    df = spark.createDataFrame(pd.concat(rows), schema="g string, item long")
    result = mg_agg(df, item_col="item", group_cols=["g"], k=64)
    sks = collect_sketches(result, MisraGriesSketch, ["g"])
    assert 1 in set(int(i) for i in sks[("x",)].items)
    assert 2 in set(int(i) for i in sks[("y",)].items)
