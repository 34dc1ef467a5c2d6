"""End-to-end Spark aggregation tests: distributed Bloom build over the
tokenized-sequence table, membership probes, merge-order invariance.
"""

from __future__ import annotations

import numpy as np
import pytest

from marker_spark.agg import collect_sketch, collect_sketches, sketch_agg
from marker_spark.datagen import gen_tokenized_sequences
from marker_spark.kernels import (
    bloom_factory,
    bloom_ngram_updater,
    make_ngram_membership_udf,
)
from marker_spark.ngrams import list_column_to_flat, ngram_bytes
from marker_spark.sketches.bloom import BloomSketch

N_DOCS = 2000
NGRAM = 3


@pytest.fixture(scope="module")
def tokseq_df(spark, tokseq_path):
    return spark.read.parquet(tokseq_path)


def _local_reference_sketch(factory, n):
    """Single-threaded local build over the same data = ground truth."""
    tbl = gen_tokenized_sequences(N_DOCS, seed=42).to_pandas()
    sk = factory()
    flat, offsets = list_column_to_flat(tbl["tokens"])
    mat, _ = ngram_bytes(flat, offsets, n)
    sk.insert_fixed_width(mat)
    return sk, tbl


def test_distributed_build_matches_local(spark, tokseq_df):
    factory = bloom_factory(capacity=300_000, fp=0.001)
    update = bloom_ngram_updater(NGRAM)
    local, _ = _local_reference_sketch(factory, NGRAM)

    result = sketch_agg(tokseq_df.repartition(7), factory, update, BloomSketch)
    dist = collect_sketch(result, BloomSketch)
    # Exact state equality: OR-merge across any partitioning gives the
    # same bit array as the single-pass build.
    np.testing.assert_array_equal(dist.blocks, local.blocks)
    assert dist.n_inserted == local.n_inserted


def test_partition_count_invariance(spark, tokseq_df):
    factory = bloom_factory(capacity=300_000, fp=0.001)
    update = bloom_ngram_updater(NGRAM)
    a = collect_sketch(sketch_agg(tokseq_df.repartition(2), factory, update, BloomSketch), BloomSketch)
    b = collect_sketch(
        sketch_agg(tokseq_df.repartition(13), factory, update, BloomSketch, tree_fanin=4),
        BloomSketch,
    )
    np.testing.assert_array_equal(a.blocks, b.blocks)


def test_grouped_build_by_source(spark, tokseq_df):
    factory = bloom_factory(capacity=300_000, fp=0.001)
    update = bloom_ngram_updater(NGRAM)
    result = sketch_agg(tokseq_df, factory, update, BloomSketch, group_cols=["source"])
    sketches = collect_sketches(result, BloomSketch, ["source"])
    pdf = gen_tokenized_sequences(N_DOCS, seed=42).to_pandas()
    assert set(k[0] for k in sketches) == set(pdf["source"].unique())
    # Per-group zero false negatives.
    for src, sub in pdf.groupby("source"):
        sk = sketches[(src,)]
        flat, offsets = list_column_to_flat(sub["tokens"])
        mat, _ = ngram_bytes(flat, offsets, NGRAM)
        assert bool(sk.contains_fixed_width(mat).all()), f"FN in group {src}"


def test_membership_udf_no_false_negatives(spark, tokseq_df):
    factory = bloom_factory(capacity=300_000, fp=0.001)
    update = bloom_ngram_updater(NGRAM)
    sk = collect_sketch(sketch_agg(tokseq_df, factory, update, BloomSketch), BloomSketch)

    udf = make_ngram_membership_udf(sk.to_bytes(), NGRAM)
    hits = tokseq_df.select(udf("tokens").alias("hit")).toPandas()["hit"]
    # Every inserted doc contains its own n-grams -> all true.
    assert bool(hits.all())


def test_membership_udf_fp_bounded(spark):
    # Probe docs generated with a different seed: nearly all their
    # n-grams are absent; row-level "any n-gram present" can still fire
    # on common zipf-head grams, so probe with rare high-id tokens.
    factory = bloom_factory(capacity=300_000, fp=0.001)
    update = bloom_ngram_updater(NGRAM)
    rng = np.random.default_rng(99)
    import pandas as pd

    probe_tokens = [rng.integers(10**6, 10**7, size=20).astype(np.int32) for _ in range(500)]
    sk, _ = _local_reference_sketch(factory, NGRAM)
    flat, offsets = list_column_to_flat(pd.Series(probe_tokens))
    mat, per_doc = ngram_bytes(flat, offsets, NGRAM)
    hits = sk.contains_fixed_width(mat)
    fp_rate = float(hits.mean())
    assert fp_rate <= 0.001 * 1.3
    # the DISTRIBUTED probe UDF must agree with the local kernel doc
    # for doc (any-n-gram semantics) — the negative path included
    from marker_spark.kernels import make_ngram_membership_udf

    seg = np.concatenate(([0], np.cumsum(per_doc)[:-1]))
    local_any = np.add.reduceat(hits.astype(np.int64), seg) > 0
    probe_df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(probe_tokens)),
                      "tokens": [t.tolist() for t in probe_tokens]}),
        schema="i long, tokens array<int>",
    )
    udf = make_ngram_membership_udf(sk.to_bytes(), NGRAM)
    got = (
        probe_df.withColumn("h", udf("tokens")).orderBy("i").select("h").toPandas()["h"]
        .to_numpy()
    )
    assert np.array_equal(got, local_any)


def test_shuffle_mode_matches_mapside(spark, tokseq_df):
    """mode='shuffle' (salted raw-row repartition) must produce the
    exact same state as the map-side combine path."""
    factory = bloom_factory(capacity=300_000, fp=0.001)
    update = bloom_ngram_updater(NGRAM)
    a = collect_sketch(
        sketch_agg(tokseq_df, factory, update, BloomSketch, mode="mapside"), BloomSketch
    )
    b = collect_sketch(
        sketch_agg(tokseq_df, factory, update, BloomSketch, mode="shuffle", salt=4), BloomSketch
    )
    np.testing.assert_array_equal(a.blocks, b.blocks)
    assert a.n_inserted == b.n_inserted


def test_null_group_keys_reach_a_sketch(spark):
    """Rows with a null group key must be sketched under the sentinel
    group, not silently dropped (ADVICE: pandas groupby dropna)."""
    import pandas as pd

    from marker_spark.agg import NULL_KEY
    from marker_spark.kernels import bloom_factory, bloom_binary_updater

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a", "a", None, None, None], "v": list("vwxyz")}),
        schema="g string, v string",
    ).repartition(2)
    out = sketch_agg(df, bloom_factory(1000, 0.01), bloom_binary_updater("v"),
                     BloomSketch, group_cols=["g"])
    sketches = collect_sketches(out, BloomSketch, ["g"])
    assert (NULL_KEY,) in sketches
    null_sk = sketches[(NULL_KEY,)]
    assert null_sk.n_inserted == 3
    assert null_sk.contains([b"x", b"y", b"z"]).all()
    assert sketches[("a",)].n_inserted == 2


def test_encode_series_null_cells():
    """A bytes marker column with a stray NULL must encode, not crash
    (regression: the vectorized path chose by first cell and len(None)
    blew up in pad_bytes)."""
    import pandas as pd

    from marker_spark.kernels import encode_series

    assert encode_series(pd.Series([b"abc", None, b"x"])) == [b"abc", b"None", b"x"]
    assert encode_series(pd.Series([None, b"abc"])) == [b"None", b"abc"]
    assert encode_series(pd.Series([None, None], dtype=object)) == [b"None", b"None"]
    assert encode_series(pd.Series(["a", None])) == [b"a", b"None"]
    assert encode_series(pd.Series([], dtype=object)) == []
