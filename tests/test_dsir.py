"""DSIR importance-weighted selection (ops/dsir.py): weights match a
pure-Python replica bucket-for-bucket, selection is deterministic and
biased toward the target domain, and the full-pipeline exact oracle
runs in tests/test_retired_oracles.py (dsir_selection)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from marker_spark.ops.dsir import (
    dsir_importance_weights,
    dsir_log_ratio_table,
    dsir_select,
    hashed_gram_buckets,
)

B = 256  # small bucket space so collisions actually happen in the test


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _bigrams(text: str) -> list[str]:
    ws = text.strip().lower().split()
    return [f"{a} {b}" for a, b in zip(ws, ws[1:])]


@pytest.fixture(scope="module")
def corpus(spark):
    # target-like docs share the target vocab; junk docs use disjoint
    # tokens, so the likelihood ratio must separate the two groups.
    # Sizing matters (prototyped in pure python): the target corpus
    # must carry enough gram mass that add-1 smoothing doesn't drown
    # the signal, and junk must dominate RAW so shared vocab stays
    # target-distinctive (the r9 first-cut fixture had target-like
    # docs over-represented in raw, which correctly flips the ratio).
    target_rows = [(100 + i, "alpha beta gamma delta epsilon zeta " * 10 + str(i % 3))
                   for i in range(6)]
    like_rows = [(i, "alpha beta gamma delta epsilon") for i in range(10)]
    junk_rows = [(50 + i, f"zzz{i} qqq{i} www{i} rrr{i} xxx{i} yyy{i} vvv{i} uuu{i}")
                 for i in range(40)]
    empty_rows = [(95, ""), (96, "oneword")]
    rows = target_rows + like_rows + junk_rows + empty_rows
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    return rows, target_rows, docs, target


def test_weights_match_python_replica(spark, corpus):
    rows, target_rows, docs, target = corpus
    ratio = dsir_log_ratio_table(docs, target, n=2, buckets=B, alpha=1.0)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir_importance_weights(docs, ratio, n=2, buckets=B).collect()
    }

    # python replica
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for _, text in target_rows:
        for g in _bigrams(text):
            b = _bucket(g)
            ct[b] = ct.get(b, 0) + 1
    for _, text in rows:
        for g in _bigrams(text):
            b = _bucket(g)
            cr[b] = cr.get(b, 0) + 1
    n_t, n_r = sum(ct.values()), sum(cr.values())

    def lr(b: int) -> float:
        return math.log((ct.get(b, 0) + 1.0) / (n_t + B)) - math.log(
            (cr.get(b, 0) + 1.0) / (n_r + B)
        )

    assert set(got) == {i for i, _ in rows}  # EVERY doc, incl. empty
    for doc_id, text in rows:
        gs = _bigrams(text)
        want_n, want_w = len(gs), sum(lr(_bucket(g)) for g in gs)
        n, w = got[doc_id]
        assert n == want_n, (doc_id, n, want_n)
        assert w == pytest.approx(want_w, abs=1e-9), (doc_id, w, want_w)
    assert got[95] == (0, 0.0) and got[96] == (0, 0.0)


def test_weights_separate_target_like_from_junk(spark, corpus):
    rows, _, docs, target = corpus
    ratio = dsir_log_ratio_table(docs, target, n=2, buckets=B, alpha=1.0)
    w = {
        r["doc_id"]: r["log_w"] / max(r["n_grams"], 1)
        for r in dsir_importance_weights(docs, ratio, n=2, buckets=B).collect()
    }
    like = [w[i] for i in range(10)]
    junk = [w[50 + i] for i in range(40)]
    assert min(like) > max(junk), (min(like), max(junk))


def test_select_deterministic_without_replacement_and_biased(spark, corpus):
    rows, _, docs, target = corpus
    ratio = dsir_log_ratio_table(docs, target, n=2, buckets=B, alpha=1.0)
    weights = dsir_importance_weights(docs, ratio, n=2, buckets=B)

    a = [r["doc_id"] for r in dsir_select(weights, 8, salt="s1").collect()]
    b = [r["doc_id"] for r in dsir_select(weights, 8, salt="s1").collect()]
    assert a == b and len(set(a)) == 8  # resume-stable, no replacement

    # bias: across independent salts, target-like docs (ids < 10 plus
    # the target docs 100+) dominate the draws over junk (50-59)
    target_like = set(range(10)) | {100 + i for i in range(6)}
    picks_like = picks_junk = 0
    for s in range(8):
        sel = [r["doc_id"] for r in dsir_select(weights, 8, salt=f"t{s}").collect()]
        picks_like += sum(1 for d in sel if d in target_like)
        picks_junk += sum(1 for d in sel if 50 <= d < 90)
    assert picks_like > 4 * max(picks_junk, 1), (picks_like, picks_junk)


def test_gram_stream_keep_empty_covers_population(spark, corpus):
    rows, _, docs, _ = corpus
    grams = hashed_gram_buckets(docs, n=2, buckets=B, keep_empty=True)
    ids = {r["doc_id"] for r in grams.select("doc_id").distinct().collect()}
    assert ids == {i for i, _ in rows}
    sentinel = grams.where(F.col("bucket").isNull()).count()
    assert sentinel == 2  # the empty + one-word docs
