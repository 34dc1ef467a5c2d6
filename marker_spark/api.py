"""High-level one-call sketch aggregations over DataFrames.

The thin wrappers promised in SURVEY.md §2 Part B: each takes a
DataFrame plus column/group parameters and returns a DataFrame of
``(group..., sketch binary)`` (use :func:`marker_spark.collect_sketch`
/ ``collect_sketches`` to materialize driver-side objects, or keep the
table distributed and probe with the UDF builders in
:mod:`marker_spark.kernels`).

Column semantics:
 * ``tokens`` columns (array<int32>) are sketched over their n-grams —
   the engine's marker materialization;
 * ``values`` columns (numeric) feed the quantile sketches;
 * ``marker`` columns (binary/string) are sketched as raw byte strings
   (the reference's exact input type, /root/reference/markercache.h:64-68).
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame

from .agg import sketch_agg
from .kernels import bloom_binary_updater, bloom_ngram_updater
from .ngrams import list_column_to_flat, ngram_bytes
from .params import BloomParams
from .sketches.bloom import BloomSketch
from .sketches.cms import CmsSketch
from .sketches.hll import HllSketch
from .sketches.kll import KllSketch
from .sketches.minhash import MinHashSketch
from .sketches.misra_gries import MisraGriesSketch
from .sketches.tdigest import TDigestSketch
from .sketches.theta import ThetaSketch


def _ngram_updater(update_hashes: Callable[[Any, Any, Any], None], n: int, token_col: str):
    def update(sk, pdf: pd.DataFrame) -> None:
        from .hashing import mmh3_fixed_width

        flat, offsets = list_column_to_flat(pdf[token_col])
        mat, _ = ngram_bytes(flat, offsets, n)
        if len(mat):
            h1, h2 = mmh3_fixed_width(mat)
            update_hashes(sk, h1, h2)

    return update


def bloom_agg(
    df: DataFrame,
    token_col: str | None = "tokens",
    marker_col: str | None = None,
    group_cols: list[str] | None = None,
    capacity: int = 1_000_000,
    fp: float = 0.001,
    ngram: int = 3,
    **agg_kw,
) -> DataFrame:
    """Bloom filter over token n-grams (or raw byte markers) per group."""
    params = BloomParams.solve(capacity, fp)
    factory = lambda: BloomSketch(params.m, params.k)  # noqa: E731
    if marker_col is not None:
        update = bloom_binary_updater(marker_col)
    else:
        update = bloom_ngram_updater(ngram, token_col)
    return sketch_agg(df, factory, update, BloomSketch, group_cols, **agg_kw)


def hll_agg(
    df: DataFrame,
    token_col: str = "tokens",
    group_cols: list[str] | None = None,
    precision: int = 14,
    ngram: int = 3,
    **agg_kw,
) -> DataFrame:
    """HyperLogLog distinct-n-gram counter per group."""
    factory = lambda: HllSketch(p=precision)  # noqa: E731
    update = _ngram_updater(lambda sk, h1, h2: sk.update_hashes(h1), ngram, token_col)
    return sketch_agg(df, factory, update, HllSketch, group_cols, **agg_kw)


def cms_agg(
    df: DataFrame,
    token_col: str = "tokens",
    group_cols: list[str] | None = None,
    depth: int = 5,
    width: int = 1 << 16,
    ngram: int = 1,
    **agg_kw,
) -> DataFrame:
    """Count-min frequency sketch over n-grams (default unigrams)."""
    factory = lambda: CmsSketch(d=depth, w=width)  # noqa: E731
    update = _ngram_updater(lambda sk, h1, h2: sk.update_hashes(h1, h2), ngram, token_col)
    return sketch_agg(df, factory, update, CmsSketch, group_cols, **agg_kw)


def minhash_agg(
    df: DataFrame,
    token_col: str = "tokens",
    group_cols: list[str] | None = None,
    num_perm: int = 128,
    ngram: int = 3,
    seed: int = 42,
    **agg_kw,
) -> DataFrame:
    """MinHash signature per group (cross-group Jaccard estimation)."""
    factory = lambda: MinHashSketch(num_perm=num_perm, seed=seed)  # noqa: E731
    update = _ngram_updater(lambda sk, h1, h2: sk.update_hashes(h1), ngram, token_col)
    return sketch_agg(df, factory, update, MinHashSketch, group_cols, **agg_kw)


def kll_agg(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    **agg_kw,
) -> DataFrame:
    """KLL quantile sketch over a numeric column per group."""
    factory = lambda: KllSketch(k=k)  # noqa: E731

    def update(sk, pdf: pd.DataFrame) -> None:
        sk.update(pdf[value_col].to_numpy(dtype="float64"))

    return sketch_agg(df, factory, update, KllSketch, group_cols, **agg_kw)


def tdigest_agg(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    delta: float = 200.0,
    **agg_kw,
) -> DataFrame:
    """t-digest quantile sketch over a numeric column per group."""
    factory = lambda: TDigestSketch(delta=delta)  # noqa: E731

    def update(sk, pdf: pd.DataFrame) -> None:
        sk.update(pdf[value_col].to_numpy(dtype="float64"))

    return sketch_agg(df, factory, update, TDigestSketch, group_cols, **agg_kw)


def theta_agg(
    df: DataFrame,
    token_col: str = "tokens",
    group_cols: list[str] | None = None,
    k: int = 4096,
    ngram: int = 3,
    **agg_kw,
) -> DataFrame:
    """Theta/KMV sketch per group — distinct counts plus set-operation
    (intersection/difference) estimates between groups."""
    factory = lambda: ThetaSketch(k=k)  # noqa: E731
    update = _ngram_updater(lambda sk, h1, h2: sk.update_hashes(h1), ngram, token_col)
    return sketch_agg(df, factory, update, ThetaSketch, group_cols, **agg_kw)


def mg_agg(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    **agg_kw,
) -> DataFrame:
    """Misra-Gries heavy-hitters summary over an int64 item column per
    group — frequent items WITHOUT a known candidate set (count-min's
    complement), bounded O(k) state.

    Null items are dropped (a nullable long column reaches pandas as
    float64, where a blind int64 cast turns NaN into INT64_MIN — a
    garbage heavy hitter).  Caveat that comes with that pandas float64
    detour: if the column CONTAINS nulls, non-null ids above 2^53 lose
    precision in transit — coalesce/filter upstream when ids are that
    large."""
    factory = lambda: MisraGriesSketch(k=k)  # noqa: E731

    def update(sk, pdf: pd.DataFrame) -> None:
        vals = pdf[item_col].dropna()
        if len(vals):
            sk.update(vals.to_numpy(dtype="int64"))

    return sketch_agg(df, factory, update, MisraGriesSketch, group_cols, **agg_kw)
