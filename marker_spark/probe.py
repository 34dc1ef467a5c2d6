"""Read-side: probe DataFrames against a distributed sketch table.

The write side produces a sketch table (group..., sketch binary) —
parquet/Iceberg rows, one per (source, bucket, ...).  This module joins
probe rows to their group's sketch and evaluates membership/estimates
without collecting states to the driver: the sketch table is small
relative to probes, so Spark broadcasts it, and each Python task
deserializes each distinct sketch ONCE per batch and evaluates its
probes vectorized (grouped by sketch identity inside the UDF).

This is the distributed generalization of the reference's reader
process: attach to published filter state, answer membership
(/root/reference/markercache.cpp:143-152,161-195) — with a sketch
table instead of a shared-memory segment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .agg import SKETCH_COL, unpack_state
from .sketches.bloom import BloomSketch


def _grouped_by_sketch(sketch: pd.Series):
    """Group row indices by identical sketch payloads at O(1) per-row
    cost: the dict key samples (length, head 32B, middle 16B, tail 16B)
    of the serialized state instead of hashing the full payload — each
    row's cell is a distinct bytes object after the broadcast join, so
    keying on the payload itself would hash (and compare) the whole
    multi-hundred-KB state once PER ROW.  Distinct zlib-compressed
    states colliding on all three sampled sections is negligible (a
    compressed stream differing anywhere diverges through the rest);
    yields (payload, row indices) pairs."""
    groups: dict[tuple, list] = {}
    for i, sk in enumerate(sketch):
        if sk is None:
            continue
        n = len(sk)
        key = (n, bytes(sk[:32]), bytes(sk[n // 2 : n // 2 + 16]), bytes(sk[-16:]))
        entry = groups.get(key)
        if entry is None:
            groups[key] = [bytes(sk), [i]]
        else:
            entry[1].append(i)
    return {payload: idxs for payload, idxs in groups.values()}


def make_pairwise_marker_membership_udf():
    """pandas UDF (sketch binary, marker binary/string) -> boolean."""

    @F.pandas_udf("boolean")
    def member(sketch: pd.Series, marker: pd.Series) -> pd.Series:
        from .kernels import encode_series

        out = np.zeros(len(marker), dtype=bool)
        for sk_bytes, idxs in _grouped_by_sketch(sketch).items():
            bf = unpack_state(BloomSketch, sk_bytes)
            out[idxs] = bf.contains(encode_series(marker.iloc[idxs]))
        return pd.Series(out)

    return member


def make_pairwise_ngram_membership_udf(n: int = 3):
    """pandas UDF (sketch binary, tokens array<int>) -> boolean: does
    the row contain at least one n-gram present in its group's sketch."""
    from .hashing import mmh3_ngram_i32
    from .ngrams import list_column_to_flat, ngram_starts

    @F.pandas_udf("boolean")
    def any_ngram(sketch: pd.Series, tokens: pd.Series) -> pd.Series:
        out = np.zeros(len(tokens), dtype=bool)
        for sk_bytes, idxs in _grouped_by_sketch(sketch).items():
            bf = unpack_state(BloomSketch, sk_bytes)
            flat, offsets = list_column_to_flat(tokens.iloc[idxs])
            starts, per_doc = ngram_starts(offsets, n)
            if len(starts) == 0:
                continue
            h1, h2 = mmh3_ngram_i32(flat, starts, n)
            hits = bf.contains_hashes(h1, h2)
            seg = np.zeros(len(idxs), dtype=np.int64)
            np.cumsum(per_doc[:-1], out=seg[1:])
            nz = per_doc > 0
            sums = np.add.reduceat(hits.astype(np.int64), seg[nz]) if hits.size else None
            res = np.zeros(len(idxs), dtype=bool)
            if sums is not None:
                res[nz] = sums > 0
            out[np.asarray(idxs)] = res
        return pd.Series(out)

    return any_ngram


def probe_sketch_table(
    probe_df: DataFrame,
    sketch_table: DataFrame,
    group_cols: list[str],
    marker_col: str | None = None,
    token_col: str | None = None,
    ngram: int = 3,
    result_col: str = "found",
) -> DataFrame:
    """Join probes to their group's sketch (broadcast — the sketch
    table has one row per group) and evaluate membership.

    Probes whose group has no sketch get False (nothing was inserted
    for that group)."""
    st = F.broadcast(sketch_table.select(*group_cols, SKETCH_COL))
    joined = probe_df.join(st, on=group_cols, how="left")
    if marker_col is not None:
        udf = make_pairwise_marker_membership_udf()
        col = udf(F.col(SKETCH_COL), F.col(marker_col))
    elif token_col is not None:
        udf = make_pairwise_ngram_membership_udf(ngram)
        col = udf(F.col(SKETCH_COL), F.col(token_col))
    else:
        raise ValueError("need marker_col or token_col")
    return joined.withColumn(
        result_col, F.when(F.col(SKETCH_COL).isNotNull(), col).otherwise(F.lit(False))
    ).drop(SKETCH_COL)
