"""Read-side: probe DataFrames against a distributed sketch table.

The write side produces a sketch table (group..., sketch binary) —
parquet/Iceberg rows, one per (source, bucket, ...).  This module
evaluates membership/estimates for probe rows WITHOUT the sketch bytes
ever entering the probe plan: the per-group state dict is bounded
(one row per group — the same volume the reference's reader process
maps into its address space), so it is collected once, shipped to
executors via a Spark broadcast, and looked up inside the UDF keyed by
the row's group columns.  The alternative — a broadcast JOIN attaching
the blob to every probe row — materializes each row's copy of the
multi-hundred-KB state through the JVM→Python Arrow path,
O(probes × state_bytes) movement (the repo's measured read-side
scale-killer; CLAUDE.md round-3 decisions).

This is the distributed generalization of the reference's reader
process: attach to published filter state, answer membership
(/root/reference/markercache.cpp:143-152,161-195) — with a sketch
table instead of a shared-memory segment.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .agg import SKETCH_COL, unpack_state
from .sketches.bloom import BloomSketch


def _norm_key(v):
    """Normalize a group-key cell for dict lookup: pandas surfaces SQL
    NULL as None or NaN depending on dtype; the collected state dict
    uses None."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.generic):
        return v.item()
    return v


def _group_rows(key_cols: tuple[pd.Series, ...]):
    """Yield (key_tuple, row_positions) for each distinct group-key
    combination in the batch.  Cost is O(rows) over SMALL key cells
    (strings/ints), never over sketch payloads."""
    n = len(key_cols[0])
    if n == 0:
        return
    if len(key_cols) == 1:
        codes, uniques = pd.factorize(key_cols[0], sort=False)
        for gi, u in enumerate(uniques):
            yield (_norm_key(u),), np.flatnonzero(codes == gi)
        na = codes < 0
        if na.any():
            yield (None,), np.flatnonzero(na)
        return
    df = pd.DataFrame({i: c.reset_index(drop=True) for i, c in enumerate(key_cols)})
    for key, idxs in df.groupby(list(df.columns), dropna=False, sort=False).indices.items():
        if not isinstance(key, tuple):
            key = (key,)
        yield tuple(_norm_key(k) for k in key), np.asarray(idxs)


#: Collecting more serialized state than this is almost certainly a
#: mis-specified group key (e.g. grouping by a high-cardinality column):
#: fail loudly instead of OOMing the driver / flooding the broadcast.
MAX_STATE_BYTES = 1 << 30  # 1 GiB


def collect_sketch_states(
    sketch_table: DataFrame, group_cols: list[str], max_bytes: int = MAX_STATE_BYTES
) -> dict[tuple, bytes]:
    """Collect the bounded per-group serialized states once:
    O(#groups × state_bytes), the exact volume the reference reader
    mmaps.  Duplicate group rows keep the last.

    The "bounded" assumption is enforced: a cheap pre-pass sums
    ``length(sketch)`` (scalar aggregate, no payload movement) and
    raises if the total exceeds ``max_bytes`` — an unexpectedly wide
    sketch table surfaces as a clear error instead of a driver OOM.

    Keys are CAST TO STRING on the Spark side: a nullable int64 group
    column reaches the pandas UDF as float64, where keys above 2^53
    would silently collide or miss the dict — string keys are exact at
    any magnitude and NULL stays None through both paths."""
    # persist around the guard + collect pair: the caller often hands
    # in the UNPERSISTED build plan, and without this the guard's
    # length aggregation would execute the whole two-phase sketch
    # build once and the row collect would execute it AGAIN
    was_cached = sketch_table.is_cached
    if not was_cached:
        sketch_table.persist()
    try:
        total = sketch_table.agg(
            F.sum(F.length(F.col(SKETCH_COL))).alias("b"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        if total["b"] is not None and total["b"] > max_bytes:
            raise ValueError(
                f"sketch table holds {total['b']} serialized state bytes across "
                f"{total['n']} groups, above the {max_bytes}-byte collect cap — "
                "the per-group state dict would not be driver/broadcast-bounded. "
                "Check the group columns (high-cardinality key?) or raise "
                "max_bytes explicitly."
            )
        rows = sketch_table.select(
            *[F.col(c).cast("string") for c in group_cols], SKETCH_COL
        ).collect()
    finally:
        if not was_cached:
            sketch_table.unpersist()
    k = len(group_cols)
    return {
        tuple(_norm_key(r[i]) for i in range(k)): bytes(r[k])
        for r in rows
        if r[k] is not None
    }


def make_keyed_marker_membership_udf(bcast, n_keys: int):
    """pandas UDF (group cols..., marker) -> boolean.  States come from
    the broadcast dict; each group's sketch is deserialized once per
    worker (memo dict, bounded by #groups) and evaluated vectorized."""
    memo: dict[tuple, BloomSketch | None] = {}

    @F.pandas_udf("boolean")
    def member(*cols: pd.Series) -> pd.Series:
        from .kernels import encode_series

        marker = cols[-1]
        out = np.zeros(len(marker), dtype=bool)
        states = bcast.value
        for key, idxs in _group_rows(cols[:n_keys]):
            bf = memo.get(key)
            if bf is None and key not in memo:
                payload = states.get(key)
                bf = memo[key] = (
                    unpack_state(BloomSketch, payload) if payload is not None else None
                )
            if bf is None:
                continue  # no sketch published for this group -> False
            out[idxs] = bf.contains(encode_series(marker.iloc[idxs]))
        return pd.Series(out)

    return member


def make_keyed_ngram_membership_udf(bcast, n_keys: int, n: int = 3):
    """pandas UDF (group cols..., tokens array<int>) -> boolean: does
    the row contain at least one n-gram present in its group's sketch."""
    from .hashing import mmh3_ngram_i32
    from .ngrams import list_column_to_flat, ngram_starts

    memo: dict[tuple, BloomSketch | None] = {}

    @F.pandas_udf("boolean")
    def any_ngram(*cols: pd.Series) -> pd.Series:
        tokens = cols[-1]
        out = np.zeros(len(tokens), dtype=bool)
        states = bcast.value
        for key, idxs in _group_rows(cols[:n_keys]):
            bf = memo.get(key)
            if bf is None and key not in memo:
                payload = states.get(key)
                bf = memo[key] = (
                    unpack_state(BloomSketch, payload) if payload is not None else None
                )
            if bf is None:
                continue
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
    """Evaluate probe rows against their group's sketch with zero
    sketch bytes in the probe plan: the bounded per-group state dict is
    collected once and broadcast; the UDF keys into it by the row's
    group columns.  Probes whose group has no sketch get False (nothing
    was inserted for that group)."""
    from .cacheutil import register

    states = collect_sketch_states(sketch_table, group_cols)
    # registered so the session owner's release_all() drops executor
    # copies between queries (re-execution re-fetches from the driver)
    bcast = register(probe_df.sparkSession.sparkContext.broadcast(states))
    keys = [F.col(c).cast("string") for c in group_cols]  # match state keys
    if marker_col is not None:
        udf = make_keyed_marker_membership_udf(bcast, len(group_cols))
        col = udf(*keys, F.col(marker_col))
    elif token_col is not None:
        udf = make_keyed_ngram_membership_udf(bcast, len(group_cols), ngram)
        col = udf(*keys, F.col(token_col))
    else:
        raise ValueError("need marker_col or token_col")
    return probe_df.withColumn(result_col, col)
