"""Vectorized update kernels binding sketches to the tokenized-sequence
schema (doc_id string, tokens array<int32>, n_tok int32, source string),
plus probe-side pandas UDF builders.

Every kernel consumes a whole pandas/Arrow batch and runs numpy-only
math — no per-row Python in the hot path (BASELINE.json:input_hint).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd

from .hashing import mmh3_fixed_width, mmh3_offsets
from .ngrams import list_column_to_flat, ngram_bytes
from .params import BloomParams
from .sketches.bloom import BloomSketch


# --- Arrow-native batch access ------------------------------------------------

def arrow_tokens_view(batch, token_col: str = "tokens"):
    """Zero-copy-ish view of a RecordBatch's token column:
    (flat int32 values, int64 offsets).  No per-row Python objects."""
    import pyarrow as pa

    col = batch.column(batch.schema.get_field_index(token_col))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # Slice offsets are relative to the values buffer of the parent.
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat.astype(np.int32, copy=False), offsets


def arrow_str_codes(batch, col_name: str):
    """Group codes for a string column: (codes int64 per row, uniques list).

    Null keys map to a trailing ``agg.NULL_KEY`` group instead of
    factorize's -1 sentinel, so callers can index partial-state arrays
    directly and null-keyed rows still reach a sketch.  The sentinel is
    imported (not re-hardcoded) so the two code paths can never drift."""
    from .agg import NULL_KEY

    arr = batch.column(batch.schema.get_field_index(col_name))
    codes, uniques = pd.factorize(arr.to_pandas(), sort=True)
    codes = codes.astype(np.int64)
    uniques = [str(u) for u in uniques]
    if (codes < 0).any():
        codes = np.where(codes < 0, len(uniques), codes)
        uniques = uniques + [NULL_KEY]
    return codes, uniques


# --- updaters (sketch, batch) -> None ---------------------------------------

def encode_series(s: pd.Series) -> list[bytes]:
    """Coerce a marker column to a list of bytes without a per-row
    Python comprehension: bytes cells pass through; everything else
    goes through the C-level ``Series.astype(str).str.encode`` path.
    The path is chosen from the first NON-NULL cell, and null cells
    encode as b"None" (matching the historical str(v).encode behavior)
    — a batch of bytes markers with a stray NULL must not crash the
    task.  Spark columns are type-homogeneous so the fast path always
    wins there, but the helper also sees raw pandas Series (foreachBatch
    / probe paths), where a MIXED bytes+str batch falls back to a
    per-row isinstance dispatch instead of crashing (bytes(str)) or
    silently encoding a bytes repr (str(bytes))."""
    if len(s) == 0:
        return []
    # Homogeneity check via pandas' C-level type sniffer: ~10ms/M rows
    # vs ~100-300ms/M for an interpreted isinstance scan (measured) —
    # this runs on every Bloom insert/lookup batch, so the check must
    # not cost more than the encode it guards.
    kind = pd.api.types.infer_dtype(s, skipna=True)
    if kind == "empty":  # all null
        return [b"None"] * len(s)
    if kind == "bytes":
        na = s.isna()
        if na.any():
            return [b"None" if n else bytes(v) for v, n in zip(s, na)]
        return list(s)
    if not kind.startswith("mixed"):
        # string / integer / floating / boolean / ... — one C-level
        # encode pass; nulls become b'None' via astype(str)
        return list(s.astype(str).str.encode("utf-8"))
    # mixed batch (bytes alongside str/other): per-row dispatch
    na = s.isna()
    return [
        b"None" if n
        else (bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8"))
        for v, n in zip(s, na)
    ]


def bloom_ngram_updater(n: int, token_col: str = "tokens") -> Callable[[Any, pd.DataFrame], None]:
    """Insert every token n-gram of each row into a Bloom sketch."""

    def update(sk: BloomSketch, pdf: pd.DataFrame) -> None:
        flat, offsets = list_column_to_flat(pdf[token_col])
        mat, _ = ngram_bytes(flat, offsets, n)
        if len(mat):
            sk.insert_fixed_width(mat)

    return update


def bloom_binary_updater(col: str) -> Callable[[Any, pd.DataFrame], None]:
    """Insert a binary/string column's byte values (reference marker path)."""

    def update(sk: BloomSketch, pdf: pd.DataFrame) -> None:
        sk.insert(encode_series(pdf[col]))

    return update


def bloom_factory(capacity: int, fp: float) -> Callable[[], BloomSketch]:
    params = BloomParams.solve(capacity, fp)
    return lambda: BloomSketch(params.m, params.k)


# --- probe-side pandas UDFs ---------------------------------------------------

def make_ngram_membership_udf(sketch_bytes: bytes, n: int):
    """Returns a pandas UDF tokens:array<int32> -> boolean ("does this row
    contain at least one n-gram present in the sketch"), plus an
    all-ngrams variant.  The serialized sketch ships to executors inside
    the UDF closure (Spark broadcasts task binaries); deserialized once
    per worker via lazy init.
    """
    from pyspark.sql.functions import pandas_udf

    state: dict[str, BloomSketch] = {}

    def _sketch() -> BloomSketch:
        sk = state.get("sk")
        if sk is None:
            sk = state["sk"] = BloomSketch.from_bytes(sketch_bytes)
        return sk

    @pandas_udf("boolean")
    def any_ngram_in(tokens: pd.Series) -> pd.Series:
        sk = _sketch()
        flat, offsets = list_column_to_flat(tokens)
        mat, per_doc = ngram_bytes(flat, offsets, n)
        hits = sk.contains_fixed_width(mat) if len(mat) else np.empty(0, dtype=bool)
        # any() per doc, vectorized via add.reduceat over doc segments
        out = np.zeros(len(tokens), dtype=bool)
        nz = per_doc > 0
        if hits.size:
            seg_starts = np.concatenate(([0], np.cumsum(per_doc)[:-1]))
            sums = np.add.reduceat(hits.astype(np.int64), seg_starts[nz])
            out[nz] = sums > 0
        return pd.Series(out)

    return any_ngram_in


def make_marker_membership_udf(sketch_bytes: bytes):
    """pandas UDF binary -> boolean: exact reference lookup semantics
    (is this byte-string marker in the filter)."""
    from pyspark.sql.functions import pandas_udf

    state: dict[str, BloomSketch] = {}

    @pandas_udf("boolean")
    def marker_in(data: pd.Series) -> pd.Series:
        sk = state.get("sk")
        if sk is None:
            sk = state["sk"] = BloomSketch.from_bytes(sketch_bytes)
        return pd.Series(sk.contains(encode_series(data)))

    return marker_in
