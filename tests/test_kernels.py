"""Kernel helper tests (Spark-free): marker encoding + null-group
sentinel consistency."""

from __future__ import annotations

import numpy as np
import pandas as pd

from marker_spark.agg import NULL_KEY
from marker_spark.kernels import encode_series


def test_encode_series_homogeneous_bytes():
    s = pd.Series([b"a", b"bb", b"ccc"])
    assert encode_series(s) == [b"a", b"bb", b"ccc"]


def test_encode_series_homogeneous_str():
    s = pd.Series(["a", "bb", "ccc"])
    assert encode_series(s) == [b"a", b"bb", b"ccc"]


def test_encode_series_nulls():
    assert encode_series(pd.Series([b"a", None, b"c"])) == [b"a", b"None", b"c"]
    assert encode_series(pd.Series(["a", None, "c"])) == [b"a", b"None", b"c"]
    assert encode_series(pd.Series([None, None], dtype=object)) == [b"None", b"None"]
    assert encode_series(pd.Series([], dtype=object)) == []


def test_encode_series_mixed_types():
    """A mixed bytes+str batch (raw pandas Series from foreachBatch /
    probe paths) must encode each cell by its own type (ADVICE r2:
    first-cell dispatch crashed on bytes('x') or encoded a bytes repr)."""
    assert encode_series(pd.Series([b"a", "b", b"c"], dtype=object)) == [b"a", b"b", b"c"]
    assert encode_series(pd.Series(["a", b"b", "c"], dtype=object)) == [b"a", b"b", b"c"]
    assert encode_series(pd.Series(["a", None, b"b", 7], dtype=object)) == [
        b"a", b"None", b"b", b"7",
    ]
    # numeric column still goes through the str path
    assert encode_series(pd.Series([1, 2])) == [b"1", b"2"]


def test_encode_series_bytearray_normalized():
    out = encode_series(pd.Series([bytearray(b"xy"), b"z"], dtype=object))
    assert out == [b"xy", b"z"] and all(type(v) is bytes for v in out)


def test_null_key_single_definition():
    """kernels.arrow_str_codes reuses agg.NULL_KEY rather than its own
    literal, so the sentinels cannot drift (ADVICE r2)."""
    import pyarrow as pa

    from marker_spark.kernels import arrow_str_codes

    batch = pa.record_batch({"g": pa.array(["x", None, "x"])})
    codes, uniques = arrow_str_codes(batch, "g")
    assert uniques[-1] == NULL_KEY
    assert list(codes) == [0, 1, 0]
