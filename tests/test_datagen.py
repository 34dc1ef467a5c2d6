"""Per-row invariant tests for the synthetic tokenized-sequence table
(BASELINE.json:input_hint: token-array equality).

* regeneration determinism: same seed -> byte-identical token arrays;
* composition: generating disjoint row ranges separately equals one
  big generation (what makes distributed generation sound);
* cross-engine: Spark and DuckDB read the same parquet and see exactly
  equal token arrays, row by row.
"""

from __future__ import annotations

import numpy as np
import pytest

from marker_spark.datagen import SOURCES, gen_tokenized_sequences


def test_regeneration_exact_equality():
    a = gen_tokenized_sequences(500, seed=42)
    b = gen_tokenized_sequences(500, seed=42)
    assert a.equals(b)


def test_different_seed_differs():
    a = gen_tokenized_sequences(100, seed=42)
    b = gen_tokenized_sequences(100, seed=43)
    assert not a.equals(b)


def test_range_composition():
    whole = gen_tokenized_sequences(300, seed=42)
    parts = [
        gen_tokenized_sequences(100, seed=42, start=0),
        gen_tokenized_sequences(150, seed=42, start=100),
        gen_tokenized_sequences(50, seed=42, start=250),
    ]
    import pyarrow as pa

    stitched = pa.concat_tables(parts)
    assert whole.to_pandas()["doc_id"].tolist() == stitched.to_pandas()["doc_id"].tolist()
    wt = whole.to_pandas()["tokens"]
    st = stitched.to_pandas()["tokens"]
    for x, y in zip(wt, st):
        np.testing.assert_array_equal(x, y)


def test_schema_and_invariants():
    t = gen_tokenized_sequences(1000, seed=42)
    pdf = t.to_pandas()
    assert list(t.schema.names) == ["doc_id", "tokens", "n_tok", "source"]
    assert str(t.schema.field("tokens").type) == "list<item: int32>"
    assert str(t.schema.field("n_tok").type) == "int32"
    # n_tok == len(tokens) always
    assert all(len(tok) == n for tok, n in zip(pdf["tokens"], pdf["n_tok"]))
    assert pdf["n_tok"].between(8, 2048).all()
    assert set(pdf["source"]).issubset(set(SOURCES))
    # zipf skew: hottest source should carry a large share
    share = pdf["source"].value_counts(normalize=True).iloc[0]
    assert 0.25 <= share <= 0.55


def test_cross_engine_token_equality(spark, tokseq_path):
    import duckdb

    sp = spark.read.parquet(tokseq_path).orderBy("doc_id").collect()
    dd = duckdb.sql(
        f"SELECT doc_id, tokens FROM read_parquet('{tokseq_path}') ORDER BY doc_id"
    ).fetchall()
    gen = gen_tokenized_sequences(2000, seed=42).to_pandas().sort_values("doc_id")
    assert len(sp) == len(dd) == len(gen)
    for srow, drow, gtok in zip(sp, dd, gen["tokens"]):
        assert srow["doc_id"] == drow[0]
        np.testing.assert_array_equal(np.asarray(srow["tokens"]), np.asarray(drow[1]))
        np.testing.assert_array_equal(np.asarray(srow["tokens"]), gtok)
