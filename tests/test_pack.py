"""Sequence packing: the distributed prefix sum must be invariant to
where the sampled range boundaries land, agree with a plain Python
cumsum, and handle zero-token documents."""

from __future__ import annotations

import hashlib

from marker_spark.ops.pack import pack_sequences


def _brute(rows, budget):
    ordered = sorted(rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    out, acc = {}, 0
    for did, n in ordered:
        start, end = acc, acc + n - 1
        out[did] = (
            start,
            start // budget,
            max(end, start) // budget,
        )
        acc += n
    return out


def test_packing_matches_python_cumsum_and_is_partition_invariant(spark):
    rows = [(i, (i * 37) % 90) for i in range(60)]  # includes n_tok == 0
    assert any(n == 0 for _, n in rows)
    df = spark.createDataFrame(rows, "doc_id int, n_tok int")
    want = _brute(rows, budget=100)
    results = []
    for n_parts in (1, 5):
        got = {
            r["doc_id"]: (r["start_tok"], r["first_bin"], r["last_bin"])
            for r in pack_sequences(
                df, "n_tok", budget=100, num_partitions=n_parts
            ).collect()
        }
        assert got == want, n_parts
        results.append(got)
    assert results[0] == results[1]


def test_packing_rejects_nonpositive_budget(spark):
    import pytest

    df = spark.createDataFrame([(1, 5)], "doc_id int, n_tok int")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "n_tok", budget=0)
