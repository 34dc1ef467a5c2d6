"""Deterministic bottom-k sampling: uniformity, mergeability,
rerun-stability, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from marker_spark.ops.sample import bottom_k_sample, stratified_bottom_k

SF_DIR = "/root/testdata/sf0.001"


def test_bottom_k_is_mergeable_and_stable(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s1 = {r["doc_id"] for r in bottom_k_sample(docs, 40).select("doc_id").collect()}
    # rerun-stable
    s2 = {r["doc_id"] for r in bottom_k_sample(docs, 40).select("doc_id").collect()}
    assert s1 == s2
    # mergeable: bottom-k of per-half bottom-k == global bottom-k
    a = bottom_k_sample(docs.where(F.col("doc_id") % 2 == 0), 40)
    b = bottom_k_sample(docs.where(F.col("doc_id") % 2 == 1), 40)
    merged = {r["doc_id"] for r in bottom_k_sample(a.unionByName(b), 40).select("doc_id").collect()}
    assert merged == s1
    # re-salting draws a different sample
    s3 = {r["doc_id"] for r in bottom_k_sample(docs, 40, salt="other").select("doc_id").collect()}
    assert s3 != s1


def test_stratified_exact_k_per_group(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = stratified_bottom_k(docs, k_per_group=3, group_col="source")
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, n in counts.items():
        assert n == min(3, full[src])
    assert set(counts) == set(full)


def test_bottom_k_plan_is_take_ordered(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = bottom_k_sample(docs, 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no full sort


def test_weighted_interleave_prefix_proportions_and_engine_parity(spark):
    """Stride-scheduled mixing: every prefix of the stream holds each
    source within 1 doc of its configured proportion, and the full
    ordering replays exactly in DuckDB (same md5 ranks, same i/w
    virtual times)."""
    import duckdb

    from marker_spark.ops.sample import weighted_interleave

    # supply matches the weights (240:120:120 for .5:.25:.25): the
    # prefix-proportion property holds only while every source still
    # has docs left — a mismatched corpus degrades gracefully but is
    # not what this asserts
    rows = [
        (f"{s}-{i}", s)
        for s, n in (("web", 240), ("code", 120), ("math", 120))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    weights = {"web": 0.5, "code": 0.25, "math": 0.25}
    mixed = weighted_interleave(df, weights, salt="s42")
    stream = [
        (r["doc_id"], r["source"])
        for r in mixed.orderBy("mix_vt", "source", "doc_id").collect()
    ]
    assert len(stream) == 480
    for L in (4, 40, 100, 240, 480):
        prefix = stream[:L]
        for s, w in weights.items():
            cnt = sum(1 for _, g in prefix if g == s)
            assert abs(cnt - w * L) <= 1, (L, s, cnt, w * L)
    con = duckdb.connect()
    want = con.execute("""
        WITH docs AS (
            SELECT s || '-' || CAST(i AS VARCHAR) AS doc_id, s AS source
            FROM (VALUES ('web', 240), ('code', 120), ('math', 120)) AS t(s, n),
                 unnest(generate_series(0, n - 1)) AS u(i)
        ), ranked AS (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5(doc_id || '|s42')) AS i
            FROM docs
        )
        SELECT doc_id, source FROM ranked
        ORDER BY i / (CASE source WHEN 'web' THEN 0.5 ELSE 0.25 END),
                 source, doc_id
    """).fetchall()
    assert stream == [tuple(r) for r in want]


def test_weighted_interleave_drops_unlisted_and_rejects_bad_weights(spark):
    import pytest

    from marker_spark.ops.sample import weighted_interleave

    df = spark.createDataFrame(
        [("a", "web"), ("b", "spam")], "doc_id string, source string"
    )
    got = weighted_interleave(df, {"web": 1.0}).collect()
    assert [r["source"] for r in got] == ["web"]
    with pytest.raises(ValueError, match="positive"):
        weighted_interleave(df, {"web": 0.0})
