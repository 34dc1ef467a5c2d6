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
