"""Sequence packing: the distributed prefix sum must be invariant to
where the sampled range boundaries land, agree with a plain Python
cumsum, and handle zero-token documents."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

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


def test_shard_assignments_exact_oracle_and_balance(spark):
    """shard_assignments vs an independent DuckDB replay of the same
    permutation (row_number over md5(seed ':' id)): identical
    (shard, pos) for every doc, shard sizes within 1 of each other,
    partition-count invariant, and deterministic across seeds."""
    import duckdb

    from marker_spark.ops.pack import shard_assignments

    rows = [(i,) for i in range(257)]  # deliberately not divisible by 8
    df = spark.createDataFrame(rows, "doc_id int")
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute("""
            SELECT doc_id,
                   (rank - 1) % 8 AS shard,
                   (rank - 1) // 8 AS pos
            FROM (
                SELECT doc_id, ROW_NUMBER() OVER (
                    ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
                ) AS rank
                FROM (SELECT unnest(generate_series(0, 256)) AS doc_id)
            )
        """).fetchall()
    }
    for n_parts in (1, 7):
        got = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in shard_assignments(
                df, n_shards=8, seed=42, num_partitions=n_parts
            ).collect()
        }
        assert got == want, n_parts
    sizes = {}
    for s, _ in got.values():
        sizes[s] = sizes.get(s, 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1, sizes
    # a different seed is a different permutation
    got7 = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assignments(df, n_shards=8, seed=7).collect()
    }
    from marker_spark.cacheutil import release_all

    release_all()  # before the assert (failure must not leak persists)
    assert got7 != want


def test_shard_assignments_never_single_partition(spark):
    """The global rank must come from the distributed prefix sum, not
    an accidental Window-without-partitionBy serialization."""
    from marker_spark.ops.pack import shard_assignments

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id int")
    plan = shard_assignments(df, n_shards=4)._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    from marker_spark.cacheutil import release_all

    release_all()
    assert "SinglePartition" not in plan


def test_budget_selection_semantics(spark):
    """Keep iff higher-ranked total < budget: the straddling doc is
    kept, everything after it dropped; ties impossible (id breaks)."""
    from marker_spark.cacheutil import release_all
    from marker_spark.ops.pack import budget_selection

    rows = [  # (doc_id, n_tok, score) — rank order: 3, 1, 2, 4
        (1, 40, 0.8), (2, 50, 0.5), (3, 30, 0.9), (4, 10, 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long, score double")
    kept = {
        r["doc_id"]: r["cum_before"]
        for r in budget_selection(df, "n_tok", budget=80, score_col="score").collect()
    }
    # rank cumsums: 3 -> 0, 1 -> 30, 2 -> 70 (straddles 80: kept), 4 -> 120
    assert kept == {3: 0, 1: 30, 2: 70}
    release_all()


def test_budget_selection_matches_single_window(spark):
    """The distributed prefix-sum must equal the naive global-window
    cumsum on the fixture corpus, at a partition count that forces
    multiple range partitions."""
    from pyspark.sql import Window

    from marker_spark.cacheutil import release_all
    from marker_spark.ops.pack import budget_selection
    from marker_spark.ops.text import with_text_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = with_text_stats(docs).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_tok"),
        F.round("quality_score", 6).alias("q"),
    )
    got = {
        (r["doc_id"], r["cum_before"])
        for r in budget_selection(
            stats, "n_tok", budget=2000, score_col="q", num_partitions=7
        ).collect()
    }
    w = Window.orderBy(F.desc("q"), "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = stats.withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    ).where(F.col("cum_before") < 2000)
    want = {(r["doc_id"], r["cum_before"]) for r in naive.collect()}
    assert got == want and got
    release_all()


def test_budget_selection_edge_cases(spark):
    import pytest as _pytest

    from marker_spark.cacheutil import release_all
    from marker_spark.ops.pack import budget_selection

    df = spark.createDataFrame(
        [(1, 5, 1.0), (2, 5, 0.5)], "doc_id long, n_tok long, score double"
    )
    # budget beyond the corpus keeps everything
    assert budget_selection(df, "n_tok", budget=10_000, score_col="score").count() == 2
    with _pytest.raises(ValueError):
        budget_selection(df, "n_tok", budget=0, score_col="score")
    release_all()


def test_group_budget_selection_semantics(spark):
    """Per-group straddle rule; unlisted groups dropped; int budget
    broadcasts to every group."""
    from marker_spark.cacheutil import release_all
    from marker_spark.ops.pack import group_budget_selection

    rows = [
        # group a, rank order 2, 1: cums 0, 30
        (1, "a", 40, 0.5), (2, "a", 30, 0.9),
        # group b, rank order 3, 4: cums 0, 60
        (3, "b", 60, 0.8), (4, "b", 10, 0.2),
        # group c: unlisted in the dict case
        (5, "c", 5, 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tok long, score double")
    kept = {
        r["doc_id"]: r["cum_before"]
        for r in group_budget_selection(
            df, "n_tok", {"a": 50, "b": 61}, "score", group_col="grp"
        ).collect()
    }
    # a: 2 (cum 0) kept, 1 (cum 30 < 50) kept (straddles); b: 3 kept,
    # 4 (cum 60 < 61) kept; c dropped (no budget)
    assert kept == {2: 0, 1: 30, 3: 0, 4: 60}
    kept_int = group_budget_selection(df, "n_tok", 1, "score", group_col="grp")
    # budget 1: exactly the top-ranked doc of EVERY group survives
    assert {r["doc_id"] for r in kept_int.collect()} == {2, 3, 5}
    release_all()


def test_group_budget_selection_null_group(spark):
    """NULL group values are a REAL group (the r7 eqNullSafe rule):
    the offsets loop has always handled None keys, but the stitch
    joins were null-unsafe and silently dropped the rows (r9 ADVICE).
    Both budget forms must keep them."""
    from marker_spark.cacheutil import release_all
    from marker_spark.ops.pack import group_budget_selection

    rows = [(1, "a", 10, 0.9), (2, None, 10, 0.8), (3, None, 20, 0.5)]
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, n_tok long, score double"
    )
    kept = {
        r["doc_id"]: r["cum_before"]
        for r in group_budget_selection(
            df, "n_tok", 15, "score", group_col="grp"
        ).collect()
    }
    # NULL group: 2 (cum 0) kept, 3 (cum 10 < 15, straddles) kept
    assert kept == {1: 0, 2: 0, 3: 10}
    kept_none = {
        r["doc_id"]: r["cum_before"]
        for r in group_budget_selection(
            df, "n_tok", {None: 15}, "score", group_col="grp"
        ).collect()
    }
    assert kept_none == {2: 0, 3: 10}
    release_all()


def test_group_budget_selection_matches_per_group_window(spark):
    """Distributed per-group prefix sum == naive per-group window on
    the fixture, at a partition count that forces group spans."""
    from pyspark.sql import Window

    from marker_spark.cacheutil import release_all
    from marker_spark.ops.pack import group_budget_selection
    from marker_spark.ops.text import with_text_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = with_text_stats(docs).select(
        "doc_id", "source",
        F.col("n_words").cast("long").alias("n_tok"),
        F.round("quality_score", 6).alias("q"),
    )
    got = {
        (r["doc_id"], r["cum_before"])
        for r in group_budget_selection(
            stats, "n_tok", 500, "q", group_col="source", num_partitions=7
        ).collect()
    }
    w = Window.partitionBy("source").orderBy(F.desc("q"), "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = stats.withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    ).where(F.col("cum_before") < 500)
    want = {(r["doc_id"], r["cum_before"]) for r in naive.collect()}
    assert got == want and got
    release_all()
