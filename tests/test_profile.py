"""Sketch-powered table profiler: the exact fields replay in DuckDB,
the distinct estimate sits inside the HLL bound, and the heavy-hitter
top values match the true top-k wherever the Misra-Gries candidate
guarantee applies (freq > n/(k+1))."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from marker_spark.cacheutil import release_all
from marker_spark.ops.profile import profile_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    """Deterministic skewed fixture: a zipf-ish category column whose
    top values are unambiguously heavy (freq >> n/257), a nullable
    long, and a nullable double."""
    n = 20_000
    i = np.arange(n)
    cat = np.where(i % 2 == 0, "alpha",
          np.where(i % 3 == 0, "beta",
          np.where(i % 5 == 0, "gamma", [f"tail{x}" for x in i])))
    pdf = pd.DataFrame({
        "uid": pd.array([None if x % 100 == 7 else x * 3 for x in i],
                        dtype="Int64"),
        "category": cat,
        "score": [None if x % 50 == 3 else round((x % 997) / 31.0, 6)
                  for x in i],
    })
    df = spark.createDataFrame(
        pdf, schema="uid long, category string, score double"
    )
    return pdf, df


def test_exact_fields_match_duckdb(spark, skewed):
    pdf, df = skewed
    prof = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    release_all()
    con = duckdb.connect()
    con.register("t", pdf)
    for c, is_num in (("uid", True), ("category", False), ("score", True)):
        row = con.execute(f"""
            SELECT COUNT(*) AS n, COUNT(*) - COUNT({c}) AS nn,
                   MIN({c}) AS mn, MAX({c}) AS mx,
                   {'AVG(' + c + ')' if is_num else 'NULL'} AS av
            FROM t
        """).fetchone()
        p = prof[c]
        assert p["n_rows"] == row[0] and p["n_null"] == row[1], c
        if is_num:
            assert p["min_num"] == pytest.approx(float(row[2])), c
            assert p["max_num"] == pytest.approx(float(row[3])), c
            assert p["mean"] == pytest.approx(float(row[4]), rel=1e-9), c
            assert p["min_str"] is None and p["max_str"] is None
        else:
            assert (p["min_str"], p["max_str"]) == (row[2], row[3]), c
            assert p["min_num"] is None and p["max_num"] is None


def test_distinct_estimate_within_hll_bound(spark, skewed):
    _, df = skewed
    prof = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    release_all()
    from pyspark.sql import functions as F

    for c in ("uid", "category", "score"):
        exact = df.select(
            F.countDistinct(F.col(c).cast("string")).alias("d")
        ).collect()[0]["d"]
        # p=14 -> sigma = 1.04/sqrt(16384) ~ 0.81%; allow 3 sigma
        assert abs(prof[c]["distinct_est"] - exact) <= max(3, 0.025 * exact), (
            c, prof[c]["distinct_est"], exact,
        )


def test_top_values_exact_where_mg_guarantee_applies(spark, skewed):
    pdf, df = skewed
    prof = {r["column"]: r.asDict() for r in profile_table(df, top_k=3).collect()}
    release_all()
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute("""
        SELECT category AS value, COUNT(*) AS cnt FROM t
        GROUP BY category ORDER BY cnt DESC, value LIMIT 3
    """).fetchall()
    got = [(tv["value"], tv["count"]) for tv in prof["category"]["top_values"]]
    n = len(pdf)
    # every reported count is exact; membership matches the true top-k
    # for values above the MG candidate threshold n/(k+1)
    heavy = [(v, c) for v, c in want if c > n / 257]
    assert got[: len(heavy)] == heavy, (got, heavy)


def test_profile_runs_on_the_documents_fixture(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prof = profile_table(docs, top_k=3)
    rows = {r["column"]: r.asDict() for r in prof.collect()}
    release_all()
    assert set(rows) >= {"doc_id", "text", "source"}
    n = docs.count()
    # near-unique columns (text) legitimately report NO heavy hitters —
    # MG decrements singletons away; columns with real repetition must
    for c, p in rows.items():
        assert p["n_rows"] == n
        assert 0 <= p["n_null"] <= n
        assert p["distinct_est"] >= 1
        if not p["top_values"]:
            assert p["distinct_est"] > n * 0.8, (c, "empty top on a skewed col")
            continue
        # exact counts: spot-check the first reported value
        v, cnt = p["top_values"][0]["value"], p["top_values"][0]["count"]
        from pyspark.sql import functions as F

        true = docs.where(F.col(c).cast("string") == v).count()
        assert cnt == true, (c, v, cnt, true)
    assert rows["source"]["top_values"] and rows["lang"]["top_values"]


def test_profile_rejects_bad_columns(spark, skewed):
    _, df = skewed
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_table(df, columns=["nope"])


def test_profile_sketch_serde_roundtrip_and_truncation():
    """The composite (HLL+MG+KLL) state obeys the same wire discipline
    as the first-class sketches: roundtrip is byte-identical, truncation
    at any sampled prefix raises, junk between the members raises."""
    from marker_spark.ops.profile import _ProfileSketch
    from marker_spark.sketches.hll import HllSketch
    from marker_spark.sketches.kll import KllSketch
    from marker_spark.sketches.misra_gries import MisraGriesSketch

    def fresh():
        return _ProfileSketch(HllSketch(p=10), MisraGriesSketch(k=8), KllSketch(k=64))

    sk = fresh()
    sk.update_hashes(np.arange(1000, dtype=np.int64) % 37 * 123457)
    sk.update_numeric(np.arange(500, dtype=np.float64) / 7.0)
    buf = sk.to_bytes()
    rt = _ProfileSketch.from_bytes(buf)
    assert rt.to_bytes() == buf
    assert rt.hll.estimate() == sk.hll.estimate()
    assert rt.kll.quantile(0.5) == sk.kll.quantile(0.5)
    for n in (0, 4, 7, 11, 12, len(buf) // 2, len(buf) - 1):
        if n >= len(buf):
            continue
        with pytest.raises(ValueError):
            _ProfileSketch.from_bytes(buf[:n])
    with pytest.raises(ValueError):
        _ProfileSketch.from_bytes(buf + b"\x00")

    # merge fold contract: merge_in_place returns self (agg.py reassigns)
    other = fresh()
    other.update_hashes(np.arange(50, dtype=np.int64) * 999331)
    other.update_numeric(np.arange(50, dtype=np.float64))
    assert sk.merge_in_place(other) is sk


def test_quantiles_within_kll_rank_error_vs_duckdb(spark, skewed):
    """Numeric columns report QUANTILE_PROBS estimates whose TRUE rank
    (computed exactly by DuckDB over the non-null values) sits within
    the KLL rank-error envelope of the requested prob; string columns
    report NULL quantiles."""
    from marker_spark.ops.profile import QUANTILE_PROBS

    pdf, df = skewed
    prof = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    release_all()
    con = duckdb.connect()
    con.register("t", pdf)
    eps = 3.0 / (200 ** 0.5)  # conservative envelope (kll.py docstring)
    for c in ("uid", "score"):
        qs = prof[c]["quantiles"]
        assert qs is not None and len(qs) == len(QUANTILE_PROBS), c
        for p, v in zip(QUANTILE_PROBS, qs):
            true_rank = con.execute(
                f"SELECT CAST(SUM(CASE WHEN {c} <= ? THEN 1 ELSE 0 END) AS DOUBLE)"
                f" / COUNT({c}) FROM t WHERE {c} IS NOT NULL",
                [v],
            ).fetchone()[0]
            assert abs(true_rank - p) <= eps, (c, p, v, true_rank)
        # monotone by construction of the probs
        assert qs == sorted(qs), (c, qs)
    assert prof["category"]["quantiles"] is None


def test_quantiles_cross_check_vs_spark_kll_builtin(spark, skewed):
    """Cross-implementation oracle: Spark 4.1's Apache DataSketches KLL
    builtin over the same column must land within the combined rank
    tolerance of our profiler's median (the r8 builtin-oracle recipe)."""
    pdf, df = skewed
    from pyspark.sql import functions as F

    try:
        sp = df.select(F.expr(
            "kll_sketch_get_quantile_double(kll_sketch_agg_double(score), 0.5d)"
        )).collect()[0][0]
    except Exception:
        pytest.skip("kll builtins unavailable in this Spark build")
    prof = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    release_all()
    ours = prof["score"]["quantiles"][2]  # p=0.5
    vals = pdf["score"].dropna().to_numpy()
    # compare in RANK space: both estimators carry rank error, value
    # space is meaningless on a skewed distribution
    rank_sp = float((vals <= sp).mean())
    rank_us = float((vals <= ours).mean())
    assert abs(rank_sp - rank_us) <= 2 * 3.0 / (200 ** 0.5), (sp, ours)


def test_profile_job_entry(spark, tmp_path, capsys):
    """spark-submit job entry (jobs/profile_table.py): writes one
    parquet row per column and prints a one-line JSON report."""
    import json

    from jobs.profile_table import main

    out = str(tmp_path / "profile_out")
    main(["--input", f"{SF_DIR}/documents.parquet", "--output", out,
          "--columns", "source,lang", "--top-k", "2"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["columns_profiled"] == 2
    rows = {r["column"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"source", "lang"}
    assert all(len(r["top_values"]) == 2 for r in rows.values())
