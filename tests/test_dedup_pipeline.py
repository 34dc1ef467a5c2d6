"""End-to-end dedup pipeline job: quality filter -> exact dedup ->
LSH candidates -> exact-Jaccard verify -> clean corpus."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_dedup_pipeline_end_to_end(spark, tmp_path, capsys):
    from jobs.dedup_pipeline import main

    out = str(tmp_path / "clean")
    main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--min-quality", "0.2",
        "--jaccard", "0.7",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["input_docs"] >= report["after_quality"] >= report["after_exact_dedup"]
    assert report["after_exact_dedup"] >= report["after_near_dedup"] > 0
    clean = spark.read.parquet(out)
    assert clean.count() == report["after_near_dedup"]
    # no exact duplicates survive
    assert clean.count() == clean.select("text").distinct().count()
    # surviving docs are unique ids
    assert clean.count() == clean.select("doc_id").distinct().count()


def test_dedup_pipeline_with_span_excision(spark, tmp_path, capsys):
    """--span-k enables the substring-excision stage: duplicated spans
    surviving document-level dedup are cut from the higher-id copy, so
    total duplicated chars shrink while doc count stays the same."""
    from jobs.dedup_pipeline import main

    out = str(tmp_path / "clean_spans")
    main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--min-quality", "0.0",
        "--jaccard", "0.95",  # keep near-dups so spans remain to excise
        "--span-k", "24",
        "--span-min-len", "40",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["duplicated_spans_excised"] > 0
    clean = spark.read.parquet(out)
    assert clean.count() == report["after_near_dedup"]
    # excision removed the b-side copies: no cross-doc 40-char span of
    # the ORIGINAL duplicated regions should survive verbatim in both
    # docs of any pair (spot check: summed text length strictly shrank)
    orig = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    orig_len = orig.join(clean.select("doc_id"), "doc_id").agg(
        F.sum(F.length("text"))
    ).collect()[0][0]
    clean_len = clean.agg(F.sum(F.length("text"))).collect()[0][0]
    assert clean_len < orig_len


def test_dedup_pipeline_with_boilerplate_excision(spark, tmp_path, capsys):
    """--boilerplate adds the high-DF path: a header shared by more
    docs than span-max-df (invisible to the pair path by construction)
    must be excised from EVERY carrying doc."""
    from jobs.dedup_pipeline import main

    hdr = ("=== COMMON NAV CHROME: home | products | about | contact"
           " | careers | legal ===\n")
    src = str(tmp_path / "boiler_in")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.concat(F.lit(hdr), "text"))
        .otherwise(F.col("text"))
        .alias("text"),
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "clean_boiler")
    main([
        "--input", src,
        "--output", out,
        "--min-quality", "0.0",
        "--jaccard", "0.99",
        "--span-k", "24",
        "--span-min-len", "40",
        "--span-max-df", "8",
        "--boilerplate",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["boilerplate_spans_excised"] > 0
    clean = spark.read.parquet(out)
    # not one survivor still carries the header
    assert clean.where(F.col("text").contains("COMMON NAV CHROME")).count() == 0
    assert clean.count() == report["after_near_dedup"]
