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
