"""Read-side probe tests: probe DataFrames against a distributed
sketch table (write side -> parquet roundtrip -> probe)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from marker_spark.api import bloom_agg
from marker_spark.probe import probe_sketch_table

SF_DIR = "/root/testdata/sf0.001"


def test_probe_tokenized_table(spark, tokseq_path, tmp_path):
    tok = spark.read.parquet(tokseq_path)
    table = bloom_agg(tok, capacity=200_000, fp=0.001, group_cols=["source"])
    loc = str(tmp_path / "sketches")
    table.write.parquet(loc)
    sketch_table = spark.read.parquet(loc)

    # self-probe: every inserted doc must hit its own group's sketch
    res = probe_sketch_table(tok, sketch_table, ["source"], token_col="tokens")
    assert res.where(~F.col("found")).count() == 0

    # probes with an unknown group get False
    alien = tok.limit(20).withColumn("source", F.lit("no-such-source"))
    res2 = probe_sketch_table(alien, sketch_table, ["source"], token_col="tokens")
    assert res2.where(F.col("found")).count() == 0


def test_probe_marker_table(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "marker", F.concat_ws("|", F.col("event_id"), F.col("props"))
    )
    table = bloom_agg(ev, marker_col="marker", capacity=50_000, fp=0.001,
                      group_cols=["event_type"])
    res = probe_sketch_table(ev, table, ["event_type"], marker_col="marker")
    assert res.where(~F.col("found")).count() == 0

    # cross-group probes: markers from type A probed as type B mostly miss
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    swapped = ev.where(F.col("event_type") == types[0]).withColumn(
        "event_type", F.lit(types[1])
    )
    res2 = probe_sketch_table(swapped, table, ["event_type"], marker_col="marker")
    n = res2.count()
    hits = res2.where(F.col("found")).count()
    assert hits / max(n, 1) < 0.05, f"cross-group FP rate {hits}/{n}"


def test_collect_states_guard_rejects_unbounded_tables(spark):
    """The 'bounded per-group dict' assumption is enforced: a sketch
    table whose total serialized state exceeds the cap raises instead
    of OOMing the driver through collect + broadcast."""
    from marker_spark.probe import collect_sketch_states

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "marker", F.concat_ws("|", F.col("event_id"), F.col("props"))
    )
    table = bloom_agg(ev, marker_col="marker", capacity=50_000, fp=0.001,
                      group_cols=["event_type"])
    with pytest.raises(ValueError, match="collect cap"):
        collect_sketch_states(table, ["event_type"], max_bytes=64)
    # the default cap accepts the bounded table
    states = collect_sketch_states(table, ["event_type"])
    assert len(states) > 0
