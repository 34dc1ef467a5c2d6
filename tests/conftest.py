from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("marker-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tokseq_path(tmp_path_factory):
    """Small deterministic tokenized-sequence parquet fixture (seed 42)."""
    from marker_spark.datagen import write_tokenized_sequences

    p = tmp_path_factory.mktemp("tokseq") / "tokseq.parquet"
    write_tokenized_sequences(str(p), n_docs=2000, seed=42)
    return str(p)
