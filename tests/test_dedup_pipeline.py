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


def test_dedup_pipeline_with_semdedup(spark, tmp_path, capsys):
    """--embeddings enables the SemDeDup stage: docs whose vector has a
    lower-id semantic duplicate in its k-means cell are dropped.  The
    sidecar here assigns every doc the class vector of doc_id % 10
    (identical within a class, near-orthogonal across), so at most one
    doc per class can survive."""
    import numpy as np
    import pandas as pd

    from jobs.dedup_pipeline import main

    rng = np.random.default_rng(23)
    classes = rng.standard_normal((10, 16)).astype(np.float32)
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id").collect()
    ]
    emb_path = str(tmp_path / "embeddings.parquet")
    pd.DataFrame(
        {
            "doc_id": doc_ids,
            "embedding": [classes[int(i) % 10].tolist() for i in doc_ids],
        }
    ).to_parquet(emb_path)

    out = str(tmp_path / "clean_sem")
    main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--min-quality", "0.0",
        "--jaccard", "0.99",
        "--embeddings", emb_path,
        "--semdedup-cells", "4",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["semantic_dups_dropped"] > 0
    clean = spark.read.parquet(out)
    survivors = [r["doc_id"] for r in clean.select("doc_id").collect()]
    assert clean.count() == report["after_near_dedup"]
    # identical vectors always share a cell -> at most one survivor per
    # embedding class
    per_class: dict[int, list] = {}
    for i in survivors:
        per_class.setdefault(int(i) % 10, []).append(i)
    assert all(len(v) == 1 for v in per_class.values()), per_class


def test_semdedup_trained_recall_on_clustered_corpus(spark):
    """Production semdedup path (trained k-means -> semdedup_flags) on a
    clustered corpus ~10x the embeddings fixture, with injected
    near-clones (verdict r7 #6): the driver oracle pins the rule with
    seeded data-independent centroids, so this is the behavioral gate
    for the TRAINED path — recall of injected duplicates must be high
    and the natural (non-clone) corpus must not be mass-flagged.

    Geometry: 25 Gaussian clusters; intra-cluster noise 0.9 keeps the
    chance of a NATURAL cluster-mate pair reaching cosine 0.95 below
    ~1% per point (numpy-measured: scale 0.5 -> 22% of points have a
    >=0.95 mate — the tail over ~80k pairs/cluster, not the ~0.8 mean
    cosine, is what matters; 0.8 -> 0.6%, 0.9 -> safely under the 5%
    assertion), while clone perturbation 0.05 puts clone cosines
    ~0.999 (far above threshold).  Clones get ids ABOVE every original
    so the upper-triangular rule must flag exactly the clone side."""
    import numpy as np
    import pandas as pd

    from marker_spark.ops.dedup import semdedup_flags
    from marker_spark.ops.similarity import kmeans_centroids

    rng = np.random.default_rng(77)
    n_clusters, per_cluster, dim = 25, 400, 16
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    base = np.repeat(centers, per_cluster, axis=0) + 0.9 * rng.standard_normal(
        (n_clusters * per_cluster, dim)
    ) / np.sqrt(dim)
    n = len(base)  # 10,000 originals (fixture sf0.1 embeddings = 2,000)
    clone_src = np.arange(0, n, 10)
    clones = base[clone_src] + 0.05 * rng.standard_normal(
        (len(clone_src), dim)
    ) / np.sqrt(dim)
    vecs = np.vstack([base, clones]).astype(np.float32)
    ids = np.arange(n + len(clones))
    clone_ids = set(range(n, n + len(clone_src)))

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": [v.tolist() for v in vecs]}),
        schema="vec_id long, embedding array<float>",
    )
    cents = kmeans_centroids(df, n_cells=n_clusters, seed=7)
    flags = semdedup_flags(df, cents, threshold=0.95).collect()
    from marker_spark.cacheutil import release_all

    release_all()

    flagged = {r["vec_id"] for r in flags if r["is_dup"] == 1}
    assert len(flags) == n + len(clone_src)
    recall = len(clone_ids & flagged) / len(clone_ids)
    assert recall >= 0.95, f"clone recall {recall:.3f}"
    # the natural corpus must survive: only rare coincidental >=0.95
    # cosines between cluster-mates may flag an original
    natural_flagged = len(flagged - clone_ids) / n
    assert natural_flagged <= 0.05, f"natural flag rate {natural_flagged:.3f}"


def test_dedup_pipeline_keep_best_selects_highest_quality(spark, tmp_path, capsys):
    """--keep-best: one survivor per near-dup cluster, and it is the
    highest-quality member — not the lowest id (the default pairwise
    rule would keep the min-id doc)."""
    import pandas as pd

    from jobs.dedup_pipeline import main

    # a 3-clone near-dup cluster with controlled quality: the HIGHEST
    # id gets extra stopwords (boosts the stopword term of the Gopher
    # score), so keep-best and min-id disagree on the survivor
    base = " ".join(f"tok{i}" for i in range(60))
    clones = {
        900001: base + " alpha",
        900002: base + " beta",
        900003: base + " the and of to in is a the and of to in is a",
    }
    filler = {
        i: " ".join(f"w{i}x{j} the of" for j in range(30)) for i in range(10)
    }
    rows = [{"doc_id": k, "text": v} for k, v in {**filler, **clones}.items()]
    src = str(tmp_path / "kb_docs.parquet")
    pd.DataFrame(rows).to_parquet(src, index=False)

    out = str(tmp_path / "kb_clean")
    main([
        "--input", src, "--output", out,
        "--min-quality", "0.0", "--min-words", "3",
        "--jaccard", "0.7", "--keep-best",
    ])
    kept_ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # exactly one clone survives, and it is the stopword-boosted one
    assert kept_ids & {900001, 900002, 900003} == {900003}
    # fillers are untouched
    assert set(filler) <= kept_ids
