

def test_gopher_signals_rule_by_rule(spark):
    """Each Gopher rule must reject exactly its planted violation."""
    import pandas as pd

    from marker_spark.ops.text import gopher_pass_col, with_gopher_signals

    good = " ".join(f"word{i}" for i in range(40))
    cases = {
        "good": good,
        "too_short": "only three words",
        "long_words": " ".join("x" * 20 for _ in range(40)),
        "symbols": " ".join("#" for _ in range(40)),
        "non_alpha": " ".join("123" for _ in range(40)),
        "ellipsis": "\n".join((good + "...") for _ in range(5)),
        "bullets": "\n".join(("- " + good) for _ in range(5)),
        "dup_lines": "\n".join([good] * 10),
    }
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(cases), "text": list(cases.values())})
    )
    sig = with_gopher_signals(docs).withColumn("ok", gopher_pass_col(min_words=30))
    got = {r["doc_id"]: r["ok"] for r in sig.collect()}
    assert got == {k: (k == "good") for k in cases}, got


def test_repetition_signals_planted(spark):
    """A doc that is one bigram repeated scores ~1.0 on both signals; a
    doc of all-distinct words scores near zero on both."""
    import pandas as pd
    import __spark_entry__ as E

    # route through the driver query by building a scratch documents dir
    distinct = " ".join(f"w{i}" for i in range(30))
    loop = "spam ham " * 20
    import tempfile, os
    d = tempfile.mkdtemp()
    pd.DataFrame(
        {"doc_id": [1, 2], "text": [distinct, loop.strip()],
         "lang": ["en", "en"], "source": ["s_distinct", "s_loop"],
         "n_chars": [len(distinct), len(loop.strip())]}
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    rows = {r["source"]: r for r in E.q_repetition_signals(spark, d).collect()}
    assert rows["s_loop"]["avg_top_bigram_frac"] > 0.4
    assert rows["s_loop"]["avg_dup_trigram_frac"] > 0.9
    assert rows["s_distinct"]["avg_top_bigram_frac"] < 0.3
    assert rows["s_distinct"]["avg_dup_trigram_frac"] == 0.0
