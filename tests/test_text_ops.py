

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
