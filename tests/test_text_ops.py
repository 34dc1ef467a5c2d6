

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


def test_redact_pii_counts_and_placeholders(spark):
    from marker_spark.ops.text import redact_pii

    rows = [
        (1, "mail a.b-c@exa-mple.org and x@y.io, call 555-123-4567"),
        (2, "server 192.168.1.10 up, 10.0.0.1 down"),
        (3, "clean text without identifiers"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ip"]) == (2, 1, 0)
    assert out[1]["text_redacted"] == "mail <EMAIL> and <EMAIL>, call <PHONE>"
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ip"]) == (0, 0, 2)
    assert out[2]["text_redacted"] == "server <IP> up, <IP> down"
    assert out[3]["text_redacted"] == out[3]["text"]
    assert out[4]["text_redacted"] == ""  # NULL coalesces to '' for the scrub


def test_lm_bigram_scores_match_hand_model(spark):
    """Exact add-1 bigram LM math vs an independent Python model."""
    import math

    from marker_spark.ops.text import lm_bigram_scores

    ref_rows = [(100, "the cat sat"), (101, "the cat ran")]
    doc_rows = [(1, "the cat sat"), (2, "a dog barked loudly")]
    ref = spark.createDataFrame(ref_rows, "doc_id int, text string")
    docs = spark.createDataFrame(doc_rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in lm_bigram_scores(docs, ref).collect()}

    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for _, t in ref_rows:
        ws = t.lower().split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)

    def ce(text: str) -> float:
        ws = text.lower().split()
        lps = [
            math.log((bi.get((a, b), 0) + 1.0) / (uni.get(a, 0) + v))
            for a, b in zip(ws, ws[1:])
        ]
        return round(-sum(lps) / len(lps), 6)

    for did, text in doc_rows:
        assert got[did]["n_bigrams"] == len(text.split()) - 1
        assert abs(got[did]["cross_entropy"] - ce(text)) < 1e-6
    # the in-domain doc must be far more reference-like than the OOV doc
    assert got[1]["cross_entropy"] < got[2]["cross_entropy"]
