"""Text-analysis operators for training-data pipelines.

All hot-path logic is Spark built-in expressions (JVM, whole-stage
codegen) — no Python UDFs: token counting, quality scoring, language
ID, document fingerprinting.  Each has a DuckDB-oracle-expressible
formulation (the driver's correctness gate) except fingerprinting,
which depends on the engine hash function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..cacheutil import register

# Tiny per-language stopword lists for the n-gram/keyword heuristic.
# Deterministic and SQL-replicable; accuracy is secondary to determinism
# on the synthetic corpus.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "es": ["el", "la", "de", "que", "los", "una", "y"],
    "fr": ["le", "la", "les", "des", "est", "une", "et"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
}
LANG_ORDER = ["en", "es", "fr", "de"]  # deterministic tie-break order


def words_col(text: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array (guarded so
    Spark and DuckDB agree: both split '' into [''])."""
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_words, n_chars_calc, avg_word_len, punct_ratio,
    stopword_ratio, quality_score columns — pure Catalyst expressions."""
    text = F.col(text_col)
    words = words_col(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    total_word_len = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    avg_word_len = F.when(n_words > 0, total_word_len / n_words).otherwise(F.lit(0.0))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(en_stop, w)))
    stopword_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    quality = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(stopword_ratio * F.lit(5.0), F.lit(1.0)) * 0.4
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("avg_word_len", avg_word_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stopword_ratio)
        .withColumn("quality_score", quality)
    )


def lang_id_col(text_col: str = "text") -> Column:
    """Keyword-hit language ID with a deterministic argmax tie-break."""
    words = words_col(F.col(text_col))
    def _hit_count(stop):
        return F.size(F.filter(words, lambda w: F.array_contains(stop, w)))

    scores = {}
    for lang in LANG_ORDER:
        scores[lang] = _hit_count(F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]]))
    # argmax with first-in-LANG_ORDER winning ties
    expr = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        later = [scores[l2] for l2 in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]]
        cond = scores[lang] >= F.greatest(*later) if len(later) > 1 else scores[lang] >= later[0]
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): Karp–Rabin rolling hash over character k-grams,
    then the minimum hash of every `window` consecutive k-grams, with
    consecutive duplicates collapsed — guarantees every match of length
    >= k + window - 1 between two documents shares a fingerprint.

    Fully vectorized across the Arrow batch: all texts concatenate into
    one char buffer; the rolling hash is computed in ONE pass with the
    prefix trick H(i) = (P(i+k) - P(i)) * B^(k-1+i) where
    P(j) = sum c_t * Binv^t (mod 2^64, B odd so Binv exists); window
    minima via a strided sliding view.  No per-character Python; one
    tiny per-batch numpy pass.

    Returns (id_col, fingerprints array<long>).
    """
    B = np.uint64(1000003)  # odd -> invertible mod 2^64
    Binv = np.uint64(pow(1000003, -1, 1 << 64))

    @F.pandas_udf("array<long>")
    def fp_udf(texts: pd.Series) -> pd.Series:
        n_docs = len(texts)
        if n_docs == 0:
            return pd.Series([], dtype=object)
        enc = [(t or "").encode("utf-8", "ignore") for t in texts]
        lens = np.fromiter(map(len, enc), dtype=np.int64, count=n_docs)
        offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        total = int(offs[-1])
        out: list[np.ndarray] = []
        if total == 0:
            return pd.Series([np.empty(0, dtype=np.int64)] * n_docs)
        buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
        # P(j) = sum_{t<j} c_t * Binv^t ; H(i) = (P(i+k)-P(i)) * B^(k-1+i)
        # (the B^i factor cancels Binv^i, so H is position-independent)
        binv_pow = np.empty(total + 1, dtype=np.uint64)
        binv_pow[0] = 1
        np.multiply.accumulate(np.full(total, Binv, dtype=np.uint64), out=binv_pow[1:])
        P = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(buf * binv_pow[:-1], out=P[1:])
        b_pow = np.empty(total, dtype=np.uint64)
        if total:
            b_pow[0] = np.uint64(pow(1000003, k - 1, 1 << 64))
            np.multiply.accumulate(
                np.concatenate(([b_pow[0]], np.full(total - 1, B, dtype=np.uint64))),
                out=b_pow,
            )
        n_grams_flat = total - k + 1
        if n_grams_flat <= 0:
            H = np.empty(0, dtype=np.uint64)
        else:
            H = (P[k:] - P[:-k]) * b_pow[:n_grams_flat]
        for d in range(n_docs):
            lo, hi = int(offs[d]), int(offs[d + 1])
            g = hi - lo - k + 1  # k-grams fully inside this doc
            if g <= 0:
                # short doc: single whole-doc fingerprint
                h = (P[hi] - P[lo]) * np.uint64(pow(1000003, max(hi - lo - 1, 0) + lo, 1 << 64))
                out.append(np.array([h], dtype=np.uint64).view(np.int64))
                continue
            hd = H[lo : lo + g]
            if g <= window:
                mins = np.array([hd.min()], dtype=np.uint64)
            else:
                sw = np.lib.stride_tricks.sliding_window_view(hd, window)
                mins = sw.min(axis=1)
                keep = np.ones(len(mins), dtype=bool)
                keep[1:] = mins[1:] != mins[:-1]  # collapse runs (winnowing)
                mins = mins[keep]
            out.append(mins.view(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col), fp_udf(F.col(text_col)).alias("fingerprints"))


def winnowing_dup_pairs(
    fp_df: DataFrame, id_col: str = "doc_id", min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs sharing >= min_shared winnowed
    fingerprints: explode -> self-equi-join on the fingerprint (keyed
    shuffle, never all-pairs) -> count shared.

    ``max_df`` drops fingerprints appearing in more than that many
    documents before the join — the stop-fingerprint cap: a boilerplate
    phrase shared by 10^6 docs would otherwise fan out to 10^12 pairs
    on one join key.  Dropping it loses no true near-dups that also
    share rarer content (they still meet min_shared on the rest)."""
    ex = fp_df.select(
        F.col(id_col), F.explode(F.array_distinct("fingerprints")).alias("fp")
    ).persist()
    if max_df is not None:
        rare = ex.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") <= max_df
        )
        capped = ex.join(rare.select("fp"), "fp", "left_semi").persist()
        capped.count()  # materialize, then drop the pre-cap cached copy
        ex.unpersist()
        ex = capped
    register(ex)  # released by the session owner after consumption
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# GPT2-style pre-tokenizer classes (letter runs, short digit runs,
# punctuation runs) WITHOUT lookahead, so the identical pattern runs in
# Java regex (Spark) and RE2 (the DuckDB oracle).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"


def bpe_ish_token_count_col(text_col: str = "text") -> Column:
    """Approximate subword token count: number of GPT2-ish pre-token
    matches.  Counts pre-tokens, not BPE merges — the standard cheap
    estimator for corpus token budgeting; pure Catalyst expression."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_ISH_PATTERN), F.lit(0)
        )
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", shingle: int = 5) -> DataFrame:
    """Shingle-min fingerprint (1-permutation MinHash over word
    5-grams): fingerprint = min(md5(shingle)).  Near-duplicate docs
    that share their minimal shingle collide — a cheap rolling
    first-pass before full MinHash-LSH.  md5 (not xxhash64) so the
    fingerprint is engine-independent: DuckDB computes the identical
    hex string, making the driver query EXACTLY oracle-able (the same
    trick as the bottom-k sampling oracles in ops/sample.py)."""
    words = words_col(F.col(text_col))
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle, F.lit(0)))
    shingles = F.when(n >= shingle, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, shingle))
    )).otherwise(F.array(F.concat_ws(" ", words)))
    fp = F.array_min(F.transform(shingles, lambda s: F.md5(s.cast("binary"))))
    return df.withColumn("fingerprint", fp)
