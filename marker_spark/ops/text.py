"""Text-analysis operators for training-data pipelines.

All hot-path logic is Spark built-in expressions (JVM, whole-stage
codegen) — no Python UDFs: token counting, quality scoring, language
ID, document fingerprinting.  Each has a DuckDB-oracle-expressible
formulation (the driver's correctness gate) except fingerprinting,
which depends on the engine hash function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    5-grams): fingerprint = min(xxhash64(shingle)).  Near-duplicate
    docs that share their minimal shingle collide — a cheap rolling
    first-pass before full MinHash-LSH.  Engine-hash-dependent, so
    correctness-checked rows-only."""
    words = words_col(F.col(text_col))
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle, F.lit(0)))
    shingles = F.when(n >= shingle, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, shingle))
    )).otherwise(F.array(F.concat_ws(" ", words)))
    fp = F.array_min(F.transform(shingles, lambda s: F.xxhash64(s)))
    return df.withColumn("fingerprint", fp)
