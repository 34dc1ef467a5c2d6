"""Deterministic synthetic data generators (seed 42 throughout).

Two fixtures per FIXTURES.md:

1. ``gen_markers`` — reference-parity byte-string markers mirroring the
   reference test generator's alphabet and its quirk of drawing one
   width per set (/root/reference/DBAppUnitTests.cpp:58-79).
2. ``gen_tokenized_sequences`` — the primary input table of
   pre-tokenized training sequences
   (doc_id string, tokens array<int32>, n_tok int32, source string)
   per BASELINE.json:input_hint: lognormal lengths, zipf token ids over
   a 50,257 vocab, zipf-skewed source keys (hottest ~40% of rows).

Every row is independently reproducible: row i's token stream is seeded
by splitmix64(seed ^ i), so regenerating any subset with the same seed
yields exact token-array equality (the per-row invariant the driver
checks).
"""

from __future__ import annotations

import numpy as np

# The reference's 73-char test alphabet (DBAppUnitTests.cpp:62-67).
MARKER_ALPHABET = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyz"
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    b"1234567890"
    b"!@#$%^&*()"
    b"`~-_=+[{]}\\|;:'\",<.>/? ",
    dtype=np.uint8,
)

VOCAB_SIZE = 50257
SOURCES = [
    "cc", "wiki", "code", "books", "forums", "news", "arxiv", "patents",
    "legal", "medical", "social", "recipes", "reviews", "qa", "mail",
    "chat", "docs", "specs", "manuals", "misc",
]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — one independent 64-bit stream seed per row."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def gen_markers(n: int, seed: int = 42, width_lo: int = 50, width_hi: int = 250):
    """Fixed-width random byte strings from the reference alphabet.

    Returns (matrix [n, width] uint8, width).  Reference quirk kept:
    the width is drawn ONCE per set (DBAppUnitTests.cpp:69), so all n
    markers share it.
    """
    rng = np.random.default_rng(seed)
    width = int(rng.integers(width_lo, width_hi + 1))
    idx = rng.integers(0, len(MARKER_ALPHABET), size=(n, width))
    return MARKER_ALPHABET[idx], width


def _zipf_cdf(n: int, a: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** (-a)
    return np.cumsum(w) / w.sum()


_ZIPF_CDF_CACHE: dict[tuple[int, float], np.ndarray] = {}


def _zipf_cdf_cached(n: int, a: float) -> np.ndarray:
    key = (n, a)
    if key not in _ZIPF_CDF_CACHE:
        _ZIPF_CDF_CACHE[key] = _zipf_cdf(n, a)
    return _ZIPF_CDF_CACHE[key]


def gen_tokenized_sequences(
    n_docs: int,
    seed: int = 42,
    min_tok: int = 8,
    max_tok: int = 2048,
    vocab: int = VOCAB_SIZE,
    start: int = 0,
    zipf_a: float = 1.2,
    source_zipf_a: float = 1.5,  # hottest of 20 sources ~= 40% of rows
):
    """Generate rows [start, start+n_docs) as a pyarrow Table with columns
    (doc_id string, tokens list<int32>, n_tok int32, source string).

    Deterministic per row: doc i is fully determined by (seed, i), so
    distributed generation of disjoint ranges composes to the same
    table — the property the Spark-side distributed generator and the
    per-row token-array-equality test both rely on.
    """
    import pyarrow as pa

    ids = np.arange(start, start + n_docs, dtype=np.int64)
    row_seed = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))

    u_len = (_splitmix64(row_seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u_src = (_splitmix64(row_seed ^ np.uint64(1)) >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    # n_tok ~ lognormal(mu=ln 120, sigma=0.6) clipped to [min_tok, max_tok].
    z = _norm_ppf(u_len)
    n_tok = np.clip(np.rint(np.exp(np.log(120.0) + 0.6 * z)), min_tok, max_tok).astype(np.int32)

    # source ~ zipf over SOURCES (hottest key ~40% of rows at a=1.5).
    src_cdf = _zipf_cdf_cached(len(SOURCES), source_zipf_a)
    src_idx = np.searchsorted(src_cdf, u_src, side="left")
    sources = np.asarray(SOURCES, dtype=object)[src_idx]

    # tokens: one splitmix64 stream per (row, position), zipf over vocab.
    total = int(n_tok.sum())
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    flat_seed = np.repeat(row_seed, n_tok.astype(np.int64))
    pos = np.arange(total, dtype=np.uint64) - np.repeat(
        offsets[:-1].astype(np.uint64), n_tok.astype(np.int64)
    )
    u_tok = (
        _splitmix64(flat_seed + (pos + np.uint64(2)) * np.uint64(0x9E3779B97F4A7C15))
        >> np.uint64(11)
    ).astype(np.float64) / float(1 << 53)
    tok_cdf = _zipf_cdf_cached(vocab, zipf_a)
    tokens_flat = np.searchsorted(tok_cdf, u_tok, side="left").astype(np.int32)

    if total <= np.iinfo(np.int32).max:
        tokens_arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(tokens_flat, type=pa.int32())
        )
    else:
        # >2^31 total tokens: int32 list offsets overflow; large_list
        # keeps the generator usable at corpus-scale fixture sizes
        tokens_arr = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), pa.array(tokens_flat, type=pa.int32())
        )
    doc_ids = pa.array([f"doc-{i:012d}" for i in ids], type=pa.string())
    return pa.table(
        {
            "doc_id": doc_ids,
            "tokens": tokens_arr,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        }
    )


def write_tokenized_sequences(
    path: str, n_docs: int, seed: int = 42, row_group_size: int = 16_384, **kw
) -> None:
    """Write the tokenized-sequence fixture as a parquet file.

    Small row groups (~10 MB at avg 150 tokens/doc) keep the file
    splittable: a single-row-group file caps Spark's scan parallelism
    at 1 task no matter how many cores are available.
    """
    import pyarrow.parquet as pq

    pq.write_table(
        gen_tokenized_sequences(n_docs, seed=seed, **kw), path, row_group_size=row_group_size
    )


def _norm_ppf(u: np.ndarray) -> np.ndarray:
    """Acklam's rational approximation to the standard normal inverse CDF.

    Deterministic, dependency-free, |rel err| < 1.15e-9 — plenty for
    synthetic length draws.
    """
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    u = np.clip(u, 1e-12, 1 - 1e-12)
    out = np.empty_like(u)
    lo = u < 0.02425
    hi = u > 1 - 0.02425
    mid = ~(lo | hi)
    if lo.any():
        q = np.sqrt(-2 * np.log(u[lo]))
        out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if hi.any():
        q = np.sqrt(-2 * np.log(1 - u[hi]))
        out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if mid.any():
        q = u[mid] - 0.5
        r = q * q
        out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
        )
    return out
