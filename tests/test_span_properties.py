"""Duplicated-span property tests (hypothesis): the k-gram diagonal-run
implementation must agree EXACTLY with an independent reference that
never builds grams — direct character comparison per alignment offset.
A maximal common substring of length L >= k yields L-k+1 consecutive
gram matches on one diagonal, so with the frequency caps disabled the
two formulations are equivalent; any bookkeeping bug in the explode /
join / island collapse breaks the set equality."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

K = 8
MIN_LEN = 12


def _reference_spans(texts: dict[int, str]) -> set[tuple[int, int, int, int, int]]:
    """(doc_a, doc_b, start_a, start_b, span_len) for every maximal
    common substring of length >= MIN_LEN, via per-diagonal char
    comparison — no grams anywhere."""
    out = set()
    ids = sorted(texts)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = texts[ids[ai]], texts[ids[bi]]
            na, nb = len(a), len(b)
            if min(na, nb) < MIN_LEN:
                continue
            av = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
            bv = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
            # ascii-only corpus: byte offsets == char offsets
            for diag in range(-(nb - 1), na):
                lo_a = max(diag, 0)
                hi_a = min(na, nb + diag)
                if hi_a - lo_a < MIN_LEN:
                    continue
                eq = av[lo_a:hi_a] == bv[lo_a - diag : hi_a - diag]
                # runs of True
                idx = np.flatnonzero(np.diff(np.concatenate(([0], eq.view(np.int8), [0]))))
                for s, e in zip(idx[::2], idx[1::2]):
                    if e - s >= MIN_LEN:
                        out.add(
                            (ids[ai], ids[bi], lo_a + s + 1, lo_a + s - diag + 1, e - s)
                        )
    return out


_fragment = st.text(alphabet="ab ", min_size=4, max_size=30)


@st.composite
def _corpus(draw):
    shared = draw(st.lists(st.text(alphabet="xyz q", min_size=MIN_LEN, max_size=40),
                           min_size=1, max_size=3))
    docs = {}
    n_docs = draw(st.integers(2, 5))
    for i in range(n_docs):
        parts = []
        for _ in range(draw(st.integers(1, 4))):
            if draw(st.booleans()) and shared:
                parts.append(shared[draw(st.integers(0, len(shared) - 1))])
            else:
                parts.append(draw(_fragment))
        docs[i] = "".join(parts)
    return docs


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None)
@given(_corpus())
def test_spans_match_gramless_reference(spark, docs):
    from marker_spark.cacheutil import release_all
    from marker_spark.ops.dedup import duplicated_spans

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    rows = duplicated_spans(
        df, k=K, min_len=MIN_LEN, max_df=10**6, max_occ=10**9
    ).collect()
    release_all()
    got = {
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in rows
    }
    assert got == _reference_spans(docs)


def _reference_removal(texts: dict[int, str], spans) -> dict[int, str]:
    """Independent interval surgery: collect b-side intervals per doc,
    merge overlaps, cut by slicing."""
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for doc_b, start_b, span_len in spans:
        by_doc.setdefault(doc_b, []).append((start_b, start_b + span_len - 1))
    out = dict(texts)
    for doc, ivs in by_doc.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:  # true overlap (adjacent
                # intervals stay separate, like the island rule; the
                # complement segment between them is empty either way)
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        t = texts[doc]
        kept = []
        prev_end = 0
        for s, e in merged:
            kept.append(t[prev_end : s - 1])
            prev_end = e
        kept.append(t[prev_end:])
        out[doc] = "".join(kept)
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None)
@given(_corpus())
def test_removal_matches_python_surgery(spark, docs):
    from marker_spark.cacheutil import release_all
    from marker_spark.ops.dedup import duplicated_spans, remove_duplicated_spans

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    spans_df = duplicated_spans(df, k=K, min_len=MIN_LEN, max_df=10**6, max_occ=10**9)
    span_rows = [
        (r["doc_b"], r["start_b"], r["span_len"]) for r in spans_df.collect()
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_spans(df, spans_df).collect()
    }
    release_all()
    assert got == _reference_removal(docs, span_rows)


def _reference_boilerplate(
    texts: dict[int, str], k: int, min_len: int, max_df: int
) -> set[tuple[int, int, int]]:
    """(doc_id, start, span_len) islands of chars covered by k-grams
    whose document frequency exceeds max_df — straight dict-of-sets
    counting, no Spark concepts anywhere."""
    from collections import defaultdict

    df_docs: dict[str, set[int]] = defaultdict(set)
    for d, t in texts.items():
        for i in range(len(t) - k + 1):
            df_docs[t[i : i + k]].add(d)
    hot = {g for g, s in df_docs.items() if len(s) > max_df}
    out = set()
    for d, t in texts.items():
        spans: list[list[int]] = []
        for pos in range(len(t) - k + 1):
            if t[pos : pos + k] not in hot:
                continue
            s, e = pos + 1, pos + k  # 1-based inclusive char range
            if spans and s <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        for s, e in spans:
            if e - s + 1 >= min_len:
                out.add((d, s, e - s + 1))
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=0, max_size=30),
        min_size=4,
        max_size=14,
    )
)
def test_boilerplate_spans_match_counting_reference(spark, texts_list):
    """Randomized high-DF parity: a 2-letter alphabet makes shared
    k-grams (and within-doc repeats) common, exercising the DF count,
    the hot cutoff boundary, island adjacency merges, and the min_len
    filter against a brute-force dict-of-sets reference."""
    from marker_spark.cacheutil import release_all
    from marker_spark.ops.dedup import boilerplate_spans

    texts = dict(enumerate(texts_list))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {
        (r["doc_id"], r["start"], r["span_len"])
        for r in boilerplate_spans(df, k=4, min_len=6, max_df=2).collect()
    }
    release_all()  # boilerplate_spans registers a persisted gram table
    assert got == _reference_boilerplate(texts, k=4, min_len=6, max_df=2)
