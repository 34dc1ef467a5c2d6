"""Exact-oracle parity for queries whose driver-window slot was
retired (round 7) to make room for newly promoted oracles — the
driver's correctness artifact records only the first ~50 entries, so
twin queries rotate to this local gate instead of losing their exact
check entirely.

Each retired entry keeps its FULL DuckDB oracle SQL here, verbatim as
it last shipped in ``__spark_entry__.oracle_sql()``, and is compared
with the same row-count / column / order-insensitive value discipline
as tests/test_oracles.py.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from marker_spark.cacheutil import release_all

SF_DIR = os.environ.get("MARKER_TEST_SF", "/root/testdata/sf0.001")

# retired round 7: word-unit sibling of the driver-green
# duplicated_spans oracle (same diagonal-run island kernel)
_DUPLICATED_TOKEN_SPANS = """
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM documents WHERE trim(coalesce(text, '')) <> ''
    ), grams AS (
        SELECT doc_id, CAST(t.i AS INT) AS pos,
               array_to_string(
                   words[CAST(t.i AS INT):CAST(t.i AS INT) + 5], ' ') AS g
        FROM w CROSS JOIN UNNEST(CASE WHEN len(words) >= 6
             THEN generate_series(1, len(words) - 5) ELSE [] END) AS t(i)
    ), keep AS (
        SELECT g FROM grams GROUP BY g
        HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 16 AND COUNT(*) <= 64
    ), fg AS (
        SELECT * FROM grams WHERE g IN (SELECT g FROM keep)
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.pos AS pos_a, a.pos - b.pos AS diag
        FROM fg a JOIN fg b USING (g) WHERE a.doc_id < b.doc_id
    ), islands AS (
        SELECT doc_a, doc_b, diag, pos_a,
               pos_a - ROW_NUMBER() OVER (
                   PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
        FROM pairs
    ), spans AS (
        SELECT doc_a, doc_b, MIN(pos_a) AS start_a,
               MIN(pos_a) - diag AS start_b,
               COUNT(*) + 5 AS span_words
        FROM islands GROUP BY doc_a, doc_b, diag, grp
    )
    SELECT CAST(doc_a AS BIGINT) AS doc_a,
           CAST(doc_b AS BIGINT) AS doc_b,
           CAST(start_a AS BIGINT) AS start_a,
           CAST(start_b AS BIGINT) AS start_b,
           CAST(span_words AS BIGINT) AS span_words
    FROM spans WHERE span_words >= 10
    ORDER BY span_words DESC, doc_a, doc_b, start_a, start_b
    LIMIT 20
"""

# retired round 7: per-group sibling of the driver-green sample_uniform
_SAMPLE_STRATIFIED = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(concat_ws('|', CAST(doc_id AS VARCHAR), 's42'))
               ) AS rn
        FROM documents
    ) WHERE rn <= 3
"""


# retired round 7 (late, slot freed for the new semdedup oracle):
# the removal surgery is subsumed by TWO driver-green composed
# excision queries (corpus_prep_spans, boilerplate_excision) whose
# value hashes cover the same cleaned text byte-for-byte
_SPAN_REMOVAL = """
            WITH grams AS (
                SELECT d.doc_id, CAST(t.i AS INT) AS pos,
                       substring(d.text, CAST(t.i AS INT), 24) AS g
                FROM documents d
                CROSS JOIN UNNEST(CASE WHEN length(d.text) >= 24
                     THEN generate_series(1, length(d.text) - 23) ELSE [] END) AS t(i)
            ), keep AS (
                SELECT g FROM grams GROUP BY g
                HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 16 AND COUNT(*) <= 64
            ), fg AS (
                SELECT * FROM grams WHERE g IN (SELECT g FROM keep)
            ), pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.pos AS pos_a, a.pos - b.pos AS diag
                FROM fg a JOIN fg b USING (g) WHERE a.doc_id < b.doc_id
            ), islands0 AS (
                SELECT doc_a, doc_b, diag, pos_a,
                       pos_a - ROW_NUMBER() OVER (
                           PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
                FROM pairs
            ), spans AS (
                SELECT doc_a, doc_b, MIN(pos_a) - diag AS start_b,
                       COUNT(*) + 23 AS span_len
                FROM islands0 GROUP BY doc_a, doc_b, diag, grp
                HAVING COUNT(*) + 23 >= 40
            ), iv0 AS (
                SELECT doc_b AS id, start_b AS s,
                       MAX(start_b + span_len - 1) AS e
                FROM spans GROUP BY doc_b, start_b
            ), ord0 AS (
                SELECT id, s, e, MAX(e) OVER (PARTITION BY id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
                FROM iv0
            ), isl AS (
                SELECT id, s, e, SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                                          THEN 1 ELSE 0 END)
                       OVER (PARTITION BY id ORDER BY s) AS island
                FROM ord0
            ), merged AS (
                SELECT id, island, MIN(s) AS s, MAX(e) AS e
                FROM isl GROUP BY id, island
            ), segs AS (
                SELECT id,
                       COALESCE(LAG(e) OVER (PARTITION BY id ORDER BY s) + 1, 1)
                           AS seg_start,
                       s - 1 AS seg_end
                FROM merged
                UNION ALL
                SELECT id, MAX(e) + 1, NULL FROM merged GROUP BY id
            ), rebuilt AS (
                SELECT d.doc_id, length(d.text) AS n_chars_before,
                       string_agg(
                           CASE WHEN COALESCE(seg_end, length(d.text)) >= seg_start
                                THEN substring(d.text, CAST(seg_start AS INT),
                                     CAST(COALESCE(seg_end, length(d.text))
                                          - seg_start + 1 AS INT))
                                ELSE '' END,
                           '' ORDER BY seg_start) AS text
                FROM documents d JOIN segs ON segs.id = d.doc_id
                GROUP BY d.doc_id, length(d.text)
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars_before AS BIGINT) AS n_chars_before,
                   CAST(length(text) AS BIGINT) AS n_chars_after,
                   text
            FROM rebuilt
            ORDER BY n_chars_before - length(text) DESC, doc_id
            LIMIT 20
        """






# retired round 10 (slot freed for the promoted r9 oracles): the
# exact cosine kernel stays window-certified through ivf_topk, which
# the driver asserts EQUAL to brute force at full probe.
_KNN_BRUTEFORCE = """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
            z AS (
                SELECT e.vec_id,
                       unnest(CAST(e.embedding AS DOUBLE[])) AS ev,
                       unnest(q.qv) AS qe
                FROM embeddings e CROSS JOIN q
            ), s AS (
                SELECT vec_id, sum(ev * qe) AS dot, sqrt(sum(ev * ev)) AS ne
                FROM z GROUP BY vec_id
            ), qn AS (
                SELECT sqrt(sum(x * x)) AS nq FROM (SELECT unnest(qv) AS x FROM q)
            )
            SELECT vec_id, round(dot / (ne * qn.nq), 6) AS cosine
            FROM s, qn
            ORDER BY cosine DESC, vec_id
            LIMIT 10
        """


# retired round 10: subsumed by the driver-green
# embedding_near_dup_lsh (same cosine kernel plus LSH blocking).
_EMBEDDING_NEAR_DUP = """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
        """


# retired round 10: bm25_top_docs exercises the same df/idf + round-6
# + tie-break scoring machinery in the window.
# Summed tf-idf factorizes as tf_total * ln(N/df); round(6) +
# word tie-break keeps ranking engine-independent.
_TFIDF_TOP_TERMS = """
            WITH wd AS (
                SELECT doc_id, source, w AS word
                FROM documents,
                     unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                                 ELSE regexp_split_to_array(trim(text), '\\s+') END) AS t(w)
                WHERE w <> ''
            ), tf AS (
                SELECT source, word, count(*) AS tf FROM wd GROUP BY source, word
            ), dfreq AS (
                SELECT word, count(DISTINCT doc_id) AS df FROM wd GROUP BY word
            ), n AS (
                SELECT count(*) AS n_docs FROM documents
            ), scored AS (
                SELECT source, tf.word AS word,
                       round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
                FROM tf JOIN dfreq ON tf.word = dfreq.word CROSS JOIN n
            )
            SELECT source, word, tfidf FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY tfidf DESC, word) AS rn
                FROM scored
            ) WHERE rn <= 3
            ORDER BY source, tfidf DESC, word
        """


# retired round 10: minhash_lsh_pairs_exact exercises the same
# signature plumbing (per-perm min over md5-permuted shingles).
# MinHash estimator under an exact gate: 16 md5-keyed perms,
# per-perm min over DISTINCT 3-word shingles, pairwise
# agreeing-perm count — identical plumbing in DuckDB.
_MINHASH_SIMILARITY_EXACT = """
            WITH w AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
                FROM documents
                WHERE CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                           ELSE len(regexp_split_to_array(trim(text), '\\s+')) END >= 3
            ), sh AS (
                SELECT DISTINCT doc_id,
                       array_to_string(words[CAST(t.i AS INT):CAST(t.i AS INT) + 2], ' ') AS sh
                FROM w CROSS JOIN UNNEST(generate_series(1, len(words) - 2)) AS t(i)
            ), perms AS (
                SELECT doc_id, p.perm,
                       md5(CAST(p.perm AS VARCHAR) || ':' || sh) AS h
                FROM sh CROSS JOIN UNNEST(generate_series(0, 15)) AS p(perm)
            ), sigs AS (
                SELECT doc_id, perm, MIN(h) AS sig
                FROM perms GROUP BY doc_id, perm
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       COUNT(*) AS n_agree
                FROM sigs a JOIN sigs b USING (perm, sig)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2 HAVING COUNT(*) >= 8
            )
            SELECT CAST(id_a AS BIGINT) AS id_a,
                   CAST(id_b AS BIGINT) AS id_b,
                   CAST(n_agree AS BIGINT) AS n_agree,
                   ROUND(n_agree / 16.0, 6) AS est_jaccard
            FROM pairs
            ORDER BY n_agree DESC, id_a, id_b
            LIMIT 20
        """


# retired round 10: superseded by the stricter, driver-green
# corpus_prep_spans (same quality/dedup/sample pipeline plus span
# excision under byte-exact text hashes).
# Full-pipeline oracle: quality formula == with_text_stats, dedup
# window == min-id per text, sample rank == md5 bottom-k.
_CORPUS_PREP = """
            WITH stats AS (
                SELECT doc_id, source, text,
                       CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
                       CASE WHEN length(text) > 0
                            THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text)
                            ELSE 0.0 END AS punct_ratio,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 w -> w IN ('the','and','of','to','in','is','a'))) END AS n_stop
                FROM documents
            ), q AS (
                SELECT doc_id, source, text,
                       least(n_words / 100.0, 1.0) * 0.3
                       + (1.0 - punct_ratio) * 0.3
                       + least(CASE WHEN n_words > 0 THEN n_stop * 1.0 / n_words ELSE 0.0 END * 5.0, 1.0) * 0.4
                       AS quality
                FROM stats
            ), filtered AS (
                SELECT * FROM q WHERE round(quality, 6) >= 0.5
            ), uniq AS (
                SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rep
                    FROM filtered
                ) WHERE rep = 1
            ), samp AS (
                SELECT doc_id, source, quality,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(concat_ws('|', CAST(doc_id AS VARCHAR), 's42'))
                       ) AS rn
                FROM uniq
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id, source, round(quality, 6) AS quality
            FROM samp WHERE rn <= 3
            ORDER BY source, doc_id
        """


# NEW round 10 (never window-eligible — the window is full at 50/50):
# band-index retention + degenerate-bucket reclaim.  Same md5 banding
# spine as the (now window-certified) incremental_dedup oracle; the
# compaction rule itself is a semi-join + group sizes + an anti-join,
# replayed here as an independent SQL derivation.  Pair-set
# equivalence after compaction (the load-bearing contract) is pinned
# on production signatures in tests/test_incremental_dedup.py.
_BAND_INDEX_COMPACTION = """
    WITH d AS (
        -- deterministic hot-group injection (no natural bucket exceeds
        -- the cap in the fixture): doc_id % 5 == 0 docs share one text
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN 'the quick brown fox jumps over the lazy dog again and again'
                    ELSE text END AS text
        FROM documents
    ), w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM d
        WHERE CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END >= 3
    ), sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(words[CAST(t.i AS INT):CAST(t.i AS INT) + 2], ' ') AS sh
        FROM w CROSS JOIN UNNEST(generate_series(1, len(words) - 2)) AS t(i)
    ), perms AS (
        SELECT doc_id, p.perm,
               md5(CAST(p.perm AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN UNNEST(generate_series(0, 15)) AS p(perm)
    ), sigs AS (
        SELECT doc_id, perm, MIN(h) AS sig
        FROM perms GROUP BY doc_id, perm
    ), bands AS (
        SELECT doc_id, perm // 4 AS band_id,
               md5(string_agg(sig, '|' ORDER BY perm)) AS band_hash
        FROM sigs GROUP BY 1, 2
    ), ret AS (
        SELECT * FROM bands WHERE doc_id % 4 != 0 AND doc_id % 3 != 1
    ), sizes AS (
        SELECT band_id, band_hash, COUNT(*) AS n FROM ret GROUP BY 1, 2
    )
    SELECT CAST(band_id AS INT) AS band_id, band_hash,
           CAST(CASE WHEN n <= 4 THEN n ELSE 0 END AS BIGINT) AS n_rows,
           CAST(CASE WHEN n > 4 THEN n ELSE 0 END AS BIGINT) AS frozen_sz
    FROM sizes
    ORDER BY frozen_sz DESC, n_rows DESC, band_id, band_hash
    LIMIT 100
"""

RETIRED = {
    "band_index_compaction": _BAND_INDEX_COMPACTION,
    "duplicated_token_spans": _DUPLICATED_TOKEN_SPANS,
    "sample_stratified": _SAMPLE_STRATIFIED,
    "span_removal": _SPAN_REMOVAL,
    "knn_bruteforce": _KNN_BRUTEFORCE,
    "embedding_near_dup": _EMBEDDING_NEAR_DUP,
    "tfidf_top_terms": _TFIDF_TOP_TERMS,
    "minhash_similarity_exact": _MINHASH_SIMILARITY_EXACT,
    "corpus_prep": _CORPUS_PREP,
}


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in entrymod.SOURCES_TBL:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_retired_keys_stay_out_of_the_driver_oracle_map():
    """A retired oracle re-entering oracle_sql() without a freed window
    slot would push a live oracle out of certification."""
    live = set(entrymod.oracle_sql())
    assert not (set(RETIRED) & live)
    assert set(RETIRED) <= set(entrymod.queries())


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_query_matches_oracle(spark, ddb, name):
    from tests.test_oracles import _normalize

    sdf = entrymod.queries()[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [r.asDict() for r in sdf.collect()]

    res = ddb.execute(RETIRED[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column mismatch"
    a = _normalize(spark_rows, spark_cols)
    b = _normalize([dict(zip(ddb_cols, r)) for r in ddb_rows], ddb_cols)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    assert a == b, f"{name}: value mismatch\nspark={a[:3]}\nduckdb={b[:3]}"
    release_all()


# ---------------------------------------------------------------------------
# Not retired — never window-eligible: the flagship's METADATA columns.
# flagship_bloom_by_source stays rows-only in the driver because
# fill_ratio is hash-dependent, but (source, n_inserted, m, k) are pure
# arithmetic given the per-source n-gram counts (VERDICT r7 "missing"
# #3): n_inserted = sum(max(n_tok-2, 0)) over whitespace tokens, and
# m/k replay the reference's ceil sizing formulas
# (marker_spark/params.py, /root/reference/markercache.cpp:22-33)
# verbatim in SQL.  This local gate certifies those columns exactly at
# zero driver-window cost.
# ---------------------------------------------------------------------------

_FLAGSHIP_METADATA = """
    WITH tok AS (
        SELECT source,
               CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok
        FROM documents
    ), agg AS (
        SELECT source,
               CAST(SUM(GREATEST(n_tok - 2, 0)) AS BIGINT) AS n_inserted
        FROM tok GROUP BY source
    ), sized AS (
        -- Python int(n * 1.2) truncates: FLOOR, not CAST (DuckDB's
        -- double->int cast ROUNDS); max(cap, 10000) is the factory floor
        SELECT source, n_inserted,
               GREATEST(CAST(FLOOR(n_inserted * 1.2) AS BIGINT), 10000) AS cap
        FROM agg
    ), bits AS (
        -- m = ceil(-(n ln p) / ln^2 2) at p = 0.001 (ceil, not round —
        -- reference parity)
        SELECT source, n_inserted, cap,
               CAST(CEIL(-(cap * LN(0.001)) / (LN(2) * LN(2))) AS BIGINT) AS m
        FROM sized
    )
    SELECT source, n_inserted, m,
           CAST(CEIL((m * 1.0 / cap) * LN(2)) AS BIGINT) AS k
    FROM bits ORDER BY source
"""


def test_flagship_metadata_matches_sql_oracle(spark, ddb):
    from tests.test_oracles import _normalize

    sdf = (
        entrymod.queries()["flagship_bloom_by_source"](spark, SF_DIR)
        .drop("fill_ratio")
    )
    spark_cols = sdf.columns
    spark_rows = [r.asDict() for r in sdf.collect()]

    res = ddb.execute(_FLAGSHIP_METADATA)
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols)
    a = _normalize(spark_rows, spark_cols)
    b = _normalize([dict(zip(ddb_cols, r)) for r in ddb_rows], ddb_cols)
    assert len(a) == len(b) and len(a) > 0
    assert a == b, f"spark={a[:3]}\nduckdb={b[:3]}"
    release_all()
