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

# NEW round 9 (never window-eligible — the driver window is full at
# 50/50): DSIR importance-weighted selection.  The full pipeline —
# md5-prefix hashed-bigram buckets, add-1 smoothed log-likelihood
# ratios over a 1024-bucket spine, summed per-doc weights, seeded
# md5-uniform Gumbel top-k — replays exactly in SQL (the md5-replay
# recipe; every division CASTs to DOUBLE per the DuckDB decimal
# gotcha, CLAUDE.md r7).
_DSIR_SELECTION = """
    WITH tids AS (
        SELECT doc_id FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 50
    ), w AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(coalesce(text, ''))), '\\s+') AS words
        FROM documents
        WHERE trim(coalesce(text, '')) <> ''
    ), bi AS (
        SELECT doc_id,
               ('0x' || substr(md5(array_to_string(
                    words[CAST(t.i AS INT):CAST(t.i AS INT) + 1], ' ')), 1, 8)
               )::BIGINT % 1024 AS bucket
        FROM w CROSS JOIN UNNEST(CASE WHEN len(words) >= 2
             THEN generate_series(1, len(words) - 1) ELSE [] END) AS t(i)
    ), tgt AS (
        SELECT bucket, COUNT(*) AS c_t FROM bi
        WHERE doc_id IN (SELECT doc_id FROM tids) GROUP BY bucket
    ), rawc AS (
        SELECT bucket, COUNT(*) AS c_r FROM bi GROUP BY bucket
    ), tot AS (
        SELECT (SELECT CAST(COALESCE(SUM(c_t), 0) AS DOUBLE) FROM tgt) AS n_t,
               (SELECT CAST(COALESCE(SUM(c_r), 0) AS DOUBLE) FROM rawc) AS n_r
    ), spine AS (
        SELECT r AS bucket FROM range(1024) t(r)
    ), ratio AS (
        SELECT s.bucket,
               ln((CAST(COALESCE(c_t, 0) AS DOUBLE) + 1.0) / (n_t + 1024.0))
             - ln((CAST(COALESCE(c_r, 0) AS DOUBLE) + 1.0) / (n_r + 1024.0))
               AS log_ratio
        FROM spine s LEFT JOIN tgt USING (bucket)
        LEFT JOIN rawc USING (bucket) CROSS JOIN tot
    ), wts AS (
        SELECT d.doc_id,
               COALESCE(x.n_grams, 0) AS n_grams,
               COALESCE(x.log_w, 0.0) AS log_w
        FROM documents d LEFT JOIN (
            SELECT doc_id, COUNT(*) AS n_grams, SUM(log_ratio) AS log_w
            FROM bi JOIN ratio USING (bucket) GROUP BY doc_id
        ) x USING (doc_id)
    ), sel AS (
        SELECT doc_id, n_grams, log_w,
               ROUND(log_w - ln(-ln(
                   (CAST(('0x' || substr(md5(concat_ws('|',
                        CAST(doc_id AS VARCHAR), 'dsir-r9')), 1, 8))::BIGINT
                    AS DOUBLE) + 0.5) / 4294967296.0)), 6) AS gumbel_key
        FROM wts
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           ROUND(log_w, 6) AS log_w,
           gumbel_key
    FROM sel
    ORDER BY gumbel_key DESC, doc_id
    LIMIT 20
"""

# NEW round 9 (never window-eligible): incremental MinHash-LSH dedup
# against a persisted band index.  The driver entry runs the PRODUCTION
# kernel (incremental_pairs_from_bands: index join + within-increment
# self-join + joint-size bucket cap) over md5-keyed signatures; the
# oracle exploits the kernel's pinned equivalence (tests/
# test_incremental_dedup.py) — incremental-with-joint-cap == batch-
# with-cap over the union, restricted to pairs touching a new doc
# (doc_id % 4 == 0) — so the SQL is the BATCH banding rule + the
# restriction, a genuinely independent derivation of the same set.
_INCREMENTAL_DEDUP = """
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
    ), bands AS (
        SELECT doc_id, perm // 4 AS band,
               md5(string_agg(sig, '|' ORDER BY perm)) AS band_hash
        FROM sigs GROUP BY 1, 2
    ), ok AS (
        SELECT band, band_hash FROM bands
        GROUP BY band, band_hash HAVING COUNT(*) <= 4
    ), fb AS (
        SELECT b.* FROM bands b JOIN ok USING (band, band_hash)
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM fb a JOIN fb b USING (band, band_hash)
        WHERE a.doc_id < b.doc_id
    )
    SELECT CAST(id_a AS BIGINT) AS id_a,
           CAST(id_b AS BIGINT) AS id_b,
           CASE WHEN id_a % 4 = 0 AND id_b % 4 = 0
                THEN 'new-new' ELSE 'cross' END AS link
    FROM pairs
    WHERE id_a % 4 = 0 OR id_b % 4 = 0
    ORDER BY id_a, id_b
    LIMIT 50
"""

# NEW round 9 (never window-eligible): canonical selection — per
# duplicate cluster keep the highest-quality member.  The
# dedup_clusters recursive CTE (driver-green) extended with the
# corpus_prep quality formula (driver-green) and the ROW_NUMBER
# keep-best rule; quality is ROUND(.,6) on BOTH engines before
# ordering so the argmax can't split on sub-1e-6 float differences.
_CANONICAL_SELECTION = """
    WITH RECURSIVE w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM documents
        WHERE CASE WHEN trim(text) = '' THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END >= 3
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS sh
        FROM w, unnest(range(1, len(words) - 1)) AS t(i)
    ), sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), prs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM prs
        UNION
        SELECT id_b AS a, id_a AS b FROM prs
    ), reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
        SELECT a AS doc_id, least(a, min(b)) AS component
        FROM reach GROUP BY a
    ), stats AS (
        SELECT doc_id,
               CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
               CASE WHEN length(text) > 0
                    THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text)
                    ELSE 0.0 END AS punct_ratio,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x IN ('the','and','of','to','in','is','a'))) END AS n_stop
        FROM documents
    ), q AS (
        SELECT doc_id,
               ROUND(least(n_words / 100.0, 1.0) * 0.3
                   + (1.0 - punct_ratio) * 0.3
                   + least(CASE WHEN n_words > 0 THEN n_stop * 1.0 / n_words
                           ELSE 0.0 END * 5.0, 1.0) * 0.4, 6) AS quality
        FROM stats
    ), m AS (
        SELECT c.doc_id, c.component, q.quality
        FROM comp c JOIN q USING (doc_id)
    ), ranked AS (
        SELECT doc_id, component, quality,
               ROW_NUMBER() OVER (
                   PARTITION BY component ORDER BY quality DESC, doc_id) AS rn
        FROM m
    ), canon AS (
        SELECT component, doc_id AS canonical_id FROM ranked WHERE rn = 1
    )
    SELECT CAST(m.doc_id AS BIGINT) AS doc_id,
           CAST(m.component AS BIGINT) AS component,
           m.quality,
           CAST(c.canonical_id AS BIGINT) AS canonical_id,
           (m.doc_id = c.canonical_id) AS keep
    FROM m JOIN canon c USING (component)
    ORDER BY doc_id
"""

# NEW round 9 (never window-eligible): token-budget corpus sizing.
# The Spark side runs the distributed prefix-sum plan
# (repartitionByRange + bounded per-partition offsets + within-
# partition window); the oracle is the plain single-threaded window
# cumsum — an independent derivation of the same rank totals.
_TOKEN_BUDGET_SELECTION = """
    WITH stats AS (
        SELECT doc_id,
               CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
               CASE WHEN length(text) > 0
                    THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text)
                    ELSE 0.0 END AS punct_ratio,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x IN ('the','and','of','to','in','is','a'))) END AS n_stop
        FROM documents
    ), q AS (
        SELECT doc_id, n_tok,
               ROUND(least(n_tok / 100.0, 1.0) * 0.3
                   + (1.0 - punct_ratio) * 0.3
                   + least(CASE WHEN n_tok > 0 THEN n_stop * 1.0 / n_tok
                           ELSE 0.0 END * 5.0, 1.0) * 0.4, 6) AS quality
        FROM stats
    ), ranked AS (
        SELECT doc_id, n_tok, quality,
               COALESCE(SUM(n_tok) OVER (
                   ORDER BY quality DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
        FROM q
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_tok AS BIGINT) AS n_tok,
           quality,
           CAST(cum_before AS BIGINT) AS cum_before
    FROM ranked
    WHERE cum_before < 1000
    ORDER BY quality DESC, doc_id
    LIMIT 50
"""

# NEW round 9: the per-source curriculum twin of token-budget sizing.
# Same quality formula; the cumsum window is PARTITIONED BY source and
# each source keeps its own 500-token budget.
_SOURCE_BUDGET_SELECTION = """
    WITH stats AS (
        SELECT doc_id, source,
               CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
               CASE WHEN length(text) > 0
                    THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text)
                    ELSE 0.0 END AS punct_ratio,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x IN ('the','and','of','to','in','is','a'))) END AS n_stop
        FROM documents
    ), q AS (
        SELECT doc_id, source, n_tok,
               ROUND(least(n_tok / 100.0, 1.0) * 0.3
                   + (1.0 - punct_ratio) * 0.3
                   + least(CASE WHEN n_tok > 0 THEN n_stop * 1.0 / n_tok
                           ELSE 0.0 END * 5.0, 1.0) * 0.4, 6) AS quality
        FROM stats
    ), ranked AS (
        SELECT doc_id, source, n_tok, quality,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
        FROM q
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           source,
           CAST(n_tok AS BIGINT) AS n_tok,
           quality,
           CAST(cum_before AS BIGINT) AS cum_before
    FROM ranked
    WHERE cum_before < 500
    ORDER BY source, quality DESC, doc_id
    LIMIT 50
"""

RETIRED = {
    "duplicated_token_spans": _DUPLICATED_TOKEN_SPANS,
    "sample_stratified": _SAMPLE_STRATIFIED,
    "span_removal": _SPAN_REMOVAL,
    "dsir_selection": _DSIR_SELECTION,
    "incremental_dedup": _INCREMENTAL_DEDUP,
    "canonical_selection": _CANONICAL_SELECTION,
    "token_budget_selection": _TOKEN_BUDGET_SELECTION,
    "source_budget_selection": _SOURCE_BUDGET_SELECTION,
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
