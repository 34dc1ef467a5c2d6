"""Deterministic, mergeable sampling for training-data pipelines.

Bottom-k sampling: rank every row by a cryptographic hash of its id
(+ salt) and keep the k smallest.  Properties that matter at 10^12
rows:

 * **uniform** — md5 output is uniform over ids, so the k smallest are
   a uniform sample without replacement;
 * **mergeable / distributed-friendly** — bottom-k of a union is the
   bottom-k of the per-partition bottom-k's, which is exactly what
   Spark's TakeOrderedAndProject computes (per-partition heaps, no
   full sort, no shuffle of losers);
 * **deterministic & engine-independent** — md5 agrees between Spark
   and DuckDB, so the sample is exactly SQL-oracle-able and stable
   across reruns/resumes (a re-run samples the SAME rows — the
   resumability property rand() cannot give);
 * **re-salted** — changing `salt` draws an independent sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rank_col(id_col: str, salt: str):
    return F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt)))


def bottom_k_sample(
    df: DataFrame, k: int, id_col: str = "doc_id", salt: str = "s42"
) -> DataFrame:
    """Uniform deterministic sample of k rows (TakeOrderedAndProject)."""
    return (
        df.withColumn("__rk", _rank_col(id_col, salt))
        .orderBy("__rk")
        .limit(k)
        .drop("__rk")
    )


def stratified_bottom_k(
    df: DataFrame,
    k_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "s42",
) -> DataFrame:
    """k rows per group: hash-rank within each group (one shuffle keyed
    by the group, per-group heaps via window row_number)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(_rank_col(id_col, salt))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k_per_group)
        .drop("__rn")
    )


def weighted_interleave(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "s42",
) -> DataFrame:
    """Deterministic curriculum mixing — interleave sources into one
    stream whose every prefix holds each source in (close to) its
    configured proportion, via STRIDE SCHEDULING: the i-th doc of
    source s (i = 1-based md5-rank within s) gets virtual time
    i / weight_s, and the stream is ordered by (vt, source, rank).  A
    length-L prefix then contains floor/ceil(weight_s * L) docs of s —
    the property round-robin gives for equal weights, generalized.

    Sources absent from ``weights`` are dropped (weight 0).  Returns
    the input columns plus ``mix_vt`` (double); consume a bounded
    training prefix with ``orderBy('mix_vt', group_col).limit(n)`` —
    a TakeOrdered, no global sort or single-partition window.  The
    per-source rank is the same md5 order as :func:`bottom_k_sample`,
    so the mix is engine-independent and resume-stable, and i/w is one
    IEEE division of exact integers — bit-identical in any engine.
    """
    bad = {g: w for g, w in weights.items() if w <= 0}
    if bad:
        raise ValueError(f"weights must be positive, got {bad}")
    from pyspark.sql import Window

    wts = F.create_map(
        *[x for g, w in sorted(weights.items()) for x in (F.lit(g), F.lit(float(w)))]
    )
    w_rank = Window.partitionBy(group_col).orderBy(_rank_col(id_col, salt))
    return (
        df.where(F.col(group_col).isin(list(weights)))
        .withColumn("__i", F.row_number().over(w_rank))
        .withColumn("mix_vt", F.col("__i") / wts[F.col(group_col)])
        .drop("__i")
    )
