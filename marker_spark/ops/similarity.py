"""Similarity search over embedding columns (array<float>).

 * Brute-force cosine top-k: exact baseline — JVM-side dot products
   (zip_with/aggregate), no Python in the scoring loop; a broadcast of
   the query vector keeps it a narrow map + top-k (TakeOrderedAndProject).
 * LSH-bucketed ANN: random-hyperplane signatures (deterministic
   seed) assign each vector to a Hamming bucket; queries probe only
   matching (and optionally neighboring) buckets — the scale path where
   brute force would scan 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine_to_query(vec_col, query: list[float]):
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, qlit, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (norm * F.lit(qn))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: narrow scan + orderBy/limit (Spark plans it
    as TakeOrderedAndProject — per-partition heaps, no full sort)."""
    cos = _cosine_to_query(F.col(vec_col), query)
    return (
        df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Adds `bucket: long` — sign pattern against n random hyperplanes.

    Arrow-batched numpy matmul; the plane matrix is baked into the UDF
    closure (tiny: dim x n_planes).
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf("long")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # [N, dim]
        signs = (mat.astype(np.float64) @ planes) > 0  # [N, n_planes]
        weights = (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        return pd.Series((signs * weights).sum(axis=1))

    return df.withColumn("bucket", bucket_udf(F.col(vec_col)))


def lsh_topk(
    df_with_buckets: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    probe_hamming: int = 2,
) -> DataFrame:
    """ANN top-k: score only vectors whose bucket is within
    `probe_hamming` bit flips of the query's bucket (multi-probe LSH).
    The bucket filter is a pushdown-able IN-list predicate — at scale,
    with the table written bucketed/partitioned by `bucket`, this scans
    a tiny fraction of files."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((len(query), n_planes))
    q = np.asarray(query, dtype=np.float64)
    qbucket = int(((q @ planes) > 0).astype(np.int64) @ (1 << np.arange(n_planes, dtype=np.int64)))

    probe = {qbucket}
    if probe_hamming >= 1:
        for i in range(n_planes):
            probe.add(qbucket ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probe.add(qbucket ^ (1 << i) ^ (1 << j))

    cos = _cosine_to_query(F.col(vec_col), query)
    return (
        df_with_buckets.where(F.col("bucket").isin(list(probe)))
        .select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
