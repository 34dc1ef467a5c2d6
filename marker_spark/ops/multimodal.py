"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a metadata struct; decode
and feature extraction run as Arrow-batched `mapInPandas` so payload
bytes never round-trip through per-row Python.  The actual codec step
is STUBBED (no image/audio libraries in this environment): real decode
raises NotImplementedError, while `fake=True` substitutes a
deterministic synthetic decode so the Spark-side plumbing — schema,
batch shapes, partitioning, UDF signatures — is fully exercised and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 32


def synth_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        meta = {
            "width": int(rng.integers(16, 256)) if kind != "audio" else None,
            "height": int(rng.integers(16, 256)) if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": int(rng.integers(1, 120)) if kind == "video" else None,
        }
        rows.append((f"asset-{i:06d}", kind, payload, meta))
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def _decode_stub(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real image/audio/video decode requires codec libraries not "
            "present in this environment; pass fake=True for the "
            "deterministic synthetic decode"
        )
    # Deterministic fake: payload bytes folded into FEATURE_DIM floats.
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad)])
    return arr.reshape(-1, FEATURE_DIM).mean(axis=0) / 255.0


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """asset table -> (asset_id, kind, feature array<double>, n_bytes).

    mapInPandas: one Arrow batch in, vectorized feature math, one batch
    out — the shape a real decoder plugs into unchanged.
    """
    out_schema = "asset_id string, kind string, feature array<double>, n_bytes long"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p, k, fake) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(fn, schema=out_schema)


def frame_sample(df: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """video rows -> one row per sampled frame index (UDTF-style
    explode); frame decode itself is the stub."""
    frames = F.when(
        F.col("kind") == "video",
        F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)),
    ).otherwise(F.array(F.lit(0)))
    out = df.withColumn("frame_idx", F.explode(frames))
    if not fake:
        raise NotImplementedError("real frame decode not available in this environment")
    return out.select("asset_id", "kind", "frame_idx")
