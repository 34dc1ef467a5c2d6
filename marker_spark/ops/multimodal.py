"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a metadata struct; decode
and feature extraction run as Arrow-batched `mapInPandas` so payload
bytes never round-trip through per-row Python.

Codec coverage: one REAL format per modality is implemented in pure
numpy so the full decode -> feature path runs end-to-end with no codec
libraries — uncompressed 24-bit BMP for images (header-parse +
stride/BGR handling) and PCM16 WAV for audio (RIFF chunk walk).
Compressed formats (JPEG/PNG/MP3/video) raise NotImplementedError with
`fake=False`; `fake=True` substitutes a deterministic synthetic decode
so plumbing tests don't depend on payload format.
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


# --- real pure-numpy codecs (one format per modality) ------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """[H, W, 3] uint8 RGB -> uncompressed 24-bit BI_RGB BMP bytes
    (bottom-up rows, 4-byte-aligned stride)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> float64 [H, W, 3] RGB in [0,1].
    Pure numpy: header parse, stride trim, BGR->RGB, bottom-up flip."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h_signed = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (bpp={bpp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    buf = np.frombuffer(payload, np.uint8, offset=data_off, count=stride * h)
    img = buf.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    if h_signed > 0:
        img = img[::-1]
    return img.astype(np.float64) / 255.0


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 [N] or [N, C] PCM samples -> WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.tobytes()
    block = n_ch * 2
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + n_ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV -> (float64 [N, C] in [-1, 1], sample_rate).
    Pure numpy RIFF chunk walk (fmt + data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    off, n_ch, rate, bits, data = 12, None, None, None, None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        size = int.from_bytes(payload[off + 4 : off + 8], "little")
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt_tag = int.from_bytes(body[0:2], "little")
            n_ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(f"only PCM16 WAV supported (tag={fmt_tag}, bits={bits})")
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if n_ch is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    s = np.frombuffer(data, dtype="<i2")
    s = s[: len(s) // n_ch * n_ch].reshape(-1, n_ch)
    return s.astype(np.float64) / 32768.0, rate


def _image_features(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] floats -> FEATURE_DIM vector: per-channel mean+std (6)
    + 26-bin normalized luminance histogram."""
    means = img.mean(axis=(0, 1))
    stds = img.std(axis=(0, 1))
    luma = img @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=FEATURE_DIM - 6, range=(0.0, 1.0))
    hist = hist / max(luma.size, 1)
    return np.concatenate([means, stds, hist])


def _audio_features(samples: np.ndarray) -> np.ndarray:
    """[N, C] floats -> FEATURE_DIM vector: RMS energy of FEATURE_DIM
    equal time segments (mono mix)."""
    mono = samples.mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(FEATURE_DIM)
    edges = np.linspace(0, n, FEATURE_DIM + 1).astype(np.int64)
    out = np.zeros(FEATURE_DIM)
    sq = mono * mono
    csum = np.concatenate(([0.0], np.cumsum(sq)))
    seg_n = np.maximum(edges[1:] - edges[:-1], 1)
    out = np.sqrt((csum[edges[1:]] - csum[edges[:-1]]) / seg_n)
    return out


def _decode_stub(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    if fake:
        # Deterministic fake: payload bytes folded into FEATURE_DIM floats.
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        pad = (-len(arr)) % FEATURE_DIM
        if pad:
            arr = np.concatenate([arr, np.zeros(pad)])
        return arr.reshape(-1, FEATURE_DIM).mean(axis=0) / 255.0
    # real decode: dispatch on payload magic, not just `kind`
    if payload[:2] == b"BM":
        return _image_features(decode_bmp(payload))
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, _ = decode_wav(payload)
        return _audio_features(samples)
    raise NotImplementedError(
        f"real decode for kind={kind!r} supports uncompressed BMP and PCM16 "
        "WAV (pure numpy); compressed formats need codec libraries not "
        "present in this environment — pass fake=True for the synthetic path"
    )


def synth_real_assets(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Asset table whose payloads are REAL encoded formats — BMP images
    and PCM16 WAV audio — so the fake=False decode path runs end-to-end
    with no codec libraries."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append(
                (f"real-{i:06d}", "image", encode_bmp(img),
                 {"width": w, "height": h, "sample_rate": None, "n_frames": None})
            )
        else:
            n_samp = int(rng.integers(256, 4096))
            samples = rng.integers(-32768, 32767, size=n_samp, dtype=np.int16)
            rows.append(
                (f"real-{i:06d}", "audio", encode_wav(samples, 16000),
                 {"width": None, "height": None, "sample_rate": 16000, "n_frames": None})
            )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Distributed image resize over real BMP payloads: decode ->
    nearest-neighbor index sampling -> re-encode BMP.  mapInPandas so
    payload bytes stay in Arrow batches; non-image rows pass through
    untouched (payload and meta unchanged)."""
    out_schema = ASSET_SCHEMA

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if k == "image" and bytes(p[:2]) == b"BM":
                    img = decode_bmp(bytes(p))
                    h0, w0, _ = img.shape
                    yi = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                    xi = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                    small = (img[yi][:, xi] * 255.0).round().astype(np.uint8)
                    payloads.append(encode_bmp(small))
                    m = dict(m)
                    m["width"], m["height"] = width, height
                    metas.append(m)
                else:
                    payloads.append(p)
                    metas.append(m)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.mapInPandas(fn, schema=out_schema)


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
