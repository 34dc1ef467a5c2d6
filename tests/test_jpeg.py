"""Baseline JPEG codec: spec-table construction, transform identities,
lossy-roundtrip bounds, and the honesty contract for unsupported
streams.  No external codec exists in this container, so the gates are
(a) spec constants verifiable by hand (Annex K tables, canonical code
assignment per C.2), (b) mathematical identities (DCT orthonormality),
and (c) roundtrip error bounds chosen from the quantization tables
themselves — a symmetric encoder+decoder bug cannot pass (b) or the
DC-only solid-color bound in (c)."""

from __future__ import annotations

import numpy as np
import pytest

from marker_spark.ops.jpeg import (
    DCT_M,
    ZIGZAG,
    build_huffman_codes,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    decode_jpeg,
    encode_jpeg,
)


def test_dct_matrix_is_orthonormal():
    assert np.allclose(DCT_M @ DCT_M.T, np.eye(8), atol=1e-12)
    # DCT of a constant block is DC-only, with the spec's 8x gain
    block = np.full((8, 8), 5.0)
    coef = DCT_M @ block @ DCT_M.T
    assert np.isclose(coef[0, 0], 40.0)  # 8 * 5
    assert np.abs(coef).sum() == pytest.approx(40.0)


def test_zigzag_is_a_permutation_with_known_prefix():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # first diagonal entries per spec figure 5: 0,1,8,16,9,2,3,10
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]


def test_canonical_huffman_assignment_matches_spec_example():
    """Annex K DC luminance: BITS=(0,1,5,1,...) assigns category 0 the
    single 2-bit code 00, categories 1-5 the 3-bit codes 010..110 —
    the canonical construction of spec section C.2."""
    codes = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    # prefix-free: no code is a prefix of another
    as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
    for a in as_bits:
        for b in as_bits:
            assert a == b or not b.startswith(a)


def test_solid_color_roundtrip_is_near_exact():
    """A solid block quantizes to DC-only; roundtrip error is bounded
    by half a luminance DC quantization step (8 levels of 16 / gain 8
    -> ~1 intensity level) plus color-transform rounding."""
    for rgb in [(128, 128, 128), (255, 0, 0), (10, 200, 90), (0, 0, 0)]:
        img = np.tile(np.array(rgb, dtype=np.uint8), (24, 16, 1))
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == img.shape
        assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 3, rgb


def test_smooth_gradient_roundtrip_bounded():
    h, w = 40, 56  # non-multiple-of-8 exercises edge padding
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 / (w - 1)),
            (yy * 255 / (h - 1)),
            ((xx + yy) * 255 / (w + h - 2)),
        ],
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0
    assert err.max() <= 32  # ringing at block edges stays bounded


def test_grayscale_single_component():
    img = np.linspace(0, 255, 32 * 32).reshape(32, 32).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (32, 32, 3)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).mean() < 3.0
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_textured_image_psnr():
    rng = np.random.default_rng(7)
    base = rng.integers(60, 196, size=(5, 6, 3)).astype(np.float64)
    img = np.clip(
        np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
        + rng.normal(0, 4, size=(40, 48, 3)),
        0,
        255,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
    assert psnr > 28.0, psnr


def test_progressive_and_junk_rejected():
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    sof = payload.find(b"\xff\xc0")
    assert sof > 0
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_multimodal_dispatch_decodes_jpeg():
    """The multimodal feature path must accept a real JPEG payload."""
    from marker_spark.ops.multimodal import _decode_stub

    img = np.tile(np.array([200, 40, 90], dtype=np.uint8), (16, 16, 1))
    feats = _decode_stub(encode_jpeg(img), "image", fake=False)
    # channel means land near the source color (lossy tolerance)
    assert np.allclose(feats[:3], np.array([200, 40, 90]) / 255.0, atol=0.05)


def test_subsampled_420_roundtrip():
    """4:2:0 exercises the decoder's interleaved-MCU + chroma-upsample
    path (the layout nearly all real-world JPEGs use)."""
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 / (w - 1)),
            (yy * 255 / (h - 1)),
            ((xx + yy) * 255 / (w + h - 2)),
        ],
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4.0  # chroma halving adds a little error
    assert err.max() <= 48

    solid = np.tile(np.array([30, 180, 220], dtype=np.uint8), (32, 32, 1))
    out2 = decode_jpeg(encode_jpeg(solid, subsample=True))
    assert np.max(np.abs(out2.astype(int) - solid.astype(int))) <= 3


def test_truncated_entropy_stream_raises_value_error():
    """A crawl payload cut mid-scan must fail as a classifiable decode
    error (ValueError), not an unhandled IndexError from the bit reader."""
    img = np.tile(np.arange(16, dtype=np.uint8)[:, None, None] * 16, (1, 16, 3))
    payload = encode_jpeg(img)
    eoi = payload.rfind(b"\xff\xd9")
    assert eoi > 0
    truncated = payload[: max(eoi - 40, eoi // 2)]  # cut well inside the scan
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(truncated)
