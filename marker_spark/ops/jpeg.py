"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec in pure numpy +
stdlib — no codec libraries, matching the multimodal module's BMP/PNG/
WAV story (ops/multimodal.py): decode is the distributed hot path
(Arrow-batched callers), encode exists so tests and asset synthesis
can produce real compressed payloads.

Scope (honest): baseline sequential DCT (SOF0), 8-bit precision,
Huffman entropy coding, grayscale or YCbCr with sampling factors up to
2x2 (4:4:4, 4:2:2, 4:2:0), restart markers.  Progressive (SOF2),
arithmetic coding, and 12-bit precision raise NotImplementedError.

All constant tables below are the public Annex K example tables of the
spec (quantization K.1/K.2, Huffman K.3.3); the encoder always emits
4:4:4 with those tables, which any conformant reader accepts.

The entropy decode loop is per-bit Python — inherently serial per
scan; parallelism at corpus scale comes from one-payload-per-row
distribution (each executor decodes different images), not from inside
a single image.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K quantization tables (natural / row-major order) --------------
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# --- Annex K Huffman tables: (BITS[1..16], HUFFVAL) -----------------------
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# zigzag scan: ZIGZAG[i] = natural index of the i-th zigzag coefficient
_z = np.arange(64).reshape(8, 8)
_order = []
for s in range(15):
    diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
    if s % 2 == 0:
        diag.reverse()
    _order.extend(diag)
ZIGZAG = np.array([_z[i, j] for i, j in _order], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II matrix
_k = np.arange(8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
DCT_M[0] *= 1.0 / np.sqrt(2.0)


def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG code assignment (spec C.2): symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _encode_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """[H, W] level-shifted floats -> [n_blocks, 64] quantized zigzag
    int32 (blocks in raster order; H, W multiples of 8)."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = np.einsum("ux,nxy,vy->nuv", DCT_M, blocks, DCT_M)
    q = np.round(coef / qt).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _write_block(bw: _BitWriter, block: np.ndarray, pred: int, dc_tab, ac_tab) -> int:
    """Entropy-code one zigzag block; returns the new DC predictor."""
    dc = int(block[0])
    size, bits = _magnitude(dc - pred)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    nz = np.flatnonzero(block[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(block[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg(img: np.ndarray, subsample: bool = False) -> bytes:
    """[H, W, 3] uint8 RGB (or [H, W] / [H, W, 1] grayscale) -> baseline
    JFIF bytes with Annex K tables.  ``subsample=True`` emits 4:2:0
    (2x2-averaged chroma, interleaved 16x16 MCUs — the layout nearly
    all real-world JPEGs use); default is 4:4:4."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc == 1:
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128
        planes = [y, cb, cr]
    sub = subsample and len(planes) > 1
    hv = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * len(planes)
    mcu_px = 16 if sub else 8
    ph = (h + mcu_px - 1) // mcu_px * mcu_px
    pw = (w + mcu_px - 1) // mcu_px * mcu_px
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]
    if sub:
        for ci in (1, 2):
            p = planes[ci]
            planes[ci] = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    planes = [p - 128.0 for p in planes]
    qts = [QT_LUMA] + [QT_CHROMA] * (len(planes) - 1)
    zz = [_encode_blocks(p, qt) for p, qt in zip(planes, qts)]
    pws = [p.shape[1] for p in planes]

    dc_tabs = [build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tabs = [build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if len(planes) > 1:
        dc_tabs.append(build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_tabs.append(build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcux = pw // mcu_px
    mcuy = ph // mcu_px
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(planes)):
                ch, cv = hv[ci]
                bw_blocks = pws[ci] // 8
                for by in range(cv):
                    for bx in range(ch):
                        r = my * cv + by
                        c = mx * ch + bx
                        pred[ci] = _write_block(
                            bw,
                            zz[ci][r * bw_blocks + c],
                            pred[ci],
                            dc_tabs[min(ci, 1)],
                            ac_tabs[min(ci, 1)],
                        )
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + QT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    if len(planes) > 1:
        out += seg(0xDB, b"\x01" + QT_CHROMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    comps = b""
    for ci in range(len(planes)):
        ch, cv = hv[ci]
        comps += struct.pack("BBB", ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1)
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, len(planes)) + comps)
    for tc, th, bits, vals in [
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ] + (
        [
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
        if len(planes) > 1
        else []
    ):
        out += seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        td = 0 if ci == 0 else 1
        sos += bytes([ci + 1, td << 4 | td])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    stops at any real marker (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG stream")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG stream")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        # mask consumed bits out BEFORE appending: without this the
        # accumulator grows into an unbounded big-int and decode time
        # goes quadratic in the entropy-stream size (measured 13.8x
        # for 4x the pixels)
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop pad bits and step past an expected restart marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and (d[self.pos] != 0xFF or d[self.pos + 1] == 0x00):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("truncated JPEG stream")
        if 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, ln) in build_huffman_codes(bits, vals).items():
        out[(ln, code)] = sym
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> [H, W, 3] uint8 RGB (grayscale replicated).

    Raises NotImplementedError for progressive / arithmetic / 12-bit
    streams — the same honesty contract as the other codecs here."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n - 1:
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        while i + 1 < n and payload[i + 1] == 0xFF:  # optional fill bytes (B.1.1.2)
            i += 1
        if i + 1 >= n:
            raise ValueError("truncated JPEG stream")
        m = payload[i + 1]
        if m == 0xD9:
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated JPEG stream")
        (ln,) = struct.unpack_from(">H", payload, i + 2)
        if i + 2 + ln > n:
            raise ValueError("truncated JPEG stream")
        body = payload[i + 4 : i + 2 + ln]
        if m == 0xDB:  # DQT: one or more tables
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                tab = np.frombuffer(body, dtype=np.uint8, count=64, offset=p + 1)
                qts[tq] = tab[UNZIGZAG].reshape(8, 8).astype(np.int32)
                p += 65
        elif m == 0xC4:  # DHT: one or more tables
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(body[p + 17 : p + 17 + cnt])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + cnt
        elif m == 0xC0 or m == 0xC1:  # baseline / extended sequential
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0/1) supported, got SOF marker FF{m:02X}"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(frame["comps"]):
                # one-scan-per-component baseline is legal per T.81 but
                # not implemented; decoding just the first scan would
                # silently drop the color components
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG not supported"
                )
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "td": tt >> 4, "ta": tt & 0x0F})
            return _decode_scan(
                payload, i + 2 + ln, frame, scan, qts, huff, restart_interval
            )
        i += 2 + ln
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qts, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in scan:
        pw = mcux * c["h"] * 8
        ph = mcuy * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_to_marker()
                pred = [0] * len(scan)
            try:
                for ci, c in enumerate(scan):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block = np.zeros(64, dtype=np.int32)
                            sym = _read_symbol(br, huff[(0, c["td"])])
                            diff = _extend(br.read_bits(sym), sym)
                            pred[ci] += diff
                            block[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _read_symbol(br, huff[(1, c["ta"])])
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC run overflow")
                                block[k] = _extend(br.read_bits(s), s)
                                k += 1
                            deq = (block[UNZIGZAG].reshape(8, 8) * qts[c["tq"]]).astype(
                                np.float64
                            )
                            pix = np.einsum("ux,uv,vy->xy", DCT_M, deq, DCT_M)
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            except _RestartMarker:
                raise ValueError("unexpected restart marker mid-MCU") from None
            mcu_count += 1
    out_planes = []
    for ci, c in enumerate(scan):
        p = planes[ci] + 128.0
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(out_planes[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
