"""Baseline JFIF JPEG codec in pure numpy/stdlib — a REAL compressed
format for the multimodal image path (no Pillow/libjpeg in this
container, so the container's only way to a standards-compliant
compressed format is to implement one).

Scope (documented subset of ITU-T T.81):

* encoder: baseline sequential DCT, 8-bit, YCbCr 4:4:4 (no subsampling
  — keeps the MCU loop trivial and the PSNR headroom large), Annex K
  quantization tables scaled by the libjpeg quality formula, Annex K
  Huffman tables, JFIF APP0;
* decoder: baseline SOF0, 8-bit, 1- or 3-component, 4:4:4 only (the
  shapes this repo's encoder emits, plus grayscale), DQT/DHT taken from
  the stream (NOT assumed), DRI/RSTn restart intervals honored (DC
  predictors reset + byte-aligned reader restart at every RST marker,
  T.81 §E.2.4 — so externally encoded streams with restarts decode
  correctly, not silently corrupt).

The decoder reads every table from the file, so any standards-compliant
baseline 4:4:4 JPEG decodes here, and files encoded here carry complete
tables and decode in any standard viewer.  DCT/quantization and the
pixel-side color transforms are vectorized numpy over all blocks at
once; only the entropy (Huffman) layer is a per-symbol Python loop, and
images flow through it inside Arrow ``mapInPandas`` batches (the same
honest budget as every decode path in images/ops.py).

PSNR: at the default quality (95) the synthetic corpus measures ≥ 40 dB
(BASELINE.json's lossy bound), pinned by tests/test_images.py.
"""
from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag, Annex K quantization + Huffman tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)

_QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))

_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert sum(_AC_LUM_BITS) == len(_AC_LUM_VALS) == 162
assert sum(_AC_CHROM_BITS) == len(_AC_CHROM_VALS) == 162

_N = 8
_k = np.arange(_N)
_DCT = np.sqrt(2.0 / _N) * np.cos(
    np.pi * (2 * _k[None, :] + 1) * _k[:, None] / (2 * _N))
_DCT[0, :] = np.sqrt(1.0 / _N)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, idx = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling; returns int steps in NATURAL (row) order."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """MSB-first reader over an already-unstuffed byte string."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy stream truncated")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _quantized_blocks(chan: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """channel -> (n_blocks_y, n_blocks_x, 64) zigzag-ordered quantized
    int32 coefficients — all-blocks-at-once numpy."""
    h, w = chan.shape
    ph, pw = (-h) % _N, (-w) % _N
    padded = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    H, W = padded.shape
    blocks = padded.reshape(H // _N, _N, W // _N, _N).transpose(0, 2, 1, 3)
    # same contraction through broadcast matmul (BLAS); the 3-operand
    # einsum takes the scalar c_einsum path (see images/codec.py)
    coeffs = _DCT @ (blocks - 128.0) @ _DCT.T
    q = np.round(coeffs / qt.reshape(_N, _N)).astype(np.int32)
    return q.reshape(H // _N, W // _N, 64)[:, :, ZIGZAG]


def _encode_block(writer: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = int(abs(diff)).bit_length()
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    nz = np.nonzero(zz[1:])[0]
    last = 0
    for idx in nz:
        run = int(idx) - last
        last = int(idx) + 1
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        v = int(zz[1 + idx])
        size = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 95,
                grayscale: bool = False,
                restart_interval: int = 0) -> bytes:
    """RGB uint8 (h, w, 3) -> baseline JFIF bytes (4:4:4, or 1-component
    luma-only when ``grayscale``).  ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that-many MCUs (T.81 §E.2.4) — mainly
    exercised by tests so the decoder's restart path is pinned against a
    real stream; production encodes default to 0 (no restarts)."""
    h, w, _ = img.shape
    assert h > 0 and w > 0 and h < 65536 and w < 65536
    ncomp = 1 if grayscale else 3
    qt_lum = _scaled_qt(_QT_LUM.reshape(_N, _N), quality).reshape(64)
    qt_chrom = _scaled_qt(_QT_CHROM.reshape(_N, _N), quality).reshape(64)
    dc_lum = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    dc_chrom = _canonical_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_lum = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    ac_chrom = _canonical_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)

    ycc = _rgb_to_ycbcr(img)
    planes = [
        _quantized_blocks(ycc[..., c], (qt_lum if c == 0 else qt_chrom).astype(np.float64))
        for c in range(ncomp)
    ]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qt in ((0, qt_lum), (1, qt_chrom)):
        # DQT payload is in zigzag order; qt is natural-order
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(qt[ZIGZAG[z]]) for z in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, tq in ((1, 0), (2, 1), (3, 1))[:ncomp]:
        out += struct.pack(">BBB", cid, 0x11, tq)  # 1x1 sampling
    for tc, th, bits, vals in (
        (0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, 0, _AC_LUM_BITS, _AC_LUM_VALS),
        (0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS),
        (1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, tbl in ((1, 0x00), (2, 0x11), (3, 0x11))[:ncomp]:
        out += struct.pack(">BB", cid, tbl)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    writer = _BitWriter()
    nby, nbx = planes[0].shape[:2]
    preds = [0] * ncomp
    mcu = rst = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()  # byte-align, 1-padded
                out += writer.out + bytes([0xFF, 0xD0 | (rst & 7)])
                rst += 1
                writer = _BitWriter()
                preds = [0] * ncomp
            mcu += 1
            for c in range(ncomp):
                preds[c] = _encode_block(
                    writer, planes[c][by, bx], preds[c],
                    dc_lum if c == 0 else dc_chrom,
                    ac_lum if c == 0 else ac_chrom,
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> RGB uint8 (h, w, 3).  Tables are read from
    the stream; raises ValueError on non-baseline / subsampled input."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (cid, sampling, tq)
    h = w = 0
    restart_interval = 0  # DRI; 0 = no restarts (this encoder's output)
    scan_comps: list[tuple[int, int, int]] = []  # (cid, dc_table, ac_table)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                zz = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8).astype(np.float64)
                nat = np.empty(64)
                nat[ZIGZAG] = zz
                qts[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {(ln, code): sym for sym, (code, ln) in codes.items()}
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("jpeg: only 4:4:4 (1x1 sampling) supported")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI — restart interval in MCUs
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tbl = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cid, tbl >> 4, tbl & 0xF))
            break
    else:
        raise ValueError("jpeg: no scan found")

    # unstuff entropy bytes up to EOI, splitting at restart markers: each
    # RSTn starts a fresh entropy segment (byte-aligned bit reader, DC
    # predictors reset) per T.81 §E.2.4/F.2.1.3.1 — required for externally
    # encoded streams with DRI; this encoder itself never emits them
    segments: list[bytearray] = [bytearray()]
    i = pos
    while i < len(data) - 1:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00:
                segments[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytearray())
                i += 2
                continue
            break  # EOI or another marker
        segments[-1].append(b)
        i += 1
    if restart_interval == 0 and len(segments) > 1:
        # RSTs without a DRI declaration: malformed, but harmless to treat
        # as plain byte boundaries (predictors continue) — legacy behavior
        segments = [bytearray(b"".join(bytes(s) for s in segments))]

    if not comps or h == 0 or w == 0:
        raise ValueError("jpeg: missing SOF0")
    nby, nbx = (h + _N - 1) // _N, (w + _N - 1) // _N
    nc = len(comps)
    coeffs = np.zeros((nc, nby, nbx, 64), dtype=np.float64)
    seg_idx = 0
    reader = _BitReader(bytes(segments[seg_idx]))
    preds = [0] * nc
    mcu = 0
    comp_tables = {cid: (dc_t, ac_t) for cid, dc_t, ac_t in scan_comps}
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("jpeg: missing RST marker")
                reader = _BitReader(bytes(segments[seg_idx]))
                preds = [0] * nc
            mcu += 1
            for c, (cid, _, tq) in enumerate(comps):
                dc_t, ac_t = comp_tables[cid]
                dc_tab, ac_tab = huff[(0, dc_t)], huff[(1, ac_t)]
                zz = coeffs[c, by, bx]
                size = _decode_symbol(reader, dc_tab)
                diff = _extend(reader.read_bits(size), size)
                preds[c] += diff
                zz[0] = preds[c]
                k = 1
                while k < 64:
                    sym = _decode_symbol(reader, ac_tab)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0:
                        if run != 15:
                            raise ValueError("jpeg: bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC run overflow")
                    zz[k] = _extend(reader.read_bits(size), size)
                    k += 1

    chans = []
    for c, (cid, _, tq) in enumerate(comps):
        qt = qts[tq]
        nat = coeffs[c][:, :, _UNZIGZAG] * qt
        blocks = nat.reshape(nby, nbx, _N, _N)
        pix = _DCT.T @ blocks @ _DCT + 128.0
        chan = pix.transpose(0, 2, 1, 3).reshape(nby * _N, nbx * _N)
        chans.append(chan[:h, :w])
    if nc == 1:
        g = np.clip(chans[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(np.stack(chans, axis=-1))
