"""Pure numpy/stdlib baseline JPEG codec (ITU-T T.81).

The reference declares JPEG raster egress but stubs it
(raster/exporter/AsJPG.java — UnsupportedOperationException).  No
codec library exists in this container, but baseline sequential JPEG
needs none: the FDCT/IDCT are 8x8 orthonormal matrix products
(vectorized over every block at once), quantization/zigzag are table
lookups, and Huffman entropy coding is bit arithmetic.  All constants
below are the published spec tables (T.81 Annex K: example
quantization tables K.1/K.2, typical Huffman tables K.3; zigzag order
Figure A.6; JFIF 1.02 APP0).  Quality scaling follows the public IJG
convention (scale = 5000/q below 50 else 200-2q).

Scope (loudly rejected outside it):
  encode — 8-bit grayscale or RGB (YCbCr via full-range BT.601 as in
           JFIF), 4:4:4 or 4:2:0, optional restart intervals.
  decode — baseline sequential DCT (SOF0), Huffman, 8-bit, 1 or 3
           components, sampling factors 1 or 2, restart intervals.
           Progressive (SOF2) and arithmetic coding are rejected by
           name.

JPEG is lossy but DETERMINISTIC: identical input bytes encode to
identical output bytes on every worker (pure integer/float64 math, no
RNG), which is what resume/retry correctness needs.  The entropy
loops are per-block Python — fine for tile-sized egress; the heavy
math (color transform, DCT, quantization) is vectorized over the
whole image.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec tables (ITU-T T.81 Annex K; zigzag per Figure A.6)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# (bits[1..16], values) per T.81 K.3.1/K.3.2
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_codes(bits, values):
    """T.81 Annex C code assignment: {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits, values):
    """{(length, code): symbol} for MSB-first sequential decode.
    Cached per table content — tiny-image decode calls this for every
    DHT segment, and the standard tables repeat in every stream."""
    key = (bytes(bits), bytes(values))
    m = _DEC_CACHE.get(key)
    if m is None:
        enc = _huff_codes(bits, values)
        m = {(ln, code): sym for sym, (code, ln) in enc.items()}
        if len(_DEC_CACHE) > 64:
            _DEC_CACHE.clear()
        _DEC_CACHE[key] = m
    return m


_DEC_CACHE: dict = {}

# encoder-side tables are spec constants — built once at import
_DC_LUM_T = _huff_codes(*_DC_LUM)
_AC_LUM_T = _huff_codes(*_AC_LUM)
_DC_CHR_T = _huff_codes(*_DC_CHR)
_AC_CHR_T = _huff_codes(*_AC_CHR)


# orthonormal 8x8 DCT-II matrix: F = C @ f @ C.T reproduces the T.81
# FDCT (its 1/4 C(u)C(v) normalization folded into the matrix rows)
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    _C[_k] = _a * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16.0)
del _k, _a


def quality_tables(quality: int):
    """IJG quality scaling of the Annex K example tables (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((_QT_LUM * scale + 50) // 100, 1, 255)
    chr_ = np.clip((_QT_CHR * scale + 50) // 100, 1, 255)
    return lum, chr_


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def pad_align(self):
        """Pad to a byte boundary with 1-bits (spec padding)."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _magnitude(v: int):
    """(size, bits) for a DC diff / AC value per F.1.2.1 (ones'
    complement for negatives)."""
    if v == 0:
        return 0, 0
    a = v if v > 0 else -v
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _plane_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """8-aligned (h, w) float plane → (nby, nbx, 64) quantized zigzag
    coefficients.  Level shift, DCT and quantization are one einsum
    over every block."""
    h, w = plane.shape
    nby, nbx = h // 8, w // 8
    f = plane.astype(np.float64) - 128.0
    blocks = f.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    # matmul broadcasts over the leading block dims; einsum(optimize=
    # True) re-derived its contraction path on EVERY call (~30% of a
    # tiny-image encode)
    coef = _C @ blocks @ _C.T
    zz = coef.reshape(nby, nbx, 64)[:, :, ZIGZAG]
    # symmetric rounding to match round(coef/q)
    qz = np.round(zz / qtab.astype(np.float64)).astype(np.int64)
    return qz


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(zz, dc_pred, dc_tab, ac_tab, bw):
    diff = int(zz[0]) - dc_pred
    size, bits = _magnitude(diff)
    code, ln = dc_tab[size]
    bw.put(code, ln)
    bw.put(bits, size)
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for idx in nz:
        run = int(idx) - prev
        prev = int(idx) + 1
        while run >= 16:
            zcode, zln = ac_tab[0xF0]
            bw.put(zcode, zln)
            run -= 16
        size, bits = _magnitude(int(zz[1 + idx]))
        code, ln = ac_tab[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits, size)
    if prev != 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.put(code, ln)
    return int(zz[0])


def _dht_segment(cls, tid, bits, values):
    payload = bytes([cls << 4 | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _dqt_segment(tid, qtab_zz):
    payload = bytes([tid]) + bytes(int(x) for x in qtab_zz)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload


def jpeg_encode(arr: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w) or (h, w, 1|3) uint8 array → baseline JFIF JPEG bytes.

    Deterministic (same array → same bytes).  subsampling "444" keeps
    chroma full-resolution; "420" box-averages chroma 2x2 (the common
    web default).  restart_interval > 0 inserts RSTn markers every
    that many MCUs (resumable scans; also exercises the decoder's
    restart path)."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.dtype != np.uint8:
        raise ValueError(f"jpeg_encode supports uint8, got {a.dtype}")
    if a.ndim == 2:
        ncomp = 1
    elif a.ndim == 3 and a.shape[2] == 3:
        ncomp = 3
    else:
        raise ValueError("jpeg_encode expects (h,w) gray or (h,w,3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if a.shape[0] < 1 or a.shape[1] < 1:
        raise ValueError("empty image")
    h, w = a.shape[:2]
    qlum, qchr = quality_tables(quality)

    if ncomp == 1:
        planes = [a.astype(np.float64)]
    else:
        r = a[:, :, 0].astype(np.float64)
        g = a[:, :, 1].astype(np.float64)
        b = a[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]

    sub420 = ncomp == 3 and subsampling == "420"
    if sub420:
        # luma padded to 16; chroma planes padded to the same extent,
        # then 2x2 box-averaged (MCU grid == chroma block grid)
        planes[0] = _pad_edge(planes[0], 16)
        hp, wp = planes[0].shape
        chroma = []
        for i in (1, 2):
            q = _pad_edge(planes[i], 16)[:hp, :wp]
            q = q.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
            chroma.append(np.round(q))
        planes = [planes[0]] + chroma
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        planes = [_pad_edge(p, 8) for p in planes]
        samp = [(1, 1)] * ncomp

    qtabs = [qlum] + [qchr] * (ncomp - 1)
    comp_zz = [_plane_blocks(p, q) for p, q in zip(planes, qtabs)]

    dc_tabs = [_DC_LUM_T] + [_DC_CHR_T] * (ncomp - 1)
    ac_tabs = [_AC_LUM_T] + [_AC_CHR_T] * (ncomp - 1)

    # header
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 2, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += _dqt_segment(0, qlum)
    if ncomp == 3:
        out += _dqt_segment(1, qchr)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, *_DC_LUM)
    out += _dht_segment(1, 0, *_AC_LUM)
    if ncomp == 3:
        out += _dht_segment(0, 1, *_DC_CHR)
        out += _dht_segment(1, 1, *_AC_CHR)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # entropy-coded scan
    bw = _BitWriter()
    preds = [0] * ncomp
    if sub420:
        nby, nbx = comp_zz[1].shape[:2]  # chroma block grid == MCU grid
        mcus = [(my, mx) for my in range(nby) for mx in range(nbx)]
    else:
        nby, nbx = comp_zz[0].shape[:2]
        mcus = [(my, mx) for my in range(nby) for mx in range(nbx)]
    rst = 0
    for mi, (my, mx) in enumerate(mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.pad_align()
            out += bytes(bw.buf)
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * ncomp
        if sub420:
            for by, bx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                preds[0] = _encode_block(
                    comp_zz[0][2 * my + by, 2 * mx + bx], preds[0],
                    dc_tabs[0], ac_tabs[0], bw)
            for ci in (1, 2):
                preds[ci] = _encode_block(comp_zz[ci][my, mx], preds[ci],
                                          dc_tabs[ci], ac_tabs[ci], bw)
        else:
            for ci in range(ncomp):
                preds[ci] = _encode_block(comp_zz[ci][my, mx], preds[ci],
                                          dc_tabs[ci], ac_tabs[ci], bw)
    bw.pad_align()
    out += bytes(bw.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over de-stuffed scan bytes."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated entropy stream")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(bits: int, size: int) -> int:
    """F.2.2.1 sign extension."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _decode_huff(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _decode_block(br, dc_tab, ac_tab, pred) -> tuple:
    zz = np.zeros(64, dtype=np.int64)
    size = _decode_huff(br, dc_tab)
    diff = _extend(br.bits(size), size)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("jpeg: AC index overrun")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    return zz, pred


def jpeg_decode(buf: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes → (h, w) uint8 (grayscale) or
    (h, w, 3) uint8 (RGB).  Rejects progressive / arithmetic /
    12-bit / >2 sampling streams by name."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs = {}
    htabs = {}
    sof = None
    scan_comps = None
    restart = 0
    scan_start = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them (external encoders emit them; ours doesn't)
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq == 0:
                    tab = np.frombuffer(seg[sp:sp + 64],
                                        dtype=np.uint8).astype(np.int64)
                    sp += 64
                else:
                    tab = np.frombuffer(seg[sp:sp + 128],
                                        dtype=">u2").astype(np.int64)
                    sp += 128
                qtabs[tq] = tab
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline(+ext sequential)
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"jpeg: {prec}-bit precision unsupported")
            hh, ww = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (hh, ww, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            kind = {0xC2: "progressive", 0xCA: "arithmetic progressive",
                    0xC9: "arithmetic sequential"}.get(marker,
                                                       f"SOF{marker - 0xC0}")
            raise ValueError(f"jpeg: {kind} JPEG unsupported "
                             "(baseline sequential only)")
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1: sp + 17])
                nv = sum(bits)
                values = list(seg[sp + 17: sp + 17 + nv])
                htabs[(tc, th)] = _huff_decode_map(bits, values)
                sp += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                           seg[2 + 2 * i] & 0x0F) for i in range(ns)]
            scan_start = pos + seglen
            break
        pos += seglen
    if sof is None or scan_comps is None:
        raise ValueError("jpeg: missing SOF/SOS")
    hh, ww, comps = sof
    if len(comps) not in (1, 3):
        raise ValueError(f"jpeg: {len(comps)} components unsupported")
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    if max_h > 2 or max_v > 2 or any(c[1] not in (1, 2) or c[2] not in (1, 2)
                                     for c in comps):
        raise ValueError("jpeg: sampling factors above 2 unsupported")

    # de-stuff scan data, splitting at restart markers
    intervals = []
    cur = bytearray()
    p = scan_start
    n = len(buf)
    while p < n:
        b = buf[p]
        if b != 0xFF:
            cur.append(b)
            p += 1
            continue
        m = buf[p + 1] if p + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= m <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            p += 2
        else:  # EOI or next marker ends the scan
            break
    intervals.append(bytes(cur))

    mcux = -(-ww // (8 * max_h))
    mcuy = -(-hh // (8 * max_v))
    nmcu = mcux * mcuy
    per_comp_blocks = []
    grids = []
    for cid, sh, sv, tq in comps:
        nbx = mcux * sh
        nby = mcuy * sv
        grids.append((nby, nbx, sh, sv, tq))
        per_comp_blocks.append(np.zeros((nby * nbx, 64), dtype=np.int64))

    br = _BitReader(intervals[0])
    interval_i = 0
    preds = [0] * len(comps)
    for mi in range(nmcu):
        if restart and mi and mi % restart == 0:
            interval_i += 1
            if interval_i >= len(intervals):
                raise ValueError("jpeg: missing restart interval data")
            br = _BitReader(intervals[interval_i])
            preds = [0] * len(comps)
        my, mx = divmod(mi, mcux)
        for ci, (cid, sh, sv, tq) in enumerate(comps):
            td = ta = None
            for scid, sdc, sac in scan_comps:
                if scid == cid:
                    td, ta = sdc, sac
            dc_tab = htabs.get((0, td))
            ac_tab = htabs.get((1, ta))
            if dc_tab is None or ac_tab is None:
                raise ValueError("jpeg: missing Huffman table")
            nby, nbx = grids[ci][0], grids[ci][1]
            for by in range(sv):
                for bx in range(sh):
                    zz, preds[ci] = _decode_block(br, dc_tab, ac_tab,
                                                  preds[ci])
                    bi = (my * sv + by) * nbx + (mx * sh + bx)
                    per_comp_blocks[ci][bi] = zz

    # vectorized dequant + inverse zigzag + IDCT per component
    out_planes = []
    for ci, (cid, sh, sv, tq) in enumerate(comps):
        nby, nbx = grids[ci][0], grids[ci][1]
        q = qtabs.get(tq)
        if q is None:
            raise ValueError("jpeg: missing quantization table")
        zz = per_comp_blocks[ci].astype(np.float64) * q.astype(np.float64)
        nat = zz[:, _UNZIGZAG].reshape(-1, 8, 8)
        pix = _C.T @ nat @ _C
        pix = pix.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
        plane = pix.reshape(nby * 8, nbx * 8) + 128.0
        # upsample to the full MCU-aligned grid, then crop
        ry, rx = max_v // sv, max_h // sh
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:hh, :ww])

    if len(comps) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
