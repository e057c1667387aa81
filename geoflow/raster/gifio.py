"""Pure-stdlib GIF87a/89a codec (palette images + multi-frame animation).

Beyond-reference multimodal surface: web crawls carry GIFs, and GIF is
the one mainstream *animated* image format fully decodable with no
codec library — the pixel data is LZW (GIF variant: variable 3..12-bit
codes, LSB-first packing, CLEAR/END codes, per the GIF89a spec
Appendix F), which is plain bit arithmetic like the JPEG Huffman loop
in jpegio.py.  Pairs with MediaDecoder codecs "gif" (first frame) and
"gif_anim" (frame stack) in media/stages.py.

Scope (loudly rejected outside it):
  decode — 87a + 89a, global and local color tables, interlace,
           multiple frames with frame offsets; disposal methods 0/1
           (leave) and 2 (restore to background) composed onto the
           logical screen; transparency composed per the GCE flag.
           Sort flag / aspect ratio ignored (display hints).
  encode — single- or multi-frame, 8-bit indexed pixels + an explicit
           (n<=256, 3) palette, full-frame images, no interlace, real
           LZW compression (dict rebuilt on table-full CLEAR).

LZW width bookkeeping (the classic off-by-one, derived in-code): the
decoder grows its read width after ITS add makes the table size reach
1<<W; the encoder's adds run one code position AHEAD of the decoder's
(the decoder materializes entry k only on the code after the encoder
created it), so the matching encoder rule is "emit at the width needed
for next_code-1, checked before every emit" — equivalently grow one
add LATER than the decoder.  Verified by the table-growth stress test
(random 256-color noise forces 3->12-bit growth + mid-stream CLEAR).
"""

from __future__ import annotations

import struct

import numpy as np

_GIF89 = b"GIF89a"
_GIF87 = b"GIF87a"
_MAX_CODE = 4096  # 12-bit ceiling (GIF89a Appendix F)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Flat uint8 index array -> GIF LZW byte stream (no sub-blocking)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0       # bit accumulator, LSB-first
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def width_for(next_code: int) -> int:
        # width needed for the largest ASSIGNED code (next_code - 1);
        # see module docstring for why this lags the decoder's rule by
        # exactly one add.
        w = min_code_size + 1
        while (1 << w) < next_code and w < 12:
            w += 1
        return w

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    emit(clear, width_for(next_code))
    it = iter(indices.tolist())
    try:
        prefix = next(it)
    except StopIteration:
        emit(end, width_for(next_code))
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)
    for k in it:
        key = (prefix, k)
        code = table.get(key)
        if code is not None:
            prefix = code
            continue
        emit(prefix, width_for(next_code))
        if next_code < _MAX_CODE:
            table[key] = next_code
            next_code += 1
        else:
            # table full: CLEAR and rebuild (emitted at the full width
            # the decoder is still reading at)
            emit(clear, width_for(next_code))
            table = {}
            next_code = end + 1
        prefix = k
    emit(prefix, width_for(next_code))
    # END is read by a decoder whose table grew by the final prefix add
    emit(end, width_for(next_code + 1))
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW byte stream -> flat uint8 index array (n_pixels long)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n_data = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n_data:
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code after CLEAR not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]          # KwKwK case
        else:
            raise ValueError(f"gif: LZW code {code} beyond table "
                             f"size {len(table)}")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(f"gif: LZW stream ended at {len(out)} of "
                         f"{n_pixels} pixels")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("gif: truncated sub-block chain")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(buf):
            raise ValueError("gif: truncated sub-block")
        out += buf[pos:pos + n]
        pos += n


def _palette_bytes(palette: np.ndarray) -> tuple[bytes, int]:
    """(n<=256, 3) uint8 palette -> (padded table bytes, size_field)."""
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError(f"gif: palette must be (n<=256, 3) uint8, "
                         f"got {pal.shape}")
    size_field = 0
    while (2 << size_field) < pal.shape[0]:
        size_field += 1
    n_slots = 2 << size_field
    padded = np.zeros((n_slots, 3), dtype=np.uint8)
    padded[:pal.shape[0]] = pal
    return padded.tobytes(), size_field


def gif_encode(indices: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """(h, w) uint8 index array + (n<=256, 3) palette -> GIF89a bytes.

    palette=None means grayscale: the identity 256-gray table."""
    return gif_encode_frames([indices], palette)


def gif_encode_frames(frames, palette: np.ndarray | None = None,
                      delay_cs: int = 4) -> bytes:
    """List of (h, w) uint8 index frames (same shape) -> animated GIF.

    All frames share the global palette; each is a full-frame image
    with disposal 1 (leave) and delay `delay_cs` (1/100 s units)."""
    if not frames:
        raise ValueError("gif: need at least one frame")
    arrs = [np.ascontiguousarray(np.asarray(f, dtype=np.uint8))
            for f in frames]
    h, w = arrs[0].shape
    for a in arrs:
        if a.shape != (h, w):
            raise ValueError("gif: all frames must share one shape")
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    table, size_field = _palette_bytes(palette)
    n_colors = 2 << size_field
    if arrs and max(int(a.max()) for a in arrs) >= n_colors:
        raise ValueError("gif: pixel index beyond palette size")
    min_code = max(2, size_field + 1)

    out = bytearray()
    out += _GIF89
    # logical screen descriptor: global table flag + 8-bit color res
    out += struct.pack("<HHBBB", w, h, 0x80 | (0x7 << 4) | size_field, 0, 0)
    out += table
    if len(arrs) > 1:
        # NETSCAPE2.0 loop-forever extension (standard animation marker)
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(b"\x01\x00\x00")
    for a in arrs:
        if len(arrs) > 1:
            # graphic control: disposal 1 (leave), no transparency
            out += b"\x21\xf9" + _sub_blocks(
                struct.pack("<BHB", 0x04, delay_cs, 0))
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(a.ravel(), min_code))
    out += b"\x3b"
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    out = np.empty_like(idx)
    out[order] = idx
    return out


def gif_decode_frames(buf: bytes):
    """GIF bytes -> (list of (h, w, 3) uint8 RGB frames, delays_cs list).

    Frames are composed onto the logical screen (disposal 0/1 leave,
    2 restore-to-background); transparent pixels keep the underlying
    canvas."""
    if buf[:6] not in (_GIF87, _GIF89):
        raise ValueError(f"gif: bad signature {buf[:6]!r}")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(buf, np.uint8, n * 3,
                                   pos).reshape(n, 3).copy()
        pos += n * 3

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None and bg_idx < len(global_pal):
        canvas[:] = global_pal[bg_idx]
    background = canvas.copy()

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = None
    disposal = 0
    delay = 0
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:                       # trailer
            break
        if block == 0x21:                       # extension
            label = buf[pos]
            pos += 1
            data, pos = _read_sub_blocks(buf, pos)
            if label == 0xF9 and len(data) >= 4:
                flags, delay = struct.unpack_from("<BH", data, 0)
                disposal = (flags >> 2) & 0x7
                transparent = data[3] if flags & 0x1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        pal = global_pal
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(buf, np.uint8, n * 3,
                                pos).reshape(n, 3).copy()
            pos += n * 3
        if pal is None:
            raise ValueError("gif: image with no color table")
        min_code = buf[pos]
        pos += 1
        data, pos = _read_sub_blocks(buf, pos)
        idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("gif: pixel index beyond color table")
        rgb = pal[idx]
        region = canvas[top:top + fh, left:left + fw]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[top:top + fh, left:left + fw] = \
                background[top:top + fh, left:left + fw]
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("gif: no image data")
    return frames, delays


def gif_decode(buf: bytes) -> np.ndarray:
    """GIF bytes -> first frame as (h, w, 3) uint8 RGB."""
    return gif_decode_frames(buf)[0][0]


def gif_decode_indexed(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Single-frame GIF -> (index array (h, w) uint8, palette (n, 3)).

    Lossless inverse of gif_encode for our own output (full-frame,
    global table, no transparency)."""
    if buf[:6] not in (_GIF87, _GIF89):
        raise ValueError(f"gif: bad signature {buf[:6]!r}")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        pal = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3).copy()
        pos += n * 3
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            _, pos = _read_sub_blocks(buf, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(buf, np.uint8, n * 3,
                                pos).reshape(n, 3).copy()
            pos += n * 3
        if pal is None:
            raise ValueError("gif: image with no color table")
        min_code = buf[pos]
        pos += 1
        data, pos = _read_sub_blocks(buf, pos)
        idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        if (left, top, fw, fh) != (0, 0, w, h):
            raise ValueError("gif: indexed decode needs a full-frame image")
        return idx, pal
    raise ValueError("gif: no image data")
