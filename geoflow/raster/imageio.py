"""Pure-stdlib PNG and baseline (Geo)TIFF codecs.

The reference declares PNG/TIFF raster egress but stubs it
(raster/exporter/AsPNG.java:8, AsTIFF.java:11 — both raise
UnsupportedOperationException; GeoTIFFDatatype.java likewise).  These
formats need no image library: PNG is zlib (stdlib) + the filter spec
(RFC 2083 / W3C PNG 2nd ed. §9), and baseline TIFF is plain tag
parsing (TIFF 6.0 spec) with optional Deflate (compression 8) via
zlib.  GeoTIFF georeferencing follows OGC 19-008r4 (ModelPixelScale +
ModelTiepoint, ModelTransformation for sheared grids, GeoKeyDirectory
for the EPSG code).

Scope (documented, loudly rejected outside it):
  PNG  — bit depth 8/16, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
         6 (RGBA); no palette, no interlace.  All five row filters are
         decoded; the encoder can emit any fixed filter (default 0).
  TIFF — single IFD, strip-organized, compression 1 (none) or 8
         (deflate), PlanarConfiguration 1 (chunky) or 2 (planar),
         BitsPerSample 8/16/32/64 with SampleFormat uint/int/float,
         both byte orders on read (little-endian on write).

JPEG stays honestly unimplemented (DCT entropy coding is out of scope
for a correctness engine without codec libraries).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .rastwkb import (PT_8BSI, PT_8BUI, PT_16BSI, PT_16BUI, PT_32BSI,
                      PT_32BUI, PT_32BF, PT_64BF, Raster)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, c) uint8/uint16 array → PNG bytes.

    c in {1: gray, 2: gray+alpha, 3: RGB, 4: RGBA}.  filter_type picks
    the per-row filter (0..4) — 0 (None) is the fast default; the
    others exist so decoder coverage of every filter is testable
    against our own encoder."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError("png_encode expects (h,w[,c]) with c in 1..4")
    if a.dtype == np.uint8:
        depth = 8
    elif a.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"png_encode supports uint8/uint16, got {a.dtype}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0..4")
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bps = depth // 8
    bpp = c * bps
    # raw scanline bytes, big-endian samples per the spec
    if depth == 16:
        raw = a.astype(">u2").tobytes()
    else:
        raw = a.tobytes()
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, w * bpp)
    stride = w * bpp
    if filter_type == 0:
        out = np.empty((h, stride + 1), dtype=np.uint8)
        out[:, 0] = 0
        out[:, 1:] = rows
        payload = out.tobytes()
    else:
        ri = rows.astype(np.int64)
        prev = np.zeros(stride, dtype=np.int64)
        parts = []
        for y in range(h):
            cur = ri[y]
            left = np.concatenate([np.zeros(bpp, dtype=np.int64),
                                   cur[:-bpp]]) if stride > bpp else \
                np.zeros(stride, dtype=np.int64)
            ul = np.concatenate([np.zeros(bpp, dtype=np.int64),
                                 prev[:-bpp]]) if stride > bpp else \
                np.zeros(stride, dtype=np.int64)
            if filter_type == 1:
                f = cur - left
            elif filter_type == 2:
                f = cur - prev
            elif filter_type == 3:
                f = cur - (left + prev) // 2
            else:  # Paeth
                f = cur - _paeth(left, prev, ul)
            parts.append(bytes([filter_type])
                         + (f % 256).astype(np.uint8).tobytes())
            prev = cur
        payload = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(payload, 6))
            + _png_chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8 or uint16 array (c per color type).
    CRCs are verified; palette/interlaced/sub-8-bit images are
    rejected with a clear error."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", buf[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if color_type not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type} "
                         "(palette not supported)")
    if depth not in (8, 16):
        raise ValueError(f"unsupported PNG bit depth {depth}")
    c = _COLOR_CHANNELS[color_type]
    bps = depth // 8
    bpp = c * bps
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload length mismatch")
    fr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = fr[:, 0]
    data = fr[:, 1:].astype(np.int64)
    out = np.empty((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(ftypes[y])
        cur = data[y]
        if ft == 0:
            row = cur
        elif ft == 2:  # Up
            row = (cur + prev) % 256
        elif ft == 1:  # Sub — per-lane cumsum mod 256
            row = cur.copy()
            for j in range(bpp):
                row[j::bpp] = np.cumsum(row[j::bpp]) % 256
        elif ft == 3:  # Average — serial in x
            row = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (cur[i] + (a + prev[i]) // 2) % 256
        elif ft == 4:  # Paeth — serial in x
            row = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                cdiag = prev[i - bpp] if i >= bpp else 0
                b = prev[i]
                p = a + b - cdiag
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cdiag)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else cdiag)
                row[i] = (cur[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = row
        prev = row
    ob = out.astype(np.uint8).tobytes()
    if depth == 16:
        arr = np.frombuffer(ob, dtype=">u2").astype(np.uint16)
    else:
        arr = np.frombuffer(ob, dtype=np.uint8)
    return arr.reshape(h, w, c)


# ---------------------------------------------------------------------------
# raster <-> PNG bridging
# ---------------------------------------------------------------------------

_PNG_PT = {PT_8BUI: np.uint8, PT_16BUI: np.uint16}


def raster_to_png(r: Raster) -> bytes:
    """Raster → PNG (georeference is NOT carried — PNG has no geo
    chunk; pair with the raster's world metadata or use GeoTIFF).
    Bands must share an unsigned 8/16-bit pixel type and count 1-4."""
    if not r.bands:
        raise ValueError("cannot PNG-encode a band-less raster")
    if not (1 <= len(r.bands) <= 4):
        raise ValueError("PNG supports 1-4 bands")
    pts = set(r.pixtypes)
    if len(pts) != 1 or next(iter(pts)) not in _PNG_PT:
        raise ValueError("PNG needs uniform 8BUI or 16BUI bands, got "
                         f"{r.pixtypes}")
    dt = _PNG_PT[r.pixtypes[0]]
    stack = np.stack([b.astype(dt) for b in r.bands], axis=-1)
    return png_encode(stack)


def png_to_raster(buf: bytes, scale_x=1.0, scale_y=-1.0, ip_x=0.0,
                  ip_y=0.0, srid=0) -> Raster:
    arr = png_decode(buf)
    pt = PT_8BUI if arr.dtype == np.uint8 else PT_16BUI
    bands = [arr[:, :, i] for i in range(arr.shape[2])]
    return Raster(bands, [pt] * len(bands), [None] * len(bands),
                  scale_x, scale_y, ip_x, ip_y, 0.0, 0.0, srid,
                  shape=arr.shape[:2])


# ---------------------------------------------------------------------------
# TIFF / GeoTIFF
# ---------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
                   9: 4, 10: 8, 11: 4, 12: 8}
_TIFF_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f",
                  12: "d", 6: "b", 16: "Q", 17: "q"}

# (sample_format, bits) -> (pixtype, numpy dtype char)
_TIFF_TO_PT = {
    (1, 8): (PT_8BUI, "u1"), (2, 8): (PT_8BSI, "i1"),
    (1, 16): (PT_16BUI, "u2"), (2, 16): (PT_16BSI, "i2"),
    (1, 32): (PT_32BUI, "u4"), (2, 32): (PT_32BSI, "i4"),
    (3, 32): (PT_32BF, "f4"), (3, 64): (PT_64BF, "f8"),
}
_PT_TO_TIFF = {pt: (sf, bits, ch) for (sf, bits), (pt, ch)
               in _TIFF_TO_PT.items()}


def _ifd_entry(order, tag, typ, values):
    """Build one 12-byte IFD entry; returns (entry_head, overflow_bytes,
    needs_offset) — offsets are patched by the caller."""
    if typ == 2:  # ASCII
        data = values
        count = len(data)
    else:
        fmt = _TIFF_TYPE_FMT[typ]
        data = struct.pack(f"{order}{len(values)}{fmt}", *values)
        count = len(values)
    if len(data) <= 4:
        return (struct.pack(f"{order}HHI", tag, typ, count)
                + data.ljust(4, b"\x00"), b"", False)
    return (struct.pack(f"{order}HHI", tag, typ, count), data, True)


def tiff_encode(r: Raster, compression: str = "deflate") -> bytes:
    """Raster → GeoTIFF bytes (little-endian, single IFD, planar bands,
    one strip per band, Deflate or uncompressed).  Georeference via
    ModelPixelScale+ModelTiepoint (axis-aligned) or
    ModelTransformation (sheared); EPSG code in GeoKeyDirectory."""
    if not r.bands:
        raise ValueError("cannot TIFF-encode a band-less raster")
    pts = set(r.pixtypes)
    if len(pts) != 1:
        raise ValueError("TIFF bands must share one pixel type")
    pt = r.pixtypes[0]
    if pt not in _PT_TO_TIFF:
        raise ValueError(f"pixel type {pt} not TIFF-encodable "
                         "(sub-byte types unsupported)")
    sf, bits, ch = _PT_TO_TIFF[pt]
    comp_code = {"none": 1, "deflate": 8}[compression]
    h, w = r.shape
    nb = len(r.bands)
    order = "<"
    strips = []
    for b in r.bands:
        raw = np.ascontiguousarray(b, dtype=np.dtype(order + ch)).tobytes()
        strips.append(zlib.compress(raw, 6) if comp_code == 8 else raw)

    entries = [
        (256, 3, [w]), (257, 3, [h]),
        (258, 3, [bits] * nb), (259, 3, [comp_code]),
        (262, 3, [1]),          # BlackIsZero
        (277, 3, [nb]), (278, 3, [h]),
        (284, 3, [2]),          # planar
        (339, 3, [sf] * nb),
    ]
    nodata = next((nd for nd in r.nodata if nd is not None), None)
    if nodata is not None:
        # GDAL_NODATA tag, ASCII
        entries.append((42113, 2, (repr(float(nodata)).encode()
                                   + b"\x00")))
    if r.skew_x == 0.0 and r.skew_y == 0.0:
        entries.append((33550, 12, [abs(r.scale_x), abs(r.scale_y), 0.0]))
        entries.append((33922, 12, [0.0, 0.0, 0.0, r.ip_x, r.ip_y, 0.0]))
    else:
        entries.append((34264, 12, [
            r.scale_x, r.skew_x, 0.0, r.ip_x,
            r.skew_y, r.scale_y, 0.0, r.ip_y,
            0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]))
    if r.srid:
        geographic = 4000 <= r.srid <= 4999
        keys = [1, 1, 0, 3,
                1024, 0, 1, (2 if geographic else 1),
                1025, 0, 1, 1]
        keys += ([2048, 0, 1, r.srid] if geographic
                 else [3072, 0, 1, r.srid])
        keys[3] = (len(keys) - 4) // 4
        entries.append((34735, 3, keys))
    # strip offsets / byte counts (patched after layout)
    entries.append((273, 4, [0] * nb))
    entries.append((279, 4, [len(s) for s in strips]))
    entries.sort(key=lambda e: e[0])

    header = struct.pack(f"{order}2sHI", b"II", 42, 8)
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    overflow_pos = 8 + ifd_size
    heads = []
    overflow = bytearray()
    patch = None  # (heads_idx, overflow_at or None) for StripOffsets
    for i, (tag, typ, vals) in enumerate(entries):
        head, extra, needs = _ifd_entry(order, tag, typ, vals)
        if needs:
            head += struct.pack(f"{order}I", overflow_pos + len(overflow))
            if tag == 273:
                patch = (i, len(overflow))
            overflow += extra
        elif tag == 273:
            patch = (i, None)
        heads.append(head)
    data_pos = overflow_pos + len(overflow)
    strip_offsets = []
    p = data_pos
    for s in strips:
        strip_offsets.append(p)
        p += len(s)
    i, at = patch
    ofs = struct.pack(f"{order}{nb}I", *strip_offsets)
    if at is None:  # single strip: value is inline in the entry head
        heads[i] = heads[i][:8] + ofs.ljust(4, b"\x00")
    else:
        overflow[at:at + len(ofs)] = ofs
    ifd = struct.pack(f"{order}H", n) + b"".join(heads) \
        + struct.pack(f"{order}I", 0)
    return header + ifd + bytes(overflow) + b"".join(strips)


def _read_ifd_values(order, typ, count, raw4, buf):
    size = _TIFF_TYPE_SIZE[typ] * count
    data = raw4[:size] if size <= 4 else \
        buf[struct.unpack(f"{order}I", raw4)[0]:][:size]
    if typ == 2:
        return data.split(b"\x00")[0].decode("latin-1")
    if typ == 5:  # RATIONAL
        vals = struct.unpack(f"{order}{2 * count}I", data)
        return [vals[2 * i] / max(vals[2 * i + 1], 1)
                for i in range(count)]
    fmt = _TIFF_TYPE_FMT.get(typ)
    if fmt is None:
        return list(data)
    return list(struct.unpack(f"{order}{count}{fmt}", data))


def tiff_decode(buf: bytes) -> Raster:
    """(Geo)TIFF bytes → Raster.  Both byte orders; compression 1/8;
    chunky or planar; strip-organized (tiles rejected loudly)."""
    if buf[:2] == b"II":
        order = "<"
    elif buf[:2] == b"MM":
        order = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack(f"{order}HI", buf[2:8])
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    (n,) = struct.unpack(f"{order}H", buf[ifd_off:ifd_off + 2])
    tags = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(f"{order}HHI", buf[off:off + 8])
        tags[tag] = _read_ifd_values(order, typ, count,
                                     buf[off + 8:off + 12], buf)
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF not supported (strips only)")
    w = int(tags[256][0])
    h = int(tags[257][0])
    spp = int(tags.get(277, [1])[0])
    bits = tags.get(258, [8])
    comp = int(tags.get(259, [1])[0])
    planar = int(tags.get(284, [1])[0])
    sfmt = tags.get(339, [1] * spp)
    rows_per_strip = int(tags.get(278, [h])[0])
    offsets = [int(v) for v in tags[273]]
    counts = [int(v) for v in tags[279]]
    if comp not in (1, 8):
        raise ValueError(f"TIFF compression {comp} not supported "
                         "(1=none, 8=deflate only)")
    chunks = []
    for o, c in zip(offsets, counts):
        raw = buf[o:o + c]
        chunks.append(zlib.decompress(raw) if comp == 8 else raw)
    key = (int(sfmt[0]), int(bits[0]))
    if key not in _TIFF_TO_PT:
        raise ValueError(f"TIFF sample format/bits {key} not supported")
    pt, ch = _TIFF_TO_PT[key]
    dt = np.dtype(order + ch)
    if planar == 2:
        strips_per_band = max(1, -(-h // rows_per_strip))
        bands = []
        for b in range(spp):
            raw = b"".join(chunks[b * strips_per_band:
                                  (b + 1) * strips_per_band])
            bands.append(np.frombuffer(raw, dtype=dt)[:h * w]
                         .reshape(h, w).astype(np.dtype(ch)))
    else:
        raw = b"".join(chunks)
        a = np.frombuffer(raw, dtype=dt)[:h * w * spp] \
            .reshape(h, w, spp).astype(np.dtype(ch))
        bands = [a[:, :, i] for i in range(spp)]
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(str(tags[42113]).strip())
        except ValueError:
            nodata = None
    scale_x, scale_y, skew_x, skew_y, ip_x, ip_y = 1.0, -1.0, 0.0, 0.0, \
        0.0, 0.0
    if 34264 in tags:
        m = tags[34264]
        scale_x, skew_x, ip_x = m[0], m[1], m[3]
        skew_y, scale_y, ip_y = m[4], m[5], m[7]
    elif 33550 in tags:
        ps = tags[33550]
        scale_x, scale_y = float(ps[0]), -abs(float(ps[1]))
        if 33922 in tags:
            tp = tags[33922]
            # world = tiepoint_world - raster_index*scale (index usually 0)
            ip_x = float(tp[3]) - float(tp[0]) * scale_x
            ip_y = float(tp[4]) - float(tp[1]) * scale_y
    srid = 0
    if 34735 in tags:
        k = [int(v) for v in tags[34735]]
        nkeys = k[3]
        for i in range(nkeys):
            kid, loc, cnt, val = k[4 + 4 * i:8 + 4 * i]
            if kid in (2048, 3072) and loc == 0:
                srid = val
    return Raster(bands, [pt] * spp, [nodata] * spp, scale_x, scale_y,
                  ip_x, ip_y, skew_x, skew_y, srid, shape=(h, w))


# ---------------------------------------------------------------------------
# BIL (band-interleaved-by-line) — AsBIL.java:3 declares the format;
# ESRI BIL is headerless raw with an external .hdr, so the codec takes
# the grid shape from the raster (encode) / arguments (decode).
# ---------------------------------------------------------------------------

def bil_encode(r: Raster) -> bytes:
    if not r.bands:
        raise ValueError("cannot BIL-encode a band-less raster")
    pts = set(r.pixtypes)
    if len(pts) != 1 or r.pixtypes[0] not in _PT_TO_TIFF:
        raise ValueError("BIL needs one machine-width pixel type")
    ch = _PT_TO_TIFF[r.pixtypes[0]][2]
    h, w = r.shape
    stack = np.stack([np.asarray(b, dtype=np.dtype("<" + ch))
                      for b in r.bands], axis=1)  # (h, nb, w)
    return stack.tobytes()


def bil_decode(buf: bytes, width: int, height: int, nbands: int,
               pixtype: int) -> Raster:
    if pixtype not in _PT_TO_TIFF:
        raise ValueError(f"pixel type {pixtype} not BIL-decodable")
    ch = _PT_TO_TIFF[pixtype][2]
    a = np.frombuffer(buf, dtype=np.dtype("<" + ch))
    a = a[:height * nbands * width].reshape(height, nbands, width)
    bands = [a[:, i, :].astype(np.dtype(ch)) for i in range(nbands)]
    return Raster(bands, [pixtype] * nbands, [None] * nbands,
                  shape=(height, width))
