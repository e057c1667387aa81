"""WKB reader/writer + vectorized fast paths for point columns.

Canonical columnar geometry format in geoflow pipelines is a WKB binary
column (little-endian ISO WKB; Z=+1000 / M=+2000 / ZM=+3000 type offsets).
The reader also accepts EWKB dimension flags (0x80000000 Z, 0x40000000 M)
and the EWKB embedded-SRID flag (0x20000000), matching the reference's WKB
datatype behavior (SRS from prefix or embedded SRID;
/root/reference/src/main/io/github/galbiston/geosparql_jena/implementation/datatype/geometry/WKBDatatype.java:76-91).

Fast paths: a column that is entirely 2D points round-trips to two float64
numpy arrays without per-row Python parsing (`points_to_wkb` /
`wkb_to_points`).
"""

from __future__ import annotations

import struct

import numpy as np

from .types import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING,
                    MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, DEFAULT_SRID,
                    Geometry)

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def _decode_type(raw: int):
    """raw wkb type -> (base_type, has_z, has_m, has_srid)."""
    has_srid = bool(raw & _EWKB_SRID)
    has_z = bool(raw & _EWKB_Z)
    has_m = bool(raw & _EWKB_M)
    t = raw & 0x0FFFFFFF
    if t >= 3000:
        has_z = has_m = True
        t -= 3000
    elif t >= 2000:
        has_m = True
        t -= 2000
    elif t >= 1000:
        has_z = True
        t -= 1000
    return t, has_z, has_m, has_srid


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read(self, srid=DEFAULT_SRID) -> Geometry:
        byte_order = self.buf[self.pos]
        self.pos += 1
        ec = "<" if byte_order == 1 else ">"
        raw_type, = struct.unpack_from(ec + "I", self.buf, self.pos)
        self.pos += 4
        t, has_z, has_m, has_srid = _decode_type(raw_type)
        if has_srid:
            srid, = struct.unpack_from(ec + "i", self.buf, self.pos)
            self.pos += 4
        ndim = 2 + int(has_z) + int(has_m)

        def coords(n):
            arr = np.frombuffer(self.buf, dtype=ec + "f8",
                                count=n * ndim, offset=self.pos)
            self.pos += n * ndim * 8
            return arr.reshape(n, ndim).astype(np.float64, copy=False)

        def count():
            n, = struct.unpack_from(ec + "I", self.buf, self.pos)
            self.pos += 4
            return n

        if t == POINT:
            c = coords(1)[0]
            if np.all(np.isnan(c)):
                g = Geometry.empty(POINT, srid)
            else:
                g = Geometry(POINT, coords=c.copy(), srid=srid)
            g.has_z, g.has_m = has_z, has_m
            return g
        if t == LINESTRING:
            g = Geometry(LINESTRING, coords=coords(count()).copy(), srid=srid)
            g.has_z, g.has_m = has_z, has_m
            return g
        if t == POLYGON:
            nrings = count()
            rings = [coords(count()).copy() for _ in range(nrings)]
            g = Geometry(POLYGON, rings=rings, srid=srid)
            g.has_z, g.has_m = has_z, has_m
            return g
        if t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            n = count()
            parts = [self.read(srid) for _ in range(n)]
            g = Geometry(t, parts=parts, srid=srid)
            g.has_z, g.has_m = has_z, has_m
            return g
        raise ValueError(f"unsupported WKB type {t}")


def from_wkb(buf: bytes, srid=DEFAULT_SRID) -> Geometry:
    return _Reader(buf).read(srid)


def _encode_type(t: int, has_z: bool, has_m: bool) -> int:
    off = 0
    if has_z and has_m:
        off = 3000
    elif has_m:
        off = 2000
    elif has_z:
        off = 1000
    return t + off


def _write(g: Geometry, out: list):
    t = _encode_type(g.type, g.has_z, g.has_m)
    out.append(struct.pack("<BI", 1, t))
    if g.type == POINT:
        if g.is_empty:
            out.append(struct.pack("<" + "d" * g.ndim, *([float("nan")] * g.ndim)))
        else:
            out.append(np.asarray(g.coords, dtype="<f8").tobytes())
    elif g.type == LINESTRING:
        out.append(struct.pack("<I", len(g.coords)))
        out.append(np.ascontiguousarray(g.coords, dtype="<f8").tobytes())
    elif g.type == POLYGON:
        out.append(struct.pack("<I", len(g.rings)))
        for r in g.rings:
            out.append(struct.pack("<I", len(r)))
            out.append(np.ascontiguousarray(r, dtype="<f8").tobytes())
    else:
        out.append(struct.pack("<I", len(g.parts)))
        for p in g.parts:
            _write(p, out)


def to_wkb(g: Geometry) -> bytes:
    out: list = []
    _write(g, out)
    return b"".join(out)


# ---- vectorized point fast paths --------------------------------------

_POINT2D_LEN = 21  # 1 byteorder + 4 type + 16 coords


def points_to_wkb(x: np.ndarray, y: np.ndarray) -> list:
    """Vector-encode 2D points to a list of 21-byte WKB buffers.

    Builds one contiguous (n, 21) byte matrix with numpy, then splits —
    no per-row struct packing.
    """
    n = len(x)
    mat = np.empty((n, _POINT2D_LEN), dtype=np.uint8)
    mat[:, 0] = 1
    mat[:, 1:5] = np.frombuffer(struct.pack("<I", POINT), dtype=np.uint8)
    mat[:, 5:13] = np.asarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    mat[:, 13:21] = np.asarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    b = mat.tobytes()
    return [b[i * _POINT2D_LEN:(i + 1) * _POINT2D_LEN] for i in range(n)]


def wkb_to_points(bufs) -> tuple:
    """Vector-decode a homogeneous 2D-point WKB column -> (x, y) arrays.

    Returns None if any element is not a little-endian 2D point (caller
    falls back to the generic reader).
    """
    n = len(bufs)
    x = np.empty(n, dtype=np.float64)
    y = np.empty(n, dtype=np.float64)
    # check homogeneity cheaply, then decode with one big frombuffer
    joined = b"".join(bufs)
    if len(joined) != n * _POINT2D_LEN:
        return None
    mat = np.frombuffer(joined, dtype=np.uint8).reshape(n, _POINT2D_LEN)
    if not (mat[:, 0] == 1).all():
        return None
    type_ok = (mat[:, 1] == POINT) & (mat[:, 2] == 0) & (mat[:, 3] == 0) & (mat[:, 4] == 0)
    if not type_ok.all():
        return None
    x[:] = np.ascontiguousarray(mat[:, 5:13]).view("<f8").ravel()
    y[:] = np.ascontiguousarray(mat[:, 13:21]).view("<f8").ravel()
    return x, y


def polygons_to_wkb(coords: np.ndarray) -> list:
    """Vector-encode single-ring 2D polygons with a UNIFORM vertex count
    to WKB buffers: `coords` is (n, k, 2) with closed rings (last vertex
    == first). One contiguous byte matrix, no per-row struct packing."""
    n, k, _ = coords.shape
    length = 13 + 16 * k   # byteorder + type + nrings + npoints + coords
    mat = np.empty((n, length), dtype=np.uint8)
    mat[:, 0] = 1
    mat[:, 1:5] = np.frombuffer(struct.pack("<I", POLYGON), dtype=np.uint8)
    mat[:, 5:9] = np.frombuffer(struct.pack("<I", 1), dtype=np.uint8)
    mat[:, 9:13] = np.frombuffer(struct.pack("<I", k), dtype=np.uint8)
    mat[:, 13:] = np.ascontiguousarray(
        coords, dtype="<f8").view(np.uint8).reshape(n, 16 * k)
    b = mat.tobytes()
    return [b[i * length:(i + 1) * length] for i in range(n)]


def wkb_to_uniform_polygons(bufs):
    """Vector-decode a homogeneous single-ring 2D polygon WKB column
    (every buffer the same length, as produced by `polygons_to_wkb`) →
    (n, k, 2) float64 array, or None if the column isn't of that shape
    (caller falls back to the generic per-row reader)."""
    n = len(bufs)
    if n == 0 or bufs[0] is None:
        return None
    length = len(bufs[0])
    if length < 13 + 16 * 4 or (length - 13) % 16:
        return None
    try:
        joined = b"".join(bufs)
    except TypeError:           # a None in the column
        return None
    if len(joined) != n * length:
        return None
    k = (length - 13) // 16
    mat = np.frombuffer(joined, dtype=np.uint8).reshape(n, length)
    if not (mat[:, 0] == 1).all():
        return None
    hdr = np.ascontiguousarray(mat[:, 1:13]).view("<u4").reshape(n, 3)
    if not ((hdr[:, 0] == POLYGON) & (hdr[:, 1] == 1)
            & (hdr[:, 2] == k)).all():
        return None
    return np.ascontiguousarray(
        mat[:, 13:]).view("<f8").reshape(n, k, 2).copy()


def _bounds_scan(mv: memoryview, pos: int, acc: list) -> int:
    """Advance through one WKB geometry starting at `pos`, appending its
    coordinate blocks (as float64 arrays, ndim-strided) to `acc`.
    Returns the new position. Little-endian only (our writer's output and
    the corpus norm); callers fall back to from_wkb otherwise."""
    if mv[pos] != 1:
        raise ValueError("big-endian WKB")
    raw = int.from_bytes(mv[pos + 1:pos + 5], "little")
    t, has_z, has_m, has_srid = _decode_type(raw)
    pos += 5
    if has_srid:
        pos += 4
    ndim = 2 + int(has_z) + int(has_m)
    step = 8 * ndim
    if t == POINT:
        acc.append(np.frombuffer(mv, dtype="<f8", count=ndim, offset=pos)
                   .reshape(1, ndim))
        return pos + step
    if t == LINESTRING:
        n = int.from_bytes(mv[pos:pos + 4], "little")
        pos += 4
        acc.append(np.frombuffer(mv, dtype="<f8", count=n * ndim,
                                 offset=pos).reshape(n, ndim))
        return pos + n * step
    if t == POLYGON:
        nr = int.from_bytes(mv[pos:pos + 4], "little")
        pos += 4
        for _ in range(nr):
            n = int.from_bytes(mv[pos:pos + 4], "little")
            pos += 4
            acc.append(np.frombuffer(mv, dtype="<f8", count=n * ndim,
                                     offset=pos).reshape(n, ndim))
            pos += n * step
        return pos
    # multi / collection
    np_ = int.from_bytes(mv[pos:pos + 4], "little")
    pos += 4
    for _ in range(np_):
        pos = _bounds_scan(mv, pos, acc)
    return pos


def wkb_bounds(bufs) -> np.ndarray:
    """(n, 4) [xmin, ymin, xmax, ymax] per WKB buffer WITHOUT building
    Geometry objects. Homogeneous-shape subsets (2D points; uniform
    single-ring polygons, grouped by buffer length) decode through the
    one-frombuffer vectorized readers with NO per-row Python; leftovers
    fall back to the per-row header scan + one reduceat pass. None /
    empty → NaN row."""
    n = len(bufs)
    out = np.full((n, 4), np.nan)
    lens = np.fromiter((len(b) if b is not None else 0 for b in bufs),
                       dtype=np.int64, count=n)
    handled = np.zeros(n, dtype=bool)
    uniq = np.unique(lens[lens > 0])
    if 0 < len(uniq) <= 32:
        for length in uniq:
            idx = np.nonzero(lens == length)[0]
            sub = [bufs[i] for i in idx]
            if length == _POINT2D_LEN:
                pts = wkb_to_points(sub)
                if pts is not None:
                    out[idx, 0] = out[idx, 2] = pts[0]
                    out[idx, 1] = out[idx, 3] = pts[1]
                    handled[idx] = True
                    continue
            u = wkb_to_uniform_polygons(sub)
            if u is not None:
                out[idx, 0] = u[:, :, 0].min(axis=1)
                out[idx, 1] = u[:, :, 1].min(axis=1)
                out[idx, 2] = u[:, :, 0].max(axis=1)
                out[idx, 3] = u[:, :, 1].max(axis=1)
                handled[idx] = True
    if handled.all():
        return out
    return _wkb_bounds_scan(bufs, out, handled)


def _wkb_bounds_scan(bufs, out, handled) -> np.ndarray:
    blocks: list = []
    rows: list = []
    for i, b in enumerate(bufs):
        if handled[i]:
            continue
        if b is None or len(b) < 5:
            continue
        try:
            acc: list = []
            _bounds_scan(memoryview(b), 0, acc)
        except (ValueError, IndexError):
            out[i] = from_wkb(b).bounds()
            continue
        for a in acc:
            if len(a):
                blocks.append(a[:, :2])
                rows.append(np.full(len(a), i, dtype=np.int64))
    if not blocks:
        return out
    big = np.concatenate(blocks)
    rid = np.concatenate(rows)
    # blocks were appended in row order → rid is nondecreasing
    starts = np.flatnonzero(np.diff(rid, prepend=rid[0] - 1))
    present = rid[starts]
    mins = np.minimum.reduceat(big, starts, axis=0)
    maxs = np.maximum.reduceat(big, starts, axis=0)
    out[present, 0] = mins[:, 0]
    out[present, 1] = mins[:, 1]
    out[present, 2] = maxs[:, 0]
    out[present, 3] = maxs[:, 1]
    return out
