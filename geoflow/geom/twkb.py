"""TWKB (Tiny WKB) codec — public PostGIS/TWKB spec.

Reference vendors a reader/writer at
/root/reference/src/main/org/locationtech/geowave/core/geotime/util/TWKBReader.java:1-317;
this is a from-scratch implementation of the published format:

  byte 0: (precision zigzag) << 4 | geometry type (1..7)
  byte 1: metadata flags — 0x01 bbox, 0x02 size, 0x04 idlist,
          0x08 extended dims, 0x10 empty
  then varint-encoded zigzag coordinate deltas (running delta per axis).

Known vector: POINT(1 2) @ precision 0 → 01 00 02 04.
"""

from __future__ import annotations

import numpy as np

from .types import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING,
                    MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, Geometry)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _write_varint(out: bytearray, v: int):
    v &= (1 << 64) - 1
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def varint(self) -> int:
        shift = 0
        result = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return result

    def svarint(self) -> int:
        return _unzigzag(self.varint())


def _encode_coords(out: bytearray, coords: np.ndarray, scale: float,
                   prev: list):
    ints = np.round(coords[:, :2] * scale).astype(np.int64)
    for row in ints:
        for ax in range(2):
            _write_varint(out, _zigzag(int(row[ax]) - prev[ax]))
            prev[ax] = int(row[ax])


def to_twkb(g: Geometry, precision: int = 7) -> bytes:
    out = bytearray()
    out.append(((_zigzag(precision) & 0x0F) << 4) | g.type)
    if g.is_empty:
        out.append(0x10)
        return bytes(out)
    out.append(0x00)
    scale = 10.0 ** precision
    prev = [0, 0]
    _write_body(out, g, scale, prev, precision)
    return bytes(out)


def _write_body(out: bytearray, g: Geometry, scale, prev, precision):
    if g.type == POINT:
        _encode_coords(out, g.coords.reshape(1, -1), scale, prev)
    elif g.type == LINESTRING:
        _write_varint(out, len(g.coords))
        _encode_coords(out, g.coords, scale, prev)
    elif g.type == POLYGON:
        _write_varint(out, len(g.rings))
        for r in g.rings:
            _write_varint(out, len(r))
            _encode_coords(out, r, scale, prev)
    elif g.type in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        _write_varint(out, len(g.parts))
        for p in g.parts:
            _write_body(out, p, scale, prev, precision)
    else:  # collection: nested full TWKB values
        _write_varint(out, len(g.parts))
        for p in g.parts:
            out.extend(to_twkb(p, precision))


def from_twkb(buf: bytes) -> Geometry:
    r = _Reader(buf)
    return _read_geom(r)


def _read_geom(r: _Reader) -> Geometry:
    head = r.buf[r.pos]
    r.pos += 1
    gtype = head & 0x0F
    precision = _unzigzag(head >> 4)
    meta = r.buf[r.pos]
    r.pos += 1
    if meta & 0x10:
        return Geometry.empty(gtype)
    if meta & 0x01:  # bbox: 2 axes × (min delta, extent)
        for _ in range(4):
            r.svarint()
    if meta & 0x02:  # explicit size
        r.varint()
    scale = 10.0 ** precision
    prev = [0, 0]
    return _read_body(r, gtype, scale, prev, meta)


def _read_body(r: _Reader, gtype, scale, prev, meta) -> Geometry:
    def coords(n):
        out = np.empty((n, 2))
        for i in range(n):
            for ax in range(2):
                prev[ax] += r.svarint()
                out[i, ax] = prev[ax] / scale
        return out

    if gtype == POINT:
        return Geometry(POINT, coords=coords(1)[0])
    if gtype == LINESTRING:
        return Geometry(LINESTRING, coords=coords(r.varint()))
    if gtype == POLYGON:
        nrings = r.varint()
        return Geometry(POLYGON, rings=[coords(r.varint())
                                        for _ in range(nrings)])
    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        n = r.varint()
        if meta & 0x04:  # id list
            for _ in range(n):
                r.svarint()
        sub = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING,
               MULTIPOLYGON: POLYGON}[gtype]
        parts = [_read_body(r, sub, scale, prev, 0) for _ in range(n)]
        return Geometry(gtype, parts=parts)
    if gtype == GEOMETRYCOLLECTION:
        n = r.varint()
        return Geometry(GEOMETRYCOLLECTION,
                        parts=[_read_geom(r) for _ in range(n)])
    raise ValueError(f"bad TWKB type {gtype}")
