"""Shared kernel helpers: WKB column <-> geometry objects / numpy arrays."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import Geometry, from_wkb, to_wkb
from ..geom.wkb import wkb_to_points


def wkb_column_to_list(col) -> list:
    """pyarrow binary column -> list[bytes|None]."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_pylist()


def decode_geoms(col) -> list:
    """WKB column -> list[Geometry|None]."""
    bufs = wkb_column_to_list(col)
    return [from_wkb(b) if b is not None else None for b in bufs]


def decode_points_fast(col):
    """WKB column -> (x, y) numpy arrays if the column is all 2D points,
    else None."""
    bufs = wkb_column_to_list(col)
    if any(b is None for b in bufs):
        return None
    return wkb_to_points(bufs)


def unary_float(col, scalar_fn, point_fn=None) -> pa.Array:
    """Apply scalar_fn(Geometry)->float over a WKB column; optional
    vectorized point_fn(x, y)->np.ndarray fast path."""
    if point_fn is not None:
        pts = decode_points_fast(col)
        if pts is not None:
            return pa.array(point_fn(pts[0], pts[1]), type=pa.float64())
    out = np.full(len(col), np.nan)
    for i, g in enumerate(decode_geoms(col)):
        if g is not None:
            out[i] = scalar_fn(g)
    return pa.array(out, type=pa.float64())


def unary_bool(col, scalar_fn) -> pa.Array:
    out = [None] * len(col)
    for i, g in enumerate(decode_geoms(col)):
        if g is not None:
            out[i] = bool(scalar_fn(g))
    return pa.array(out, type=pa.bool_())


def unary_geom(col, scalar_fn) -> pa.Array:
    """Apply scalar_fn(Geometry)->Geometry; returns a WKB column."""
    out = [None] * len(col)
    for i, g in enumerate(decode_geoms(col)):
        if g is not None:
            out[i] = to_wkb(scalar_fn(g))
    return pa.array(out, type=pa.binary())


def binary_float(col_a, col_b, scalar_fn) -> pa.Array:
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = np.full(len(ga), np.nan)
    for i, (a, b) in enumerate(zip(ga, gb)):
        if a is not None and b is not None:
            out[i] = scalar_fn(a, b)
    return pa.array(out, type=pa.float64())


def binary_bool(col_a, col_b, scalar_fn) -> pa.Array:
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = [None] * len(ga)
    for i, (a, b) in enumerate(zip(ga, gb)):
        if a is not None and b is not None:
            out[i] = bool(scalar_fn(a, b))
    return pa.array(out, type=pa.bool_())


def binary_geom(col_a, col_b, scalar_fn) -> pa.Array:
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = [None] * len(ga)
    for i, (a, b) in enumerate(zip(ga, gb)):
        if a is not None and b is not None:
            out[i] = to_wkb(scalar_fn(a, b))
    return pa.array(out, type=pa.binary())
