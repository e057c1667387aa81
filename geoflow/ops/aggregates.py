"""Spatial aggregates as Ray Data AggregateFns.

Reference: aggregate/*.java — AvgX/Y/Z, Min/Max X/Y/Z, BoundingBox, each
plus a Distinct variant (SURVEY.md §2.5). Every aggregate here uses
`accumulate_block` with a vectorized numpy partial fold, so the per-block
work is a single numpy reduction and the shuffle moves only tiny
accumulator tuples (partial aggregation before the groupby exchange).

Note on BoundingBox: the reference's accumulator has a comparison bug
(aggregate/BoundingBox.java:85-92 compares min edges against maxYSoFar);
we implement the documented envelope-union semantic (FIXTURES.md §5).
"""

from __future__ import annotations

import math

import numpy as np
from ray.data.aggregate import AggregateFn

from ..geom.wkb import wkb_to_points
from .kernels import decode_geoms


def _block_coords(block, col: str, coord: int, distinct: bool):
    """Extract coordinate `coord` (0=x,1=y,2=z) of every geometry's
    centroid-ish accumulation base. The reference accumulates the
    geometry's X() (point X / envelope-derived); we use: point → its
    coord, other geometry → centroid coord (AvgX.java:22-113 semantics on
    point corpora are identical)."""
    colvals = block.column(col)
    if isinstance(colvals, object) and hasattr(colvals, "combine_chunks"):
        colvals = colvals.combine_chunks()
    bufs = colvals.to_pylist()
    clean = [b for b in bufs if b is not None]
    pts = wkb_to_points(clean) if clean and all(
        len(b) == 21 for b in clean) else None
    if pts is not None and coord < 2:
        vals = pts[coord]
    else:
        from ..geom import algorithms as alg
        out = []
        for b in bufs:
            if b is None:
                continue
            from ..geom import from_wkb
            g = from_wkb(b)
            if g.is_empty:
                continue
            if coord == 2:
                c = g.all_coords()
                if g.has_z and c.shape[1] > 2:
                    out.append(float(c[:, 2].mean()))
                continue
            cx, cy = alg.centroid(g)
            out.append(cx if coord == 0 else cy)
        vals = np.asarray(out, dtype=np.float64)
    if distinct:
        vals = np.unique(vals)
    return vals


def _avg_agg(name, col, coord, distinct=False):
    def acc_block(a, block):
        v = _block_coords(block, col, coord, distinct)
        if distinct:
            return (a[0] | set(v.tolist()),)
        return (a[0] + float(v.sum()), a[1] + len(v))

    if distinct:
        return AggregateFn(
            init=lambda k: (set(),),
            merge=lambda a, b: (a[0] | b[0],),
            accumulate_block=acc_block,
            finalize=lambda a: (sum(a[0]) / len(a[0])) if a[0] else 0.0,
            name=name)
    return AggregateFn(
        init=lambda k: (0.0, 0),
        merge=lambda a, b: (a[0] + b[0], a[1] + b[1]),
        accumulate_block=acc_block,
        finalize=lambda a: (a[0] / a[1]) if a[1] else 0.0,  # empty→0, AvgX.java:38
        name=name)


def _minmax_agg(name, col, coord, is_min, distinct=False):
    # distinct variants are identical for extrema — kept for API parity
    red = np.min if is_min else np.max
    sentinel = math.inf if is_min else -math.inf

    def acc_block(a, block):
        v = _block_coords(block, col, coord, False)
        if len(v) == 0:
            return a
        return (min(a[0], float(red(v))) if is_min else max(a[0], float(red(v))),)

    return AggregateFn(
        init=lambda k: (sentinel,),
        merge=lambda a, b: (min(a[0], b[0]) if is_min else max(a[0], b[0]),),
        accumulate_block=acc_block,
        finalize=lambda a: a[0] if math.isfinite(a[0]) else 0.0,
        name=name)


def avg_x(col="geom_wkb", distinct=False):
    """aggregate/AvgX.java:22 (+AvgXDistinct.java:7)."""
    return _avg_agg("avg_x", col, 0, distinct)


def avg_y(col="geom_wkb", distinct=False):
    """aggregate/AvgY.java:22."""
    return _avg_agg("avg_y", col, 1, distinct)


def avg_z(col="geom_wkb", distinct=False):
    """aggregate/AvgZ.java:22."""
    return _avg_agg("avg_z", col, 2, distinct)


def min_x(col="geom_wkb"):
    """aggregate/MinX.java:18."""
    return _minmax_agg("min_x", col, 0, True)


def min_y(col="geom_wkb"):
    return _minmax_agg("min_y", col, 1, True)


def max_x(col="geom_wkb"):
    """aggregate/MaxX.java:18."""
    return _minmax_agg("max_x", col, 0, False)


def max_y(col="geom_wkb"):
    return _minmax_agg("max_y", col, 1, False)


def bounding_box(col="geom_wkb"):
    """aggregate/BoundingBox.java:20-105 — running envelope union over the
    group, emitted as a WKT polygon of the merged envelope. Implements the
    *documented* semantic, not the reference's :85-92 comparison bug."""
    def acc_block(a, block):
        colvals = block.column(col)
        if hasattr(colvals, "combine_chunks"):
            colvals = colvals.combine_chunks()
        bufs = [b for b in colvals.to_pylist() if b is not None]
        if not bufs:
            return a
        pts = wkb_to_points(bufs) if all(len(b) == 21 for b in bufs) else None
        if pts is not None:
            x0, y0 = float(pts[0].min()), float(pts[1].min())
            x1, y1 = float(pts[0].max()), float(pts[1].max())
        else:
            from ..geom.wkb import wkb_bounds
            boxes = wkb_bounds(bufs)
            fin_rows = np.isfinite(boxes[:, 0])
            if not fin_rows.any():
                return a
            x0 = float(boxes[fin_rows, 0].min())
            y0 = float(boxes[fin_rows, 1].min())
            x1 = float(boxes[fin_rows, 2].max())
            y1 = float(boxes[fin_rows, 3].max())
        return (min(a[0], x0), min(a[1], y0), max(a[2], x1), max(a[3], y1))

    def fin(a):
        if not math.isfinite(a[0]):
            return None
        x0, y0, x1, y1 = a
        return (f"POLYGON (({x0!r} {y0!r}, {x1!r} {y0!r}, {x1!r} {y1!r}, "
                f"{x0!r} {y1!r}, {x0!r} {y0!r}))")

    return AggregateFn(
        init=lambda k: (math.inf, math.inf, -math.inf, -math.inf),
        merge=lambda a, b: (min(a[0], b[0]), min(a[1], b[1]),
                            max(a[2], b[2]), max(a[3], b[3])),
        accumulate_block=acc_block,
        finalize=fin,
        name="bounding_box")


def envelope_agg_cols(xmin="xmin", ymin="ymin", xmax="xmax", ymax="ymax"):
    """Envelope union over pre-computed envelope float columns (no WKB
    decode at all — the scale path when envelopes were materialized at
    extract time)."""
    def acc_block(a, block):
        x0 = block.column(xmin).to_numpy(zero_copy_only=False)
        y0 = block.column(ymin).to_numpy(zero_copy_only=False)
        x1 = block.column(xmax).to_numpy(zero_copy_only=False)
        y1 = block.column(ymax).to_numpy(zero_copy_only=False)
        if len(x0) == 0:
            return a
        return (min(a[0], float(np.nanmin(x0))), min(a[1], float(np.nanmin(y0))),
                max(a[2], float(np.nanmax(x1))), max(a[3], float(np.nanmax(y1))))

    return AggregateFn(
        init=lambda k: (math.inf, math.inf, -math.inf, -math.inf),
        merge=lambda a, b: (min(a[0], b[0]), min(a[1], b[1]),
                            max(a[2], b[2]), max(a[3], b[3])),
        accumulate_block=acc_block,
        finalize=lambda a: list(a) if math.isfinite(a[0]) else None,
        name="envelope")


def geom_accum(col="geom_wkb", name="accum"):
    """geometry/Accum.java:14 is a reference stub; ST_Accum-style
    aggregate collecting every input geometry into one geometry column
    value (MULTI* when homogeneous, GEOMETRYCOLLECTION otherwise).

    The per-block partial is the raw WKB list; finalize byte-sorts the
    collected buffers before assembly so the result is independent of
    Ray's nondeterministic block arrival order (retry/resume safe).
    Use on grouped data (one group = one collection) — an ungrouped
    100-TB accumulation is by definition driver-sized and is the
    caller's responsibility to avoid."""
    from ..geom import from_wkb, to_wkb
    from .stub_surface import _assemble

    def acc_block(a, block):
        vals = block.column(col).to_pylist()
        return (a[0] + [v for v in vals if v is not None],)

    def finalize(a):
        geoms = [from_wkb(b) for b in sorted(a[0])]
        return to_wkb(_assemble(geoms, geoms[0].srid if geoms else 4326))

    return AggregateFn(
        init=lambda k: ([],),
        merge=lambda x, y: (x[0] + y[0],),
        accumulate_block=acc_block,
        finalize=finalize,
        name=name)
