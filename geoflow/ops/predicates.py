"""Topological + BBOX predicates as batch kernels.

Topological family mirrors GeometryWrapper relation methods
(contains :822 / crosses :835 / disjoint :848 / equalsTopo :861 /
intersects :899 / overlaps :912 / touches :925 / within :938 in
/root/reference/src/main/io/github/galbiston/geosparql_jena/implementation/GeometryWrapper.java).
BBOX family mirrors envelope/relation/*.java (14 classes) — pure float
arithmetic on envelope columns, no geometry decode at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import algorithms as alg
from .kernels import binary_bool, decode_geoms, decode_points_fast
from .registry import register_op


def _pred(name, fn, doc):
    @register_op(name, 2, "predicate")
    def op(col_a, col_b, _fn=fn):
        return binary_bool(col_a, col_b, _fn)
    op.__doc__ = doc
    return op


st_intersects_slow = _pred("st_intersects_pairs", alg.intersects,
                           "sfIntersects per row pair (GeometryWrapper.java:899)")
_pred("st_contains_pairs", alg.contains, "sfContains (GeometryWrapper.java:822)")
_pred("st_within_pairs", alg.within, "sfWithin (GeometryWrapper.java:938)")
_pred("st_disjoint_pairs", alg.disjoint, "sfDisjoint (GeometryWrapper.java:848)")
_pred("st_touches_pairs", alg.touches, "sfTouches (GeometryWrapper.java:925)")
_pred("st_crosses_pairs", alg.crosses, "sfCrosses (GeometryWrapper.java:835)")
_pred("st_overlaps_pairs", alg.overlaps, "sfOverlaps (GeometryWrapper.java:912)")
_pred("st_equals_pairs", alg.equals_topo, "sfEquals (GeometryWrapper.java:861)")
_pred("st_covers_pairs", alg.covers, "ehCovers")
_pred("st_coveredby_pairs", alg.covered_by, "ehCoveredBy")
_pred("st_equalsexact_pairs", alg.equals_exact, "equalsExact (GeometryWrapper.java:874)")


@register_op("st_relate", 2, "predicate")
def st_relate(col_a, col_b):
    """DE-9IM dimension matrix (Relate.java:13; geom/relate.py —
    verified against 15 known JTS matrices)."""
    from ..geom.relate import relate_matrix
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = [relate_matrix(a, b) if a is not None and b is not None else None
           for a, b in zip(ga, gb)]
    return pa.array(out, type=pa.string())


@register_op("st_relatematch", 2, "predicate")
def st_relatematch(matrix_col, pattern):
    """RelateMatch.java:6 — DE-9IM pattern match (T/F/0/1/2/*)."""
    from ..geom.relate import relate_match
    vals = matrix_col.to_pylist() if hasattr(matrix_col, "to_pylist") \
        else matrix_col
    out = [relate_match(v, pattern) if v is not None else None for v in vals]
    return pa.array(out, type=pa.bool_())


@register_op("st_point_in_polygon", 2, "predicate")
def st_point_in_polygon(col_pts, polygon):
    """Vectorized PIP of a point WKB column against ONE polygon Geometry
    (the broadcast-join inner kernel)."""
    pts = decode_points_fast(col_pts)
    if pts is None:
        return binary_bool(col_pts, pa.array([None] * len(col_pts)),
                           lambda a, b: alg.within(a, polygon))
    return pa.array(alg.points_in_polygon(pts[0], pts[1], polygon),
                    type=pa.bool_())


# ---------------------------------------------------------------------------
# BBOX operator family (envelope/relation/*.java) — pure arithmetic on the
# xmin/ymin/xmax/ymax float columns; zero geometry decoding.
# ---------------------------------------------------------------------------

def _np4(a):
    return (np.asarray(a[0], dtype=np.float64), np.asarray(a[1], dtype=np.float64),
            np.asarray(a[2], dtype=np.float64), np.asarray(a[3], dtype=np.float64))


def _bbox_op(name, fn, doc):
    @register_op(name, 2, "bbox")
    def op(box_a, box_b, _fn=fn):
        """box_a/box_b: 4-tuples of (xmin, ymin, xmax, ymax) arrays."""
        ax0, ay0, ax1, ay1 = _np4(box_a)
        bx0, by0, bx1, by1 = _np4(box_b)
        return pa.array(_fn(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1),
                        type=pa.bool_())
    op.__doc__ = doc
    return op


_bbox_op("bbox_intersects",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1:
         (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1),
         "PostGIS && (BBOXIntersects.java:20)")
_bbox_op("bbox_contains",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1:
         (ax0 <= bx0) & (ax1 >= bx1) & (ay0 <= by0) & (ay1 >= by1),
         "PostGIS ~ (BBOXContains.java:19)")
_bbox_op("bbox_iscontainedby",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1:
         (bx0 <= ax0) & (bx1 >= ax1) & (by0 <= ay0) & (by1 >= ay1),
         "PostGIS @ (BBOXIsContainedBy.java:20)")
_bbox_op("bbox_equals",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1:
         (ax0 == bx0) & (ax1 == bx1) & (ay0 == by0) & (ay1 == by1),
         "PostGIS ~= (BBOXEquals.java:20)")
_bbox_op("bbox_above",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1: ay0 > by1,
         "PostGIS |>> strictly above (BBOXAbove.java:20)")
_bbox_op("bbox_below",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1: ay1 < by0,
         "PostGIS <<| strictly below (BBOXBelow.java:20)")
_bbox_op("bbox_leftof",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1: ax1 < bx0,
         "PostGIS << strictly left (BBOXLeftOf.java:20)")
_bbox_op("bbox_rightof",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1: ax0 > bx1,
         "PostGIS >> strictly right (BBOXRightOf.java:20)")
_bbox_op("bbox_overlapsabove",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1: ay0 >= by0,
         "PostGIS |&> (BBOXOverlapsAbove.java:20)")
_bbox_op("bbox_overlapsbelow",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1: ay1 <= by1,
         "PostGIS &<| (BBOXOverlapsBelow.java:20)")
_bbox_op("bbox_overlapsleft",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1: ax1 <= bx1,
         "PostGIS &< (BBOXOverlapsLeft.java:20)")
_bbox_op("bbox_overlapsright",
         lambda ax0, ay0, ax1, ay1, bx0, by0, bx1, by1: ax0 >= bx0,
         "PostGIS &> (BBOXOverlapsRight.java:20)")


@register_op("bbox_distance", 2, "bbox")
def bbox_distance(box_a, box_b):
    """Min distance between envelopes (BBOXDistance.java:19)."""
    ax0, ay0, ax1, ay1 = _np4(box_a)
    bx0, by0, bx1, by1 = _np4(box_b)
    dx = np.maximum(0.0, np.maximum(bx0 - ax1, ax0 - bx1))
    dy = np.maximum(0.0, np.maximum(by0 - ay1, ay0 - by1))
    # sqrt-of-sum (not np.hypot): identical IEEE sequence to SQL oracles
    return pa.array(np.sqrt(dx * dx + dy * dy), type=pa.float64())
