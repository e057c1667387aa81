"""3D solid ops: st_extrude / st_intersection3d / st_difference3d /
st_volume over convex solids (geom/solid3d.py).

Closes the reference's declared-but-unimplemented 3D boolean surface
(geometry/relation/Intersection3D.java:14 returns null;
Difference3D.java:24 throws UnsupportedOperationException) with the
public PostGIS-SFCGAL semantics the names point at (ST_3DIntersection /
ST_3DDifference / ST_Volume / ST_Extrude), scoped to CONVEX operands.

Column convention: a solid is an outward-oriented MULTIPOLYGON Z face
set in WKB (what st_extrude emits and solid_from_faces reads; any
PostGIS polyhedral consumer and every 2.5D op here can read it).
st_difference3d's output is generally non-convex: one closed oriented
face set whose enclosed volume is exact (signed-fan cancellation);
exactly-coincident internal piece walls are removed, partially
overlapping ones (Q cutting P with several planes) may remain as
opposite-oriented co-planar patches — harmless to st_volume and
documented here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import to_wkb
from ..geom.solid3d import (box_difference_geometry,
                            box_intersection_geometry, difference_faces,
                            intersect_solids, prism_faces_geometry,
                            solid_faces_geometry, solid_from_faces)
from .kernels import decode_geoms
from .registry import register_op


def _convex_ring(g) -> np.ndarray:
    """Exterior ring of a polygonal operand as its 2D convex hull
    (documented convexity scope — concave rings are hulled)."""
    from ..geom import algorithms as alg
    hull = alg.convex_hull(g)
    if hull.rings is None:
        raise ValueError("st_extrude needs an areal operand (>=3 "
                         "distinct points)")
    return np.asarray(hull.rings[0], dtype=np.float64)


@register_op("st_extrude", 3, "construct")
def st_extrude(col, z0: float, z1: float):
    """Prism solid over each polygon's convex hull spanning
    z ∈ [z0, z1], emitted as outward-oriented MULTIPOLYGON Z WKB
    (SFCGAL ST_Extrude's vertical case)."""
    out = []
    for g in decode_geoms(col):
        if g is None:
            out.append(None)
            continue
        out.append(to_wkb(prism_faces_geometry(
            _convex_ring(g), float(z0), float(z1), srid=g.srid)))
    return pa.array(out, type=pa.binary())


def _binary_solid(col_a, col_b, box_fn, gen_fn):
    """Per-pair dispatch: axis-aligned face sets (detected directly on
    ring coordinates — no half-space build) take the closed-form
    ``box_fn``; everything else builds ConvexSolids for ``gen_fn``."""
    from ..geom.solid3d import axis_box_from_faces
    ga = decode_geoms(col_a)
    gb = decode_geoms(col_b)
    out = []
    for a, b in zip(ga, gb):
        if a is None or b is None:
            out.append(None)
            continue
        pb = axis_box_from_faces(a)
        qb = axis_box_from_faces(b) if pb is not None else None
        if pb is not None and qb is not None:
            out.append(box_fn(np.asarray(pb), np.asarray(qb), a.srid))
        else:
            out.append(gen_fn(solid_from_faces(a), solid_from_faces(b),
                              a.srid))
    return out


@register_op("st_intersection3d", 2, "overlay")
def st_intersection3d(col_a, col_b):
    """Convex ∩ convex = half-space concatenation; empty intersection →
    empty MULTIPOLYGON Z. Axis-aligned pairs (boxes / rect prisms — the
    dominant case) take the closed-form bounds fast path, skipping
    vertex enumeration (fast==general volume fuzz in tests)."""
    def box_fn(pb, qb, srid):
        return to_wkb(box_intersection_geometry(pb, qb, srid=srid))

    def gen_fn(p, q, srid):
        return to_wkb(solid_faces_geometry(intersect_solids(p, q),
                                           srid=srid))
    return pa.array(_binary_solid(col_a, col_b, box_fn, gen_fn),
                    type=pa.binary())


@register_op("st_difference3d", 2, "overlay")
def st_difference3d(col_a, col_b):
    """P \\ Q via disjoint convex decomposition over Q's half-spaces
    (one closed oriented boundary face set; see module docstring).
    Axis-aligned pairs decompose closed-form into ≤6 boxes."""
    def box_fn(pb, qb, srid):
        return to_wkb(box_difference_geometry(pb, qb, srid=srid))

    def gen_fn(p, q, srid):
        return to_wkb(difference_faces(p, q, srid=srid))
    return pa.array(_binary_solid(col_a, col_b, box_fn, gen_fn),
                    type=pa.binary())


@register_op("st_volume", 1, "measure")
def st_volume(col):
    """Enclosed volume of a closed outward-oriented face set (PostGIS
    ST_Volume); 0 for empty solids. Column-vectorized (one flat
    cross/dot pass for all rows — geom/solid3d.faces_volume_many)."""
    from ..geom.solid3d import faces_volume_many
    return pa.array(faces_volume_many(decode_geoms(col)),
                    type=pa.float64())
