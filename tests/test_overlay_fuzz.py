"""Property-based fuzzing of the overlay engine (hypothesis): for
random simple polygons A, B the boolean areas must satisfy the
inclusion–exclusion identities to float tolerance, every output must be
consistent under operand swap, and buffers must contain their input.

These invariants hold for ANY correct implementation — they catch
classification and assembly bugs that fixed-fixture tests miss."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from geoflow.geom import algorithms as alg
from geoflow.geom.clipping import polygon_overlay
from geoflow.geom.types import Geometry


def _star_polygon(cx, cy, radii, rot):
    """Simple (star-shaped, possibly concave) polygon from per-vertex
    radii around a center — never self-intersecting."""
    n = len(radii)
    ang = rot + np.arange(n) * (2 * math.pi / n)
    ring = np.stack([cx + radii * np.cos(ang), cy + radii * np.sin(ang)],
                    axis=1)
    ring = np.vstack([ring, ring[:1]])
    if alg.ring_signed_area(ring) < 0:
        ring = ring[::-1]
    return Geometry(3, rings=[ring])


polys = st.builds(
    _star_polygon,
    st.floats(-5, 5), st.floats(-5, 5),
    st.lists(st.floats(0.5, 4.0), min_size=3, max_size=9).map(np.array),
    st.floats(0, 2 * math.pi),
)


@settings(max_examples=60, deadline=None)
@given(a=polys, b=polys)
def test_overlay_inclusion_exclusion(a, b):
    area_a = alg.area(a)
    area_b = alg.area(b)
    inter = alg.area(polygon_overlay(a, b, "intersection"))
    union = alg.area(polygon_overlay(a, b, "union"))
    diff_ab = alg.area(polygon_overlay(a, b, "difference"))
    diff_ba = alg.area(polygon_overlay(b, a, "difference"))
    sym = alg.area(polygon_overlay(a, b, "symdifference"))
    tol = 1e-6 * max(1.0, area_a + area_b)
    assert abs(union - (area_a + area_b - inter)) < tol
    assert abs(diff_ab - (area_a - inter)) < tol
    assert abs(diff_ba - (area_b - inter)) < tol
    assert abs(sym - (area_a + area_b - 2 * inter)) < tol
    # commutativity of the symmetric ops
    inter_ba = alg.area(polygon_overlay(b, a, "intersection"))
    assert abs(inter - inter_ba) < tol
    # bounds
    assert inter <= min(area_a, area_b) + tol
    assert union >= max(area_a, area_b) - tol


@settings(max_examples=25, deadline=None)
@given(a=polys, d=st.floats(0.2, 1.5))
def test_buffer_contains_input_fuzz(a, d):
    b = alg.buffer(a, d)
    c = a.all_coords()[:, :2]
    inside = alg.points_in_polygon(c[:, 0], c[:, 1], b, on_boundary=True)
    assert inside.all()
    assert alg.area(b) >= alg.area(a) - 1e-9
