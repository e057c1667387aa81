"""Property-based fuzzing of the overlay engine (hypothesis): for
random simple polygons A, B the boolean areas must satisfy the
inclusion–exclusion identities to float tolerance, every output must be
consistent under operand swap, and buffers must contain their input.

These invariants hold for ANY correct implementation — they catch
classification and assembly bugs that fixed-fixture tests miss."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

import os

# GRAFT_FUZZ_EXAMPLES=N overrides every fuzz test's example count for
# soak runs (the in-suite defaults keep CI fast)
def _ex(default):
    return int(os.environ.get("GRAFT_FUZZ_EXAMPLES", "0")) or default


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


# coordinates quantized to 0.05: hypothesis otherwise shrinks to
# nearly-coincident-but-1e-5-offset edge slivers, which sit outside the
# documented eps-classification envelope of ANY non-snap-rounding
# overlay (JTS grew OverlayNG for the same reason). Quantization keeps
# the genuinely hard adversaries — exactly shared vertices/edges,
# concavity, containment — which the engine must handle exactly.
_q = lambda lo, hi: st.floats(lo, hi).map(lambda v: round(v * 20) / 20)

polys = st.builds(
    _star_polygon,
    _q(-5, 5), _q(-5, 5),
    st.lists(_q(0.5, 4.0), min_size=3, max_size=9).map(np.array),
    st.sampled_from([k * math.pi / 12 for k in range(24)]),
)


@settings(max_examples=_ex(60), deadline=None)
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


@settings(max_examples=_ex(25), deadline=None)
@given(a=polys, d=st.floats(0.2, 1.5))
def test_buffer_contains_input_fuzz(a, d):
    b = alg.buffer(a, d)
    c = a.all_coords()[:, :2]
    inside = alg.points_in_polygon(c[:, 0], c[:, 1], b, on_boundary=True)
    assert inside.all()
    assert alg.area(b) >= alg.area(a) - 1e-9


@settings(max_examples=_ex(50), deadline=None)
@given(a=polys, b=polys)
def test_predicates_consistent_with_relate_matrix(a, b):
    """The scalar predicates and the DE-9IM matrix are independent code
    paths; OGC defines each predicate as a matrix pattern — they must
    agree."""
    from geoflow.geom.relate import relate_match, relate_matrix
    m = relate_matrix(a, b)
    assert alg.intersects(a, b) == (m[0] != "F" or m[1] != "F"
                                    or m[3] != "F" or m[4] != "F")
    assert alg.disjoint(a, b) == relate_match(m, "FF*FF****")
    assert alg.contains(a, b) == relate_match(m, "T*****FF*")
    assert alg.within(a, b) == relate_match(m, "T*F**F***")
    assert alg.touches(a, b) == (relate_match(m, "FT*******")
                                 or relate_match(m, "F**T*****")
                                 or relate_match(m, "F***T****"))
    assert alg.overlaps(a, b) == relate_match(m, "T*T***T**")


def _clean_line(pts):
    arr = np.array(pts, dtype=np.float64)
    keep = np.ones(len(arr), dtype=bool)
    keep[1:] = np.abs(np.diff(arr, axis=0)).sum(axis=1) > 0
    arr = arr[keep]
    if len(arr) < 2:
        arr = np.vstack([arr, arr[0] + [1.0, 0.0]])
    return Geometry(2, coords=arr)


points_strat = st.builds(lambda x, y: Geometry.point(x, y),
                         _q(-6, 6), _q(-6, 6))
lines_strat = st.builds(
    _clean_line,
    st.lists(st.tuples(_q(-6, 6), _q(-6, 6)), min_size=2, max_size=5))


@settings(max_examples=_ex(60), deadline=None)
@given(g1=st.one_of(points_strat, lines_strat), b=polys)
def test_mixed_predicates_consistent_with_relate(g1, b):
    """Point/line vs polygon: predicates must agree with the DE-9IM
    matrix patterns (independent code paths)."""
    from geoflow.geom.relate import relate_match, relate_matrix
    m = relate_matrix(g1, b)
    assert alg.intersects(g1, b) == (m[0] != "F" or m[1] != "F"
                                     or m[3] != "F" or m[4] != "F")
    assert alg.disjoint(g1, b) == relate_match(m, "FF*FF****")
    assert alg.within(g1, b) == relate_match(m, "T*F**F***")
    # crosses for dim(a) < dim(b): T*T******
    assert alg.crosses(g1, b) == relate_match(m, "T*T******")


geoms_strat = st.one_of(points_strat, lines_strat, polys)


@settings(max_examples=_ex(80), deadline=None)
@given(g=geoms_strat)
def test_codec_roundtrips_fuzz(g):
    """WKT and WKB round-trips are exact for arbitrary geometries
    (coordinates repr-formatted, so parse-back is bit-identical)."""
    from geoflow.geom.wkb import from_wkb, to_wkb
    from geoflow.geom.wkt import from_wkt, to_wkt
    w1 = to_wkt(g)
    g2 = from_wkt(w1)
    assert to_wkt(g2) == w1
    g3 = from_wkb(to_wkb(g))
    assert to_wkt(g3) == w1
    assert g3.type == g.type


@settings(max_examples=_ex(40), deadline=None)
@given(g=geoms_strat,
       theta=st.sampled_from([0.3, 1.1, 2.0]),
       dx=_q(-3, 3), dy=_q(-3, 3))
def test_affine_roundtrip_fuzz(g, theta, dx, dy):
    """rotate(θ) ∘ rotate(−θ) and translate ∘ untranslate recover the
    coordinates to float tolerance."""
    r = alg.rotate(alg.rotate(g, theta), -theta)
    a = g.all_coords()[:, :2]
    b = r.all_coords()[:, :2]
    assert np.allclose(a, b, atol=1e-9)
    t = alg.translate(alg.translate(g, dx, dy), -dx, -dy)
    c = t.all_coords()[:, :2]
    assert np.allclose(a, c, atol=1e-12)


@settings(max_examples=_ex(60), deadline=None)
@given(a=geoms_strat, b=geoms_strat)
def test_metric_invariants_fuzz(a, b):
    """distance is symmetric, zero iff intersecting (for these shapes),
    and bounded above by hausdorff and max-distance."""
    d_ab = alg.distance(a, b)
    d_ba = alg.distance(b, a)
    assert abs(d_ab - d_ba) < 1e-9
    if alg.intersects(a, b):
        assert d_ab < 1e-9
    else:
        assert d_ab > 0
    h = alg.hausdorff_distance(a, b)
    m = alg.max_distance(a, b)
    assert h >= d_ab - 1e-9
    assert m >= h - 1e-9


@settings(max_examples=_ex(40), deadline=None)
@given(a=polys, b=polys)
def test_covers_equals_consistent_with_relate(a, b):
    from geoflow.geom.relate import relate_match, relate_matrix
    m = relate_matrix(a, b)
    cov = (relate_match(m, "T*****FF*") or relate_match(m, "*T****FF*")
           or relate_match(m, "***T**FF*") or relate_match(m, "****T*FF*"))
    assert alg.covers(a, b) == cov
    assert alg.covered_by(b, a) == cov
    assert alg.equals_topo(a, b) == relate_match(m, "T*F**FFF*")


@settings(max_examples=_ex(40), deadline=None)
@given(a=polys)
def test_triangulation_area_identities(a):
    """Ear-clip tesselation must tile the polygon exactly; the Delaunay
    triangulation must tile the convex hull exactly."""
    from geoflow.geom.triangulate import delaunay_geometry, ear_clip
    tris = ear_clip(a)
    parts = tris.parts if tris.parts is not None else [tris]
    assert abs(sum(alg.area(t) for t in parts) - alg.area(a)) < 1e-8
    dt = delaunay_geometry(a)
    dparts = dt.parts if dt.parts is not None else [dt]
    hull = alg.convex_hull(a)
    assert abs(sum(alg.area(t) for t in dparts) - alg.area(hull)) < 1e-8


@settings(max_examples=_ex(50), deadline=None)
@given(a=lines_strat, f=st.floats(0.05, 0.95))
def test_line_interpolate_locate_roundtrip(a, f):
    """interpolate(locate(interpolate(f))) lands on the same COORDINATE
    (the fraction itself is ambiguous for self-overlapping lines — a
    point reached twice has two fractions; PostGIS returns one too)."""
    p = alg.line_interpolate_point(a, f)
    back = alg.line_locate_point(a, p)
    p2 = alg.line_interpolate_point(a, back)
    assert abs(p2.coords[0] - p.coords[0]) < 1e-9
    assert abs(p2.coords[1] - p.coords[1]) < 1e-9


@settings(max_examples=_ex(40), deadline=None)
@given(a=geoms_strat)
def test_convex_hull_invariants(a):
    h = alg.convex_hull(a)
    if h.type != 3:
        return   # degenerate input (collinear/point)
    c = a.all_coords()[:, :2]
    inside = alg.points_in_polygon(c[:, 0], c[:, 1], h, on_boundary=True)
    assert inside.all()
    assert alg.is_convex(h) if hasattr(alg, "is_convex") else True
    assert alg.area(h) >= alg.area(a) - 1e-9


def test_unit_conversion_inverse_pairs():
    """Every X_to_meter op composed with meter_to_X is the identity."""
    import pyarrow as pa
    from geoflow.ops import REGISTRY, get_op
    fwd = [n for n in REGISTRY if n.endswith("_to_meter")]
    assert len(fwd) >= 15
    vals = pa.array(np.linspace(0.5, 1000.0, 7))
    for name in fwd:
        unit = name[:-len("_to_meter")]
        inv = f"meter_to_{unit}"
        assert inv in REGISTRY, inv
        m = get_op(name).fn(vals)
        back = get_op(inv).fn(m).to_numpy(zero_copy_only=False)
        assert np.allclose(back, vals.to_numpy(), rtol=1e-12)


def test_voronoi_tiles_clip_box_exactly():
    """Voronoi cells must partition the expanded clip box: total area
    equals the box area to machine precision (random point sets)."""
    from geoflow.geom.triangulate import voronoi_polygons
    rng = np.random.default_rng(1)
    for _ in range(20):
        n = int(rng.integers(2, 25))
        pts = rng.uniform(-5, 5, (n, 2))
        g = Geometry(4, parts=[Geometry(1, coords=p) for p in pts])
        v = voronoi_polygons(g)
        parts = v.parts if v.parts is not None else [v]
        tot = sum(alg.area(p) for p in parts)
        x0, y0 = pts.min(axis=0)
        x1, y1 = pts.max(axis=0)
        dx = max(x1 - x0, 1.0) * 0.5
        dy = max(y1 - y0, 1.0) * 0.5
        box_area = (x1 - x0 + 2 * dx) * (y1 - y0 + 2 * dy)
        assert abs(tot - box_area) < 1e-9 * max(1.0, box_area)


def test_delaunay_empty_circumcircle_property():
    """No point may lie strictly inside any triangle's circumcircle."""
    from geoflow.geom.triangulate import delaunay
    rng = np.random.default_rng(2)
    for _ in range(10):
        pts = rng.uniform(-10, 10, (int(rng.integers(5, 30)), 2))
        for t in delaunay(pts):
            ax, ay = pts[t[0]]
            bx, by = pts[t[1]]
            cx, cy = pts[t[2]]
            d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
            ux = ((ax * ax + ay * ay) * (by - cy)
                  + (bx * bx + by * by) * (cy - ay)
                  + (cx * cx + cy * cy) * (ay - by)) / d
            uy = ((ax * ax + ay * ay) * (cx - bx)
                  + (bx * bx + by * by) * (ax - cx)
                  + (cx * cx + cy * cy) * (bx - ax)) / d
            r2 = (ax - ux) ** 2 + (ay - uy) ** 2
            for i, q in enumerate(pts):
                if i in t:
                    continue
                assert (q[0] - ux) ** 2 + (q[1] - uy) ** 2 \
                    >= r2 * (1 - 1e-9)


def test_grid_cover_boxes_guarantee_fuzz():
    """grid.cover_boxes: every random in-box point's grid cell must be
    in the cover (the no-missed-candidate property the cell join relies
    on)."""
    from geoflow.cells import grid
    rng = np.random.default_rng(3)
    x0 = rng.uniform(-170, 160, 15)
    y0 = rng.uniform(-80, 70, 15)
    x1 = x0 + rng.uniform(0.1, 12, 15)
    y1 = np.minimum(y0 + rng.uniform(0.1, 8, 15), 85)
    rows, cells = grid.cover_boxes(x0, y0, x1, y1, grid.DEFAULT_RES)
    cov = {}
    for r, c in zip(rows.tolist(), cells.tolist()):
        cov.setdefault(r, set()).add(c)
    for i in range(15):
        px = rng.uniform(x0[i], x1[i], 2000)
        py = rng.uniform(y0[i], y1[i], 2000)
        pc = grid.lonlat_to_grid(px, py, grid.DEFAULT_RES)
        assert all(int(c) in cov[i] for c in pc.tolist())


@settings(max_examples=_ex(30), deadline=None)
@given(a=polys)
def test_subdivide_area_identity(a):
    """Subdivide parts tile the polygon exactly."""
    from geoflow.ops.splitting import subdivide
    parts = subdivide(a, 8)
    tot = sum(alg.area(p) for p in parts)
    assert abs(tot - alg.area(a)) < 1e-6 * max(1.0, alg.area(a))


@settings(max_examples=_ex(30), deadline=None)
@given(a=polys, x=_q(-6, 6))
def test_split_area_identity(a, x):
    """st_split pieces tile the polygon exactly (vertical blade)."""
    import pyarrow as pa
    from geoflow.geom.wkb import from_wkb, to_wkb
    from geoflow.ops import get_op
    blade = Geometry(2, coords=np.array([[x, -20.0], [x, 20.0]]))
    col = pa.array([to_wkb(a)], type=pa.binary())
    bcol = pa.array([to_wkb(blade)], type=pa.binary())
    r = from_wkb(get_op("st_split").fn(col, bcol)[0].as_py())
    parts = r.parts if r.parts is not None else [r]
    tot = sum(alg.area(p) for p in parts)
    assert abs(tot - alg.area(a)) < 1e-6 * max(1.0, alg.area(a))


@settings(max_examples=_ex(40), deadline=None)
@given(a=geoms_strat)
def test_bounding_shapes_contain_points(a):
    """Minimum bounding circle and minimum rotated rectangle must
    contain every input coordinate."""
    c = np.atleast_2d(a.all_coords())[:, :2]
    cx, cy, r = alg.minimum_bounding_circle(a)
    d = np.hypot(c[:, 0] - cx, c[:, 1] - cy)
    assert (d <= r * (1 + 1e-9) + 1e-12).all()
    from geoflow.geom.triangulate import minimum_rotated_rectangle
    rect, _w, _dia = minimum_rotated_rectangle(a)
    if rect.type == 3:
        inside = alg.points_in_polygon(c[:, 0], c[:, 1], rect,
                                       on_boundary=True)
        assert inside.all()
        x0, y0, x1, y1 = a.bounds()
        bbox_area = (x1 - x0) * (y1 - y0)
        assert alg.area(rect) <= bbox_area * (1 + 1e-9) + 1e-12


@settings(max_examples=_ex(40), deadline=None)
@given(a=lines_strat, tol=st.sampled_from([0.1, 0.5, 1.0]))
def test_simplify_dp_invariants(a, tol):
    """DP simplification: endpoints preserved, output vertices a subset
    of the input, every dropped vertex within tol of the result."""
    s = alg.simplify_dp(a, tol)
    ca = a.all_coords()[:, :2]
    cs = s.all_coords()[:, :2]
    assert np.array_equal(cs[0], ca[0]) and np.array_equal(cs[-1], ca[-1])
    in_set = {tuple(p) for p in ca}
    assert all(tuple(p) in in_set for p in cs)
    for p in ca:
        d = alg.distance(Geometry.point(p[0], p[1]), s)
        assert d <= tol * (1 + 1e-9) + 1e-12


@settings(max_examples=_ex(50), deadline=None)
@given(lon1=_q(-179, 179), lat1=_q(-85, 85),
       lon2=_q(-179, 179), lat2=_q(-85, 85))
def test_great_circle_metric_axioms(lon1, lat1, lon2, lat2):
    from geoflow.geom.greatcircle import vincenty_sphere_m
    d12 = float(vincenty_sphere_m(np.array([lon1]), np.array([lat1]),
                                  np.array([lon2]), np.array([lat2]))[0])
    d21 = float(vincenty_sphere_m(np.array([lon2]), np.array([lat2]),
                                  np.array([lon1]), np.array([lat1]))[0])
    assert abs(d12 - d21) < 1e-6
    assert d12 >= 0
    assert d12 <= math.pi * 6371008.7714 * (1 + 1e-12)
    if (lon1, lat1) == (lon2, lat2):
        assert d12 < 1e-6
