"""S2 / grid / tile indexing tests."""

import numpy as np
from hypothesis import given, settings, strategies as st

from geoflow.cells import grid, s2, tiles


def test_s2_published_example():
    # the s2geometry quickstart example cell id
    c = s2.lonlat_to_cell(np.array([11.770681595]), np.array([49.703498679]), 30)
    assert int(c[0]) == 0x47A1CBD595522B39


def test_s2_parent_consistency():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89, 89, 500)
    leaf = s2.lonlat_to_cell(lon, lat, 30)
    for lvl in (13, 7, 3):
        direct = s2.lonlat_to_cell(lon, lat, lvl)
        assert np.array_equal(s2.cell_parent(leaf, lvl), direct)
        assert (s2.cell_level(direct) == lvl).all()


def test_s2_center_within_cell_size():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-85, 85, 200)
    c13 = s2.lonlat_to_cell(lon, lat, 13)
    clon, clat = s2.cell_to_lonlat(c13)
    # level-13 cell ≈ 1.27 km edge → centers within ~0.02°
    d = np.abs(clat - lat)
    dlon = np.minimum(np.abs(clon - lon), 360 - np.abs(clon - lon))
    assert d.max() < 0.02
    assert (dlon * np.cos(np.radians(lat))).max() < 0.02


def test_s2_nearby_points_share_parent():
    lon = np.array([11.5760, 11.5761])
    lat = np.array([48.1370, 48.1371])
    c = s2.lonlat_to_cell(lon, lat, 10)
    assert c[0] == c[1]
    far = s2.lonlat_to_cell(np.array([-70.0]), np.array([-30.0]), 10)
    assert far[0] != c[0]


def test_grid_cover_superset_property():
    rng = np.random.default_rng(2)
    px = rng.uniform(-179, 179, 2000)
    py = rng.uniform(-89, 89, 2000)
    cells = grid.lonlat_to_grid(px, py)
    xmin, xmax = px - 0.5, px + 0.5
    ymin, ymax = py - 0.5, py + 0.5
    ri, cc = grid.cover_boxes(xmin, ymin, xmax, ymax)
    cover = {}
    for r, c in zip(ri.tolist(), cc.tolist()):
        cover.setdefault(r, set()).add(c)
    for i in range(2000):
        assert int(cells[i]) in cover[i]


def test_grid_bounds_roundtrip():
    rng = np.random.default_rng(3)
    px = rng.uniform(-179, 179, 500)
    py = rng.uniform(-89, 89, 500)
    cells = grid.lonlat_to_grid(px, py)
    x0, y0, x1, y1 = grid.grid_cell_bounds(cells)
    assert ((px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)).all()


def test_grid_neighbors():
    c = grid.lonlat_to_grid(np.array([0.0]), np.array([0.0]))
    ri, nb = grid.neighbors(c)
    assert len(nb) == 9 and len(set(nb.tolist())) == 9
    # antimeridian wrap: neighbors of lon=179.99 exist on both sides
    c2 = grid.lonlat_to_grid(np.array([179.99]), np.array([0.0]))
    ri2, nb2 = grid.neighbors(c2)
    assert len(nb2) == 9


def test_tile_known_values():
    x, y = tiles.lonlat_to_tile(np.array([0.0]), np.array([0.0]), 12)
    assert (x[0], y[0]) == (2048, 2048)
    x, y = tiles.lonlat_to_tile(np.array([-0.1275]), np.array([51.5072]), 12)
    assert (x[0], y[0]) == (2046, 1362)  # central London z12 tile
    x, y = tiles.lonlat_to_tile(np.array([-180.0]), np.array([85.0511287798066]), 12)
    assert (x[0], y[0]) == (0, 0)


def test_tile_bounds_inverse():
    rng = np.random.default_rng(4)
    lon = rng.uniform(-179, 179, 300)
    lat = rng.uniform(-80, 80, 300)
    x, y = tiles.lonlat_to_tile(lon, lat, 12)
    lo0, la0, lo1, la1 = tiles.tile_bounds(x, y, 12)
    assert ((lon >= lo0) & (lon <= lo1) & (lat >= la0 - 1e-9)
            & (lat <= la1 + 1e-9)).all()


@settings(max_examples=50, deadline=None)
@given(st.floats(-180, 179.999, allow_nan=False),
       st.floats(-85, 85, allow_nan=False))
def test_tile_cover_contains_point_tile(lon, lat):
    tx, ty = tiles.lonlat_to_tile(np.array([lon]), np.array([lat]), 12)
    ri, cx, cy = tiles.cover_boxes_tiles(np.array([lon - 0.01]),
                                         np.array([lat - 0.01]),
                                         np.array([lon + 0.01]),
                                         np.array([lat + 0.01]), 12)
    assert (int(tx[0]), int(ty[0])) in set(zip(cx.tolist(), cy.tolist()))


def test_s2_quadtree_nesting_exact():
    """S2 subdivision is a strict quadtree: the level-12 cell of a point
    must equal the parent (child-bit truncation) of its level-13 cell
    for EVERY point — a 100% invariant, not a rate (the kind of
    geometric invariant that caught the H3 rounding-basis bug)."""
    rng = np.random.default_rng(11)
    lons = rng.uniform(-180, 180, 20000)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 20000)))
    c13 = s2.lonlat_to_cell(lons, lats, 13)
    c12 = s2.lonlat_to_cell(lons, lats, 12)
    lsb13 = c13 & (~c13 + np.uint64(1))
    new_lsb = lsb13 << np.uint64(2)
    parent = (c13 & (~new_lsb + np.uint64(1))) | new_lsb
    assert np.array_equal(parent, c12)
    assert np.array_equal(c13 >> np.uint64(61), c12 >> np.uint64(61))


def test_tile_zoom_nesting_exact():
    """Slippy tiles: z12 indices are exactly z13 >> 1."""
    rng = np.random.default_rng(12)
    lons = rng.uniform(-180, 180, 20000)
    lats = rng.uniform(-85, 85, 20000)
    x12, y12 = tiles.lonlat_to_tile(lons, lats, 12)
    x13, y13 = tiles.lonlat_to_tile(lons, lats, 13)
    assert np.array_equal(x13 >> 1, x12)
    assert np.array_equal(y13 >> 1, y12)
