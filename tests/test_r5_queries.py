"""Round-5 query kernels: line rasterization (midpoint DDA),
homoglyph folding, correlation moments — brute-force cross-checks
through the driver-contract entry points."""
import numpy as np
import pytest

ENTRY = None


def _entry():
    global ENTRY
    if ENTRY is None:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "entry_under_test", "/root/repo/__ray_entry__.py")
        ENTRY = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ENTRY)
    return ENTRY


SF = "/root/testdata/sf0.001"


def _brute_line(x0, y0, x1, y1):
    adx, ady = abs(x1 - x0), abs(y1 - y0)
    sx = 1 if x1 >= x0 else -1
    sy = 1 if y1 >= y0 else -1
    cells = []
    if adx >= ady:
        for i in range(adx + 1):
            j = (2 * i * ady + adx) // (2 * adx) if adx else 0
            cells.append((x0 + sx * i, y0 + sy * j))
    else:
        for i in range(ady + 1):
            j = (2 * i * adx + ady) // (2 * ady)
            cells.append((x0 + sx * j, y0 + sy * i))
    return cells


def test_line_cells_brute_and_geometry(ray_session):
    df = _entry().q_line_cells(SF).to_pandas()
    got = {}
    for r in df.itertuples():
        got.setdefault(r.doc_id, []).append((r.cx, r.cy))
    for d in list(got)[:200]:
        x0, y0 = (d * 13) % 64, (d * 29) % 64
        x1, y1 = (d * 37 + 11) % 64, (d * 53 + 7) % 64
        want = _brute_line(x0, y0, x1, y1)
        assert sorted(got[d]) == sorted(want), d
        # geometric invariant: every cell center is within 0.5 of
        # the true line along the minor axis
        adx, ady = abs(x1 - x0), abs(y1 - y0)
        for cx, cy in want:
            if adx >= ady and adx:
                t = (cx - x0) / (x1 - x0) if x1 != x0 else 0.0
                assert abs(cy - (y0 + t * (y1 - y0))) <= 0.5 + 1e-9
            elif ady:
                t = (cy - y0) / (y1 - y0)
                assert abs(cx - (x0 + t * (x1 - x0))) <= 0.5 + 1e-9


def test_homoglyph_skeleton_folds(ray_session):
    df = _entry().q_homoglyph_skeleton(SF).to_pandas()
    assert len(df) > 0
    conf = dict(_entry()._CONFUSABLES)
    for r in df.itertuples():
        want = "".join(conf.get(c, c) for c in r.s)
        assert r.skel == want
        assert r.changed == int(r.s != want)
    # the planted alphabet guarantees some rows actually fold
    assert df.changed.sum() > 0
    # skeletons are pure ASCII
    for sk in df.skel:
        assert all(ord(c) < 128 for c in sk)


def test_corr_moments_brute(ray_session):
    import duckdb
    df = _entry().q_corr_moments(SF).to_pandas()
    want = duckdb.sql(f"""
        SELECT o_orderpriority AS pri, count(*) n,
               SUM(CAST(floor(o_totalprice) AS BIGINT)) sx
        FROM read_parquet('{SF}/orders.parquet')
        GROUP BY 1""").df()
    got = df.set_index("pri")
    for r in want.itertuples():
        assert got.loc[r.pri, "n"] == r.n
        assert got.loc[r.pri, "sx"] == r.sx
    # Pearson r from the moments is finite and in [-1, 1]
    for r in df.itertuples():
        num = r.n * r.sxy - r.sx * r.sy
        den = np.sqrt(float(r.n * r.sxx - r.sx**2)
                      * float(r.n * r.syy - r.sy**2))
        if den > 0:
            assert -1.0 <= num / den <= 1.0
