"""as-of join + interval join: brute-force oracles, edge cases,
determinism under tied timestamps."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.ops.streamjoin import asof_join, interval_join


def _mk_ds(ray, tbl: pa.Table, blocks: int = 3):
    return ray.data.from_arrow(tbl).repartition(blocks)


def _brute_asof(lk, lts, rk, rts, rtb, direction="backward",
                tolerance=None):
    """Per-left-row Python reference: pick matching right index or -1."""
    out = []
    for k, t in zip(lk, lts):
        best = -1
        for j, (k2, t2) in enumerate(zip(rk, rts)):
            if k2 != k:
                continue
            if direction == "backward":
                if t2 > t or (tolerance is not None and t - t2 > tolerance):
                    continue
            else:
                if t2 < t or (tolerance is not None and t2 - t > tolerance):
                    continue
            if best == -1:
                best = j
                continue
            bt, bb = rts[best], rtb[best]
            better = (t2 > bt) if direction == "backward" else (t2 < bt)
            if better or (t2 == bt and rtb[j] > bb):
                best = j
        out.append(best)
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_bruteforce(ray_session, direction):
    rng = np.random.RandomState(7)
    nl, nr = 400, 150
    lk = rng.randint(0, 12, nl).astype(np.int64)
    lts = rng.randint(0, 1000, nl).astype(np.int64)
    rk = rng.randint(0, 12, nr).astype(np.int64)
    rts = rng.randint(0, 1000, nr).astype(np.int64)  # ts ties likely
    rtb = np.arange(nr, dtype=np.int64)
    rv = rng.randint(0, 10**6, nr).astype(np.int64)

    left = pa.table({"lid": pa.array(np.arange(nl)), "k": pa.array(lk),
                     "t": pa.array(lts)})
    right = pa.table({"rk": pa.array(rk), "rt": pa.array(rts),
                      "tb": pa.array(rtb), "val": pa.array(rv)})
    res = asof_join(_mk_ds(ray_session, left), _mk_ds(ray_session, right),
                    left_key="k", right_key="rk", left_ts="t",
                    right_ts="rt", right_cols=["val"],
                    right_tiebreak="tb", direction=direction,
                    num_buckets=8)
    got = {r["lid"]: r["val"] for r in res.take_all()}
    ref = _brute_asof(lk, lts, rk, rts, rtb, direction)
    assert len(got) == nl
    for i in range(nl):
        want = None if ref[i] == -1 else int(rv[ref[i]])
        assert got[i] == want, f"lid {i}: {got[i]} != {want}"


def test_asof_tolerance_and_empty_right(ray_session):
    left = pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                     "t": pa.array([100, 500, 100], type=pa.int64())})
    right = pa.table({"k2": pa.array([1], type=pa.int64()),
                      "t2": pa.array([90], type=pa.int64()),
                      "v": pa.array([7], type=pa.int64())})
    res = asof_join(_mk_ds(ray_session, left, 1),
                    _mk_ds(ray_session, right, 1),
                    left_key="k", right_key="k2", left_ts="t",
                    right_ts="t2", right_cols=["v"], tolerance_us=50,
                    num_buckets=4)
    rows = sorted(res.take_all(), key=lambda r: (r["k"], r["t"]))
    # t=100 within 50 of 90 -> match; t=500 too far; k=2 no right rows
    assert [r["v"] for r in rows] == [7, None, None]


def test_asof_inclusive_boundary(ray_session):
    """right_ts == left_ts matches in backward mode (ASOF semantics)."""
    left = pa.table({"k": pa.array([5], type=pa.int64()),
                     "t": pa.array([42], type=pa.int64())})
    right = pa.table({"k2": pa.array([5], type=pa.int64()),
                      "t2": pa.array([42], type=pa.int64()),
                      "v": pa.array([99], type=pa.int64())})
    res = asof_join(_mk_ds(ray_session, left, 1),
                    _mk_ds(ray_session, right, 1),
                    left_key="k", right_key="k2", left_ts="t",
                    right_ts="t2", right_cols=["v"], num_buckets=2)
    assert res.take_all()[0]["v"] == 99


def _brute_interval(pts, starts, ends, closed="both"):
    lo_ok = (lambda t, s: t >= s) if closed in ("both", "left") \
        else (lambda t, s: t > s)
    hi_ok = (lambda t, e: t <= e) if closed in ("both", "right") \
        else (lambda t, e: t < e)
    return sorted((i, j) for i, (s, e) in enumerate(zip(starts, ends))
                  for j, t in enumerate(pts) if lo_ok(t, s) and hi_ok(t, e))


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
def test_interval_matches_bruteforce(ray_session, closed):
    rng = np.random.RandomState(11)
    npts, niv = 500, 60
    pts = rng.randint(0, 5000, npts).astype(np.int64)
    s = rng.randint(0, 5000, niv).astype(np.int64)
    e = s + rng.randint(0, 900, niv)           # spans several 256-buckets
    pt = pa.table({"pid": pa.array(np.arange(npts)), "t": pa.array(pts)})
    it = pa.table({"iid": pa.array(np.arange(niv)), "s": pa.array(s),
                   "e": pa.array(e.astype(np.int64))})
    res = interval_join(_mk_ds(ray_session, pt), _mk_ds(ray_session, it),
                        point_ts="t", interval_start="s", interval_end="e",
                        point_cols=["pid"], interval_cols=["iid"],
                        bucket_us=256, closed=closed)
    got = sorted((r["iid"], r["pid"]) for r in res.take_all())
    assert got == _brute_interval(pts, s, e, closed)


def test_interval_no_duplicate_pairs_across_buckets(ray_session):
    """An interval spanning many buckets yields each pair exactly once."""
    pt = pa.table({"pid": pa.array([0, 1, 2], type=pa.int64()),
                   "t": pa.array([10, 1000, 5000], type=pa.int64())})
    it = pa.table({"iid": pa.array([0], type=pa.int64()),
                   "s": pa.array([0], type=pa.int64()),
                   "e": pa.array([10000], type=pa.int64())})
    res = interval_join(_mk_ds(ray_session, pt, 1),
                        _mk_ds(ray_session, it, 1),
                        point_ts="t", interval_start="s", interval_end="e",
                        point_cols=["pid"], interval_cols=["iid"],
                        bucket_us=100)
    pairs = [(r["iid"], r["pid"]) for r in res.take_all()]
    assert sorted(pairs) == [(0, 0), (0, 1), (0, 2)]
    assert len(pairs) == len(set(pairs))
