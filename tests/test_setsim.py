"""Exact prefix-filtering set-similarity join (geoflow/join/setsim.py):
brute-force parity on random corpora at two thresholds, planted
near-dup families, prefix-length math, bucket-cap guard."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geoflow.join.setsim import setsim_join


def _corpus(rng, ndocs, universe, lo, hi):
    rows_d, rows_t, sets = [], [], {}
    for i in range(ndocs):
        s = set(int(x) for x in
                rng.integers(0, universe, int(rng.integers(lo, hi))))
        sets[i] = s
        for t in s:
            rows_d.append(i)
            rows_t.append(t)
    ds = ray.data.from_arrow(pa.table({
        "doc": pa.array(rows_d, pa.int64()),
        "tok": pa.array(rows_t, pa.int64())}))
    return ds, sets


def _brute(sets, num, den):
    want = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            it = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            if un and den * it >= num * un:
                want[(a, b)] = (it, un)
    return want


@pytest.mark.parametrize("num,den", [(1, 2), (3, 4)])
def test_matches_brute_force(num, den):
    rng = np.random.default_rng(17 + num)
    ds, sets = _corpus(rng, 250, 100, 3, 9)
    out = setsim_join(ds, "doc", "tok", num, den,
                      bucket_cap=1_000_000).take_all()
    got = {(r["a"], r["b"]): (r["inter"], r["uni"]) for r in out}
    assert got == _brute(sets, num, den)


def test_planted_families_all_found():
    # families of 3 docs sharing a 5-token core, plus noise docs
    rows_d, rows_t = [], []
    for fam in range(40):
        core = [fam * 10 + k for k in range(5)]
        for m in range(3):
            doc = fam * 3 + m
            toks = core + [100000 + doc]  # one unique token each
            for t in toks:
                rows_d.append(doc)
                rows_t.append(t)
    ds = ray.data.from_arrow(pa.table({
        "doc": pa.array(rows_d, pa.int64()),
        "tok": pa.array(rows_t, pa.int64())}))
    out = setsim_join(ds, "doc", "tok", 1, 2).take_all()
    got = {(r["a"], r["b"]) for r in out}
    # every intra-family pair: J = 5/7 >= 1/2; no cross-family pairs
    want = {(f * 3 + a, f * 3 + b)
            for f in range(40) for a in range(3)
            for b in range(a + 1, 3)}
    assert got == want
    for r in out:
        assert (r["inter"], r["uni"]) == (5, 7)


def test_bucket_cap_raises():
    # every doc shares one hot token -> that bucket holds them all
    n = 50
    rows_d = list(range(n)) * 2
    rows_t = [7] * n + [1000 + i for i in range(n)]
    ds = ray.data.from_arrow(pa.table({
        "doc": pa.array(rows_d, pa.int64()),
        "tok": pa.array(rows_t, pa.int64())}))
    with pytest.raises(Exception):
        setsim_join(ds, "doc", "tok", 1, 2, bucket_cap=10).take_all()


def test_overlap_join_brute_force():
    from geoflow.join.setsim import overlap_join
    rng = np.random.default_rng(23)
    ds, sets = _corpus(rng, 200, 80, 3, 9)
    out = overlap_join(ds, "doc", "tok", min_overlap=3,
                       bucket_cap=1_000_000).take_all()
    got = {(r["a"], r["b"]): (r["inter"], r["uni"]) for r in out}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                it = len(sets[a] & sets[b])
                if it >= 3:
                    want[(a, b)] = (it, len(sets[a] | sets[b]))
    assert got == want
