"""CountMin / HyperLogLog / exact-quantile sketches: accuracy bounds,
merge associativity, pipeline equivalences."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from geoflow.ops.sketches import (CountMinSketch, HyperLogLog, _clz64,
                                  exact_grouped_quantiles,
                                  heavy_hitter_tokens, hll_aggregate)
from geoflow.text.hashing import mix64


def _h(vals):
    return mix64(np.asarray(vals, dtype=np.int64).view(np.uint64))


def test_clz64_exact():
    x = np.array([0, 1, 2, 3, 2**31, 2**63, 2**63 + 1, 2**64 - 1],
                 dtype=np.uint64)
    expect = [64, 63, 62, 62, 32, 0, 0, 0]
    assert list(_clz64(x)) == expect


def test_cms_never_underestimates_and_tight_on_heavy():
    rng = np.random.RandomState(3)
    # zipf-ish: key i appears ~ 10000/i times
    keys = np.repeat(np.arange(1, 200), (10000 // np.arange(1, 200)))
    s = CountMinSketch(depth=4, width=1 << 12)
    s.add_hashes(_h(keys))
    true = {k: int(c) for k, c in
            zip(*np.unique(keys, return_counts=True))}
    est = s.estimate_hashes(_h(list(true)))
    for (k, t), e in zip(true.items(), est):
        assert e >= t                      # one-sided guarantee
    # heavy keys estimated tightly (eps = e/width * N)
    n = len(keys)
    eps = np.e / (1 << 12) * n
    heavy = [k for k, t in true.items() if t > 1000]
    est_h = s.estimate_hashes(_h(heavy))
    for k, e in zip(heavy, est_h):
        assert e - true[k] <= eps


def test_cms_merge_equals_single():
    a, b = CountMinSketch(4, 1 << 10), CountMinSketch(4, 1 << 10)
    whole = CountMinSketch(4, 1 << 10)
    x = np.arange(5000, dtype=np.int64)
    a.add_hashes(_h(x[:2500]))
    b.add_hashes(_h(x[2500:]))
    whole.add_hashes(_h(x))
    assert np.array_equal(a.merge(b).counts, whole.counts)


@pytest.mark.parametrize("n", [10, 1000, 100_000])
def test_hll_accuracy(n):
    h = HyperLogLog(14)
    h.add_hashes(_h(np.arange(n)))
    est = h.estimate()
    tol = 0.03 if n >= 1000 else 0.001   # 1.04/sqrt(2^14) ~ 0.8%
    assert abs(est - n) <= max(n * tol, 1.0)


def test_hll_merge_equals_single():
    a, b, whole = HyperLogLog(12), HyperLogLog(12), HyperLogLog(12)
    x = np.arange(20000)
    a.add_hashes(_h(x[:12000]))
    b.add_hashes(_h(x[8000:]))           # overlapping halves
    whole.add_hashes(_h(x))
    assert np.array_equal(a.merge(b).registers, whole.registers)


def test_hll_grouped_aggregate_matches_exact(ray_session):
    rng = np.random.RandomState(5)
    g = rng.randint(0, 3, 5000).astype(np.int64)
    u = rng.randint(0, 400, 5000).astype(np.int64)
    ds = ray_session.data.from_arrow(pa.table(
        {"g": pa.array(g), "u": pa.array(u)})).repartition(4)
    rows = ds.groupby("g").aggregate(hll_aggregate("u", p=14)).take_all()
    import pandas as pd
    exact = pd.DataFrame({"g": g, "u": u}).groupby("g")["u"].nunique()
    for r in rows:
        assert abs(r["hll(u)"] - exact[r["g"]]) <= exact[r["g"]] * 0.05 + 1


def test_quantiles_match_numpy_disc(ray_session):
    rng = np.random.RandomState(9)
    g = rng.randint(0, 4, 3000).astype(np.int64)
    v = rng.randint(-50, 2000, 3000).astype(np.int64)
    ds = ray_session.data.from_arrow(pa.table(
        {"g": pa.array(g), "v": pa.array(v)})).repartition(5)
    out = exact_grouped_quantiles(ds, "g", "v", qs=(0.25, 0.5, 0.99))
    d = out.to_pydict()
    for i, gi in enumerate(d["g"]):
        vals = np.sort(v[g == gi])
        n = len(vals)
        for q, col in ((0.25, "q25"), (0.5, "q50"), (0.99, "q99")):
            rank = max(int(np.ceil(q * n)), 1) - 1   # quantile_disc
            assert d[col][i] == vals[rank], (gi, q)


def test_heavy_hitters_sketch_equals_exact(ray_session):
    texts = []
    for i in range(300):
        toks = ["common"] * 3 + [f"mid{i % 7}"] * 2 + [f"rare{i}"]
        texts.append(" ".join(toks))
    ds = ray_session.data.from_arrow(pa.table(
        {"text": pa.array(texts, type=pa.string())})).repartition(4)
    with_sketch = heavy_hitter_tokens(ds, min_count=40, k=5).take_all()
    plain = heavy_hitter_tokens(ds, min_count=40, k=5,
                                use_sketch=False).take_all()
    assert with_sketch == plain
    assert with_sketch[0] == {"token": "common", "cnt": 900}
    # rare tokens (count 1) must be pruned out
    assert all(not r["token"].startswith("rare") for r in with_sketch)


def test_bloom_set_bit_indices_roundtrip():
    import numpy as np
    import pyarrow as pa

    from geoflow.ops.sketches import (BloomFilter, _column_hashes,
                                      bloom_set_bit_indices)
    keys = pa.array(np.arange(1000, dtype=np.int64) * 7 - 3500)
    a = BloomFilter(1 << 13, 5)
    a.add_hashes(_column_hashes(keys))
    assert a.contains_hashes(_column_hashes(keys)).all()
    idx = bloom_set_bit_indices(a.bits)
    assert len(idx) == int(np.unpackbits(a.bits.view(np.uint8)).sum())
    # reconstruct the words from the indices: exact inverse
    back = np.zeros_like(a.bits)
    np.bitwise_or.at(back, idx // 64,
                     np.uint64(1) << (idx % 64).astype(np.uint64))
    assert np.array_equal(back, a.bits)


def test_kmv_bottom_k_matches_brute_force():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geoflow.ops.sketches import kmv_bottom_k
    from geoflow.text.hashing import mix64

    rng = np.random.default_rng(11)
    groups = np.array(["a", "b", "c"])[rng.integers(0, 3, 5000)]
    keys = rng.integers(0, 400, 5000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(groups), "k": pa.array(keys)})) \
        .repartition(6)
    out = kmv_bottom_k(ds, "g", "k", k=16).take_all()
    got = {}
    for r in out:
        got.setdefault(r["g"], []).append((r["rank_i"], r["hval"]))
    for g in ("a", "b", "c"):
        ks = np.unique(keys[groups == g])
        h = np.unique(mix64(ks.view(np.uint64).astype(np.uint64)))[:16]
        want = [(i + 1, int(v)) for i, v in
                enumerate(h.view(np.int64))]
        assert sorted(got[g]) == want, g


def test_kmv_estimator_in_range():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from geoflow.ops.sketches import kmv_bottom_k

    n_distinct = 5000
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["x"] * n_distinct),
        "k": pa.array(np.arange(n_distinct, dtype=np.int64))}))
    rows = kmv_bottom_k(ds, "g", "k", k=64).take_all()
    h = np.array([r["hval"] for r in rows], np.int64).view(np.uint64)
    est = (len(h) - 1) * (2.0 ** 64) / float(h.max())
    assert 0.5 * n_distinct < est < 2.0 * n_distinct
