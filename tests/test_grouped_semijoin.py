"""grouped_topk + bloom_semi_join (engine-original scale primitives —
no reference counterpart; brute-force reference comparisons)."""

import numpy as np
import pyarrow as pa
import pytest


def _events(n=5000, keys=60, seed=3):
    rng = np.random.default_rng(seed)
    return {
        "id": np.arange(n, dtype=np.int64),
        "key": rng.integers(0, keys, n).astype(np.int64),
        "val": rng.integers(-1000, 1000, n).astype(np.int64),
    }


def _brute_topk(d, k, descending=True):
    import pandas as pd
    df = pd.DataFrame(d)
    df = df.sort_values(["key", "val", "id"],
                        ascending=[True, not descending, True])
    return df.groupby("key").head(k)


class TestGroupedTopK:
    def test_matches_brute(self, ray_session):
        import ray
        from geoflow.ops.grouped import grouped_topk
        d = _events()
        ds = ray.data.from_arrow(pa.table(d)).repartition(8)
        out = grouped_topk(ds, "key", "val", 3, tie_col="id").take_all()
        got = sorted((r["key"], r["id"]) for r in out)
        exp = _brute_topk(d, 3)
        assert got == sorted(zip(exp["key"], exp["id"]))

    def test_ascending_and_k1(self, ray_session):
        import ray
        from geoflow.ops.grouped import grouped_topk
        d = _events(seed=9)
        ds = ray.data.from_arrow(pa.table(d)).repartition(4)
        out = grouped_topk(ds, "key", "val", 1, tie_col="id",
                           descending=False).take_all()
        exp = _brute_topk(d, 1, descending=False)
        assert sorted((r["key"], r["id"]) for r in out) == \
            sorted(zip(exp["key"], exp["id"]))

    def test_ties_deterministic(self, ray_session):
        import ray
        from geoflow.ops.grouped import grouped_topk
        d = {"id": np.arange(10, dtype=np.int64),
             "key": np.zeros(10, dtype=np.int64),
             "val": np.full(10, 7, dtype=np.int64)}
        ds = ray.data.from_arrow(pa.table(d)).repartition(3)
        out = grouped_topk(ds, "key", "val", 4, tie_col="id").take_all()
        assert sorted(r["id"] for r in out) == [0, 1, 2, 3]


class TestBloomSemiJoin:
    def test_exact_matches_brute(self, ray_session):
        import ray
        from geoflow.join.semijoin import bloom_semi_join
        rng = np.random.default_rng(5)
        big = pa.table({"k": rng.integers(0, 10000, 20000).astype(np.int64),
                        "payload": np.arange(20000, dtype=np.int64)})
        keyset = np.unique(rng.integers(0, 10000, 700).astype(np.int64))
        keys = pa.table({"k": np.repeat(keyset, 2)})   # dup keys on purpose
        out = bloom_semi_join(
            ray.data.from_arrow(big).repartition(6),
            ray.data.from_arrow(keys).repartition(3), "k").take_all()
        got = sorted(r["payload"] for r in out)
        exp = sorted(int(p) for kk, p in zip(big["k"].to_numpy(),
                                             big["payload"].to_numpy())
                     if kk in set(keyset.tolist()))
        assert got == exp

    def test_inexact_is_superset(self, ray_session):
        import ray
        from geoflow.join.semijoin import bloom_semi_join
        rng = np.random.default_rng(6)
        big = pa.table({"k": rng.integers(0, 5000, 8000).astype(np.int64)})
        keyset = np.unique(rng.integers(0, 5000, 300).astype(np.int64))
        out = bloom_semi_join(
            ray.data.from_arrow(big).repartition(4),
            ray.data.from_arrow(pa.table({"k": keyset})), "k",
            m_bits=1 << 16, exact=False).take_all()
        got = {r["k"] for r in out}
        # no false negatives: every key value actually present in both
        # sides must survive the prefilter
        present = set(big["k"].to_numpy().tolist()) & set(keyset.tolist())
        assert present <= got

    def test_empty_key_side(self, ray_session):
        import ray
        from geoflow.join.semijoin import bloom_semi_join
        big = pa.table({"k": np.arange(100, dtype=np.int64)})
        keys = pa.table({"k": np.empty(0, dtype=np.int64)})
        out = bloom_semi_join(ray.data.from_arrow(big),
                              ray.data.from_arrow(keys), "k").take_all()
        assert out == []

    def test_string_keys(self, ray_session):
        import ray
        from geoflow.join.semijoin import bloom_semi_join
        big = pa.table({"k": [f"url{i}" for i in range(500)]})
        keys = pa.table({"k": [f"url{i}" for i in range(0, 500, 50)]})
        out = bloom_semi_join(ray.data.from_arrow(big),
                              ray.data.from_arrow(keys), "k").take_all()
        assert sorted(r["k"] for r in out) == \
            sorted(f"url{i}" for i in range(0, 500, 50))


class TestBroadcastHashJoin:
    def _sides(self, seed=8, nbig=4000, dimkeys=50, dup_frac=0.2):
        rng = np.random.default_rng(seed)
        big = pa.table({
            "k": rng.integers(0, dimkeys + 10, nbig).astype(np.int64),
            "fact": np.arange(nbig, dtype=np.int64)})
        dk = np.arange(dimkeys, dtype=np.int64)
        # duplicate a fifth of the dimension keys (one-to-many)
        dups = dk[: int(dimkeys * dup_frac)]
        dim = pa.table({
            "k": np.concatenate([dk, dups]),
            "name": [f"d{v}" for v in np.concatenate([dk, dups])],
            "fact": np.concatenate([dk, dups]) * 100})  # name collision
        return big, dim

    def _brute(self, big, dim, how):
        import pandas as pd
        b = big.to_pandas()
        d = dim.to_pandas().rename(columns={"name": "name",
                                            "fact": "fact_r"})
        m = b.merge(d, on="k", how=how)
        return m

    @pytest.mark.parametrize("how", ["inner", "left"])
    def test_matches_pandas(self, ray_session, how):
        import ray
        from geoflow.join.hashjoin import broadcast_hash_join
        big, dim = self._sides()
        out = broadcast_hash_join(
            ray.data.from_arrow(big).repartition(5),
            ray.data.from_arrow(dim), "k", how=how).take_all()
        exp = self._brute(big, dim, how)
        got = sorted((r["k"], r["fact"],
                      r["name"] if r["name"] is not None else "~",
                      r["fact_r"] if r["fact_r"] is not None else -1)
                     for r in out)
        want = sorted((int(k), int(f),
                       n if isinstance(n, str) else "~",
                       int(fr) if fr == fr else -1)
                      for k, f, n, fr in zip(exp["k"], exp["fact"],
                                             exp["name"].fillna("~"),
                                             exp["fact_r"].fillna(-1)))
        assert got == want

    def test_different_key_names(self, ray_session):
        import ray
        from geoflow.join.hashjoin import broadcast_hash_join
        big = pa.table({"fk": np.array([1, 2, 3, 99], dtype=np.int64)})
        dim = pa.table({"pk": np.array([1, 2, 3], dtype=np.int64),
                        "label": ["a", "b", "c"]})
        out = broadcast_hash_join(ray.data.from_arrow(big),
                                  ray.data.from_arrow(dim),
                                  "pk", big_on="fk").take_all()
        assert sorted((r["fk"], r["label"]) for r in out) == \
            [(1, "a"), (2, "b"), (3, "c")]

    def test_anti_join_complements(self, ray_session):
        import ray
        from geoflow.join.semijoin import bloom_semi_join
        rng = np.random.default_rng(12)
        big = pa.table({"k": rng.integers(0, 1000, 3000).astype(np.int64),
                        "row": np.arange(3000, dtype=np.int64)})
        keyset = np.unique(rng.integers(0, 1000, 80).astype(np.int64))
        keys = ray.data.from_arrow(pa.table({"k": keyset}))
        bds = ray.data.from_arrow(big).repartition(4)
        semi = {r["row"] for r in bloom_semi_join(bds, keys, "k").take_all()}
        anti = {r["row"] for r in bloom_semi_join(bds, keys, "k",
                                                  anti=True).take_all()}
        assert semi | anti == set(range(3000))
        assert semi & anti == set()
        blocked = set(keyset.tolist())
        for r in bloom_semi_join(bds, keys, "k", anti=True).take_all():
            assert r["k"] not in blocked

    def test_anti_requires_exact(self, ray_session):
        import ray
        from geoflow.join.semijoin import bloom_semi_join
        with pytest.raises(ValueError):
            bloom_semi_join(ray.data.range(5), ray.data.range(2), "id",
                            exact=False, anti=True)


class TestPartitionedKeyFilter:
    """Key-partitioned hash-join semi/anti filter — the documented
    escape hatch when key sets exceed the broadcast bound. Must agree
    with bloom_semi_join (exact) on every input."""

    def _sides(self, ray):
        import pyarrow as pa
        d = _events(2000, keys=50, seed=11)
        big = ray.data.from_arrow(pa.table(d)).repartition(6)
        keys = ray.data.from_arrow(pa.table({
            "k": np.arange(0, 50, 3, dtype=np.int64)}))
        return d, big, keys

    def test_semi_matches_broadcast(self, ray_session):
        import ray
        from geoflow.join.semijoin import (bloom_semi_join,
                                           partitioned_key_filter)
        d, big, keys = self._sides(ray)
        got = partitioned_key_filter(big, keys, "k", big_key_col="key")
        ref = bloom_semi_join(big, keys, "k", big_key_col="key")
        g = sorted(r["id"] for r in got.take_all())
        r = sorted(r["id"] for r in ref.take_all())
        assert g == r and len(g) > 0

    def test_anti_is_complement(self, ray_session):
        import ray
        from geoflow.join.semijoin import partitioned_key_filter
        d, big, keys = self._sides(ray)
        semi = partitioned_key_filter(big, keys, "k", big_key_col="key")
        anti = partitioned_key_filter(big, keys, "k", big_key_col="key",
                                      anti=True)
        s = {r["id"] for r in semi.take_all()}
        a = {r["id"] for r in anti.take_all()}
        assert s.isdisjoint(a) and len(s) + len(a) == len(d["id"])
        # anti preserves all original columns
        row = anti.take(1)[0]
        assert set(row) == {"id", "key", "val"}

    def test_anti_duplicate_keys_safe(self, ray_session):
        """Duplicate key-side rows must not duplicate or over-drop
        big-side rows in anti mode (no dedup pass is run there)."""
        import pyarrow as pa
        import ray
        from geoflow.join.semijoin import partitioned_key_filter
        big = ray.data.from_arrow(pa.table({
            "key": np.arange(10, dtype=np.int64)}))
        keys = ray.data.from_arrow(pa.table({
            "key": np.array([2, 2, 2, 5, 5], dtype=np.int64)}))
        out = sorted(r["key"] for r in partitioned_key_filter(
            big, keys, "key", anti=True).take_all())
        assert out == [0, 1, 3, 4, 6, 7, 8, 9]

    def test_semi_duplicate_keys_deduped(self, ray_session):
        """keys_unique=False dedups the key side so the inner join
        cannot fan out big-side rows."""
        import pyarrow as pa
        import ray
        from geoflow.join.semijoin import partitioned_key_filter
        big = ray.data.from_arrow(pa.table({
            "key": np.arange(10, dtype=np.int64)}))
        keys = ray.data.from_arrow(pa.table({
            "key": np.array([2, 2, 2, 5], dtype=np.int64)}))
        out = sorted(r["key"] for r in partitioned_key_filter(
            big, keys, "key", keys_unique=False).take_all())
        assert out == [2, 5]


class TestExactDedupJoinMode:
    def test_join_matches_broadcast(self, ray_session):
        import pyarrow as pa
        import ray
        from geoflow.text.dedup import exact_dedup
        n = 300
        texts = [f"document body {i % 40}" for i in range(n)]
        t = pa.table({"doc_id": np.arange(n, dtype=np.int64),
                      "text": pa.array(texts)})
        ds = ray.data.from_arrow(t).repartition(5)
        bc = sorted(r["doc_id"] for r in exact_dedup(
            ds, key_col="doc_id").take_all())
        jn = sorted(r["doc_id"] for r in exact_dedup(
            ds, key_col="doc_id", winner_mode="join").take_all())
        assert bc == jn == list(range(40))
        # join mode keeps the full row schema
        row = exact_dedup(ds, key_col="doc_id",
                          winner_mode="join").take(1)[0]
        assert set(row) == {"doc_id", "text"}


class TestGroupedRank:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd
        from geoflow.ops.grouped import grouped_rank
        d = _events(2000, keys=40)
        ds = rd.from_arrow(pa.table(d))
        out = grouped_rank(ds, "key", "val", "id",
                           descending=True).take_all()
        got = {r["id"]: r["rank"] for r in out}
        # brute force per key
        import collections
        byk = collections.defaultdict(list)
        for k, v, i in zip(d["key"], d["val"], d["id"]):
            byk[k].append((-v, i))
        for k, rows in byk.items():
            for rank, (_, i) in enumerate(sorted(rows)):
                assert got[i] == rank, (k, i)

    def test_every_row_ranked_dense_per_key(self, ray_session):
        import numpy as np
        import ray.data as rd
        from geoflow.ops.grouped import grouped_rank
        d = _events(999, keys=7)
        ds = rd.from_arrow(pa.table(d))
        out = grouped_rank(ds, "key", "val", "id").take_all()
        assert len(out) == 999
        byk = {}
        for r in out:
            byk.setdefault(r["key"], []).append(r["rank"])
        for k, ranks in byk.items():
            assert sorted(ranks) == list(range(len(ranks)))


class TestGroupedCumsumBudget:
    def test_cumsum_matches_brute(self, ray_session):
        import collections

        import ray.data as rd
        from geoflow.ops.grouped import grouped_cumsum
        d = _events(1500, keys=25)
        ds = rd.from_arrow(pa.table(d))
        out = grouped_cumsum(ds, "key", "val", "id").take_all()
        got = {r["id"]: r["cumsum"] for r in out}
        byk = collections.defaultdict(list)
        for k, v, i in zip(d["key"], d["val"], d["id"]):
            byk[k].append((i, v))
        for rows in byk.values():
            c = 0
            for i, v in sorted(rows):
                c += v
                assert got[i] == c

    def test_exclusive_and_budget_straddle(self, ray_session):
        import ray.data as rd
        from geoflow.ops.grouped import grouped_budget_filter
        t = pa.table({"h": ["a"] * 4 + ["b"],
                      "tok": [40, 50, 30, 10, 99],
                      "i": [0, 1, 2, 3, 4]})
        out = grouped_budget_filter(rd.from_arrow(t), "h", "tok",
                                    "i", 100).take_all()
        got = sorted((r["h"], r["i"], r["spent_before"])
                     for r in out)
        # a keeps 0/40/90 (90 < 100 straddles), drops 120; b keeps
        assert got == [("a", 0, 0), ("a", 1, 40), ("a", 2, 90),
                       ("b", 4, 0)]
