"""Windowed co-occurrence + PMI — text/cooccur.py."""
import math
from collections import Counter

import pyarrow as pa

from geoflow.text.cooccur import (cooccur_counts, cooccur_pmi,
                                  window_pairs_batch)


def _brute_pairs(texts, window=2):
    c = Counter()
    for tx in texts:
        tk = tx.lower().split()
        for i in range(len(tk)):
            for d in range(1, window + 1):
                if i + d < len(tk):
                    a, b = sorted((tk[i], tk[i + d]))
                    c[(a, b)] += 1
    return c


TEXTS = ["big data big data big", "fast scan fast scan",
         "solo", "", "big fast big fast data"]


class TestBatchKernel:
    def test_matches_brute(self):
        t = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
        out = window_pairs_batch(t, window=2)
        got = Counter()
        for a, b, c in zip(out.column("t1").to_pylist(),
                           out.column("t2").to_pylist(),
                           out.column("cnt").to_pylist()):
            got[(a, b)] += c
        assert got == _brute_pairs(TEXTS, 2)

    def test_no_cross_doc_pairs(self):
        t = pa.table({"doc_id": [0, 1], "text": ["aaa bbb", "ccc ddd"]})
        out = window_pairs_batch(t, window=2)
        pairs = set(zip(out.column("t1").to_pylist(),
                        out.column("t2").to_pylist()))
        assert ("bbb", "ccc") not in pairs

    def test_empty_and_short(self):
        t = pa.table({"doc_id": [0, 1], "text": ["", "one"]})
        out = window_pairs_batch(t, window=2)
        assert out.num_rows == 0
        assert out.column_names == ["t1", "t2", "cnt"]


class TestDistributed:
    def test_counts_and_pmi_exact(self, ray_session):
        import ray
        ds = ray.data.from_arrow(pa.table(
            {"doc_id": list(range(len(TEXTS))), "text": TEXTS}))
        brute = _brute_pairs(TEXTS, 2)
        got = {(r["t1"], r["t2"]): r["cnt"]
               for r in cooccur_counts(ds, window=2).take_all()}
        assert got == dict(brute)
        # PMI: symmetric pair-marginal convention, bit-exact
        total = sum(brute.values())
        marg = Counter()
        for (a, b), c in brute.items():
            marg[a] += c
            marg[b] += c
        out = cooccur_pmi(ds, window=2, k=4).take_all()
        assert len(out) == 4
        cnts = [r["cnt"] for r in out]
        assert cnts == sorted(cnts, reverse=True)
        for r in out:
            want = math.log(
                (float(brute[(r["t1"], r["t2"])]) * float(total))
                / (float(marg[r["t1"]]) * float(marg[r["t2"]])))
            assert r["pmi"] == want
