"""Vectorized byte Levenshtein (text/editdist.py). Driver gate: the
`edit_distance` query vs DuckDB levenshtein; here: reference-DP
equality incl. multibyte, empties, and the pair-join plumbing."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.text.editdist import levenshtein_batch, pair_edit_distances


def _ref(a: bytes, b: bytes) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def test_levenshtein_known_values():
    got = levenshtein_batch(["kitten", "", "abc", "héllo", "same"],
                            ["sitting", "ab", "", "hello", "same"])
    assert got.tolist() == [3, 2, 3, 2, 0]   # héllo: é is 2 bytes


def test_levenshtein_random_vs_reference():
    rng = np.random.default_rng(23)
    al, bl = [], []
    for _ in range(200):
        al.append(bytes(rng.integers(97, 102, rng.integers(0, 12))))
        bl.append(bytes(rng.integers(97, 102, rng.integers(0, 12))))
    got = levenshtein_batch(al, bl)
    want = [_ref(a, b) for a, b in zip(al, bl)]
    assert got.tolist() == want


def test_pair_edit_distances_join():
    texts = ["alpha", "alphb", "gamma", "gamka", "x"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts)}))
    out = pair_edit_distances(ds, prefix_chars=10,
                              num_partitions=2).to_pandas()
    got = dict(zip(out.doc_id, out.lev))
    want = {i: _ref(texts[i].encode(), texts[i + 1].encode())
            for i in range(4)}
    assert got == want
