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


def _dl_ref(a: bytes, b: bytes) -> int:
    # scalar Lowrance-Wagner reference (the published DP verbatim)
    INF = len(a) + len(b)
    da: dict = {}
    H = [[0] * (len(b) + 2) for _ in range(len(a) + 2)]
    H[0][0] = INF
    for i in range(len(a) + 1):
        H[i + 1][0] = INF
        H[i + 1][1] = i
    for j in range(len(b) + 1):
        H[0][j + 1] = INF
        H[1][j + 1] = j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            k, l_ = da.get(b[j - 1], 0), db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            H[i + 1][j + 1] = min(
                H[i][j] + cost, H[i + 1][j] + 1, H[i][j + 1] + 1,
                H[k][l_] + (i - k - 1) + 1 + (j - l_ - 1))
        da[a[i - 1]] = i
    return H[len(a) + 1][len(b) + 1]


def test_damerau_unrestricted_vs_osa():
    from geoflow.text.editdist import damerau_batch
    # 'ca'->'abc' is THE case separating true DL (2: ca->ac->abc)
    # from OSA (3); plus transposition, empties, multibyte bytes.
    got = damerau_batch(["ca", "abc", "ab", "", "héllo"],
                        ["abc", "ca", "ba", "xy", "hello"])
    assert got.tolist() == [2, 2, 1, 2, 2]


def test_damerau_fuzz_matches_reference():
    import random

    from geoflow.text.editdist import damerau_batch
    rng = random.Random(11)
    a = ["".join(rng.choice("abcé ") for _ in range(rng.randint(0, 10)))
         for _ in range(300)]
    b = ["".join(rng.choice("abcé ") for _ in range(rng.randint(0, 10)))
         for _ in range(300)]
    got = damerau_batch(a, b, chunk=64)
    ref = [_dl_ref(x.encode(), y.encode()) for x, y in zip(a, b)]
    assert got.tolist() == ref
