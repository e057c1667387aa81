"""Deletion-neighborhood fuzzy join (geoflow/text/fuzzyjoin.py):
kernel unit tests + brute-force Levenshtein cross-check."""
import numpy as np
import pyarrow as pa
import ray.data

from geoflow.text.fuzzyjoin import _is_lev1, deletion_key_pairs


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[lb]


def test_is_lev1_cases():
    a = np.array(["abcd", "abcd", "abcd", "abcd", "abcd", "ab"],
                 dtype=str)
    b = np.array(["abzd",     # substitution -> 1
                  "abd",      # deletion -> 1
                  "abqcd",    # insertion -> 1
                  "acdx",     # shares dk 'acd' but distance 2
                  "azzd",     # two substitutions
                  "abc"],     # append -> 1
                 dtype=str)
    got = _is_lev1(a, b)
    assert got.tolist() == [True, True, True, False, False, True]


def test_is_lev1_brute_fuzz():
    rng = np.random.default_rng(11)
    alph = "abc"
    words = ["".join(rng.choice(list(alph), rng.integers(1, 6)))
             for _ in range(120)]
    aa, bb = [], []
    for i in range(0, len(words) - 1, 2):
        if abs(len(words[i]) - len(words[i + 1])) <= 1:
            aa.append(words[i])
            bb.append(words[i + 1])
    a = np.array(aa, dtype=str)
    b = np.array(bb, dtype=str)
    got = _is_lev1(a, b)
    want = [(_lev(x, y) == 1) for x, y in zip(aa, bb)]
    assert got.tolist() == want


def test_deletion_key_pairs_end_to_end(ray_session):
    toks = ["hello", "hallo", "hell", "helloo", "world", "word",
            "wordy", "zzz", "hello"]
    ds = ray.data.from_arrow(pa.table({"tok": pa.array(toks)}))
    out = deletion_key_pairs(ds).to_pandas()
    got = {(r.tok1, r.tok2) for r in out.itertuples()}
    uniq = sorted(set(toks))
    want = {(x, y) for i, x in enumerate(uniq) for y in uniq[i + 1:]
            if _lev(x, y) == 1}
    assert got == want
    # every emitted pair is distance exactly 1
    for r in out.itertuples():
        assert _lev(r.tok1, r.tok2) == 1
        assert r.len_delta == abs(len(r.tok1) - len(r.tok2))
