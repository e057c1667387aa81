"""Winnowing fingerprints (geoflow/text/winnow.py). Driver gates are
the `winnow_fps` / `winnow_matches` oracle queries (planted-integer
token corpus through the splitmix64-in-SQL chain); these tests pin the
selection semantics (rightmost min, window w, short docs) and the
paper's coverage guarantee on the default token-hash mode."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.text.winnow import (_gram_hashes, _select_rightmost_min,
                                 fingerprint_matches, winnow_batch,
                                 winnow_fingerprints)


def _fps(texts, **kw):
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts})
    out = winnow_batch(t, **kw)
    res = {}
    for d, f in zip(out.column("doc_id").to_pylist(),
                    out.column("fp").to_pylist()):
        res.setdefault(d, set()).add(f)
    return res


def test_rightmost_min_tiebreak():
    # equal hashes in one window: the rightmost must be selected —
    # observable via selection positions being deduped to ONE entry
    h = np.array([5, 5, 5, 5], dtype=np.uint64)
    doc = np.zeros(4, dtype=np.int64)
    d, f = _select_rightmost_min(h, doc, w=4)
    assert len(d) == 1 and f[0] == 5


def test_window_min_selection():
    h = np.array([9, 3, 7, 8, 2, 6], dtype=np.uint64)
    doc = np.zeros(6, dtype=np.int64)
    # windows of 3: mins 3,3,2,2 -> distinct {3, 2}
    d, f = _select_rightmost_min(h, doc, w=3)
    assert set(f.tolist()) == {3, 2}


def test_short_doc_single_window():
    h = np.array([4, 1], dtype=np.uint64)
    doc = np.zeros(2, dtype=np.int64)
    d, f = _select_rightmost_min(h, doc, w=5)
    assert f.tolist() == [1]


def test_windows_never_cross_docs():
    # same hash stream, two docs: doc boundaries reset the windows
    h = np.array([9, 1, 9, 9, 9, 2], dtype=np.uint64)
    doc = np.array([0, 0, 0, 1, 1, 1], dtype=np.int64)
    d, f = _select_rightmost_min(h, doc, w=3)
    got = {}
    for dd, ff in zip(d.tolist(), f.tolist()):
        got.setdefault(dd, set()).add(ff)
    assert got == {0: {1}, 1: {2}}


def test_shared_run_guarantee():
    # the winnowing guarantee: a shared token run of length >= w+k-1
    # yields at least one shared fingerprint
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    a = "one two three " + shared + " four five six"
    b = "seven eight " + shared + " nine ten"
    fps = _fps([a, b], k=3, w=4)  # guarantee needs run >= 6 tokens
    assert fps[0] & fps[1]


def test_disjoint_docs_share_nothing():
    fps = _fps(["aa bb cc dd ee ff gg hh",
                "ii jj kk ll mm nn oo pp"], k=3, w=4)
    assert not (fps[0] & fps[1])


def test_planted_mode_matches_formula():
    # planted tokens parse to ints; same text twice -> same fp set
    txt = " ".join(f"t{i * 7 % 50}" for i in range(20))
    fps = _fps([txt, txt], mode="planted")
    assert fps[0] == fps[1] and len(fps[0]) >= 1


def test_matches_pipeline(ray_session):
    import ray
    shared = " ".join(f"t{i}" for i in range(12))
    texts = [shared + f" t{100 + i} t{200 + i} t{300 + i} t{400+i}"
             for i in range(3)] + ["t900 t901 t902 t903 t904 t905 "
                                   "t906 t907 t908 t909"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(4, dtype=np.int64), "text": texts}))
    fps = winnow_fingerprints(ds, mode="planted")
    m = fingerprint_matches(fps, min_shared=2).to_pandas()
    pairs = {(int(r.a), int(r.b)) for r in m.itertuples()}
    assert pairs == {(0, 1), (0, 2), (1, 2)}


def test_bucket_cap_drops_hot_fp(ray_session):
    import ray
    shared = " ".join(f"t{i}" for i in range(12))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [shared] * 5}))
    fps = winnow_fingerprints(ds, mode="planted")
    m = fingerprint_matches(fps, min_shared=1,
                            max_bucket=3).to_pandas()
    assert m.empty  # every bucket holds 5 docs > cap
