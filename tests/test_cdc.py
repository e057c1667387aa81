"""Content-defined chunking (text/cdc.py)."""

import numpy as np
import pyarrow as pa

from geoflow.text.cdc import cdc_chunk_batch, cdc_chunks
from geoflow.text.hashing import mix64


def _batch(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _brute(text, base=257, window=4, mod=64, head=32):
    """Per-doc reference: python loop over positions."""
    cps = [ord(c) for c in text]
    ends = []
    for i in range(window - 1, len(cps)):
        h = sum(cps[i - p] * base ** p for p in range(window))
        if int(mix64(np.array([h], np.uint64))[0]) % mod == 0:
            ends.append(i)
    if cps and (not ends or ends[-1] != len(cps) - 1):
        ends.append(len(cps) - 1)
    out, s = [], 0
    for ci, e in enumerate(ends, 1):
        out.append((ci, s + 1, e - s + 1, text[s:s + min(e - s + 1,
                                                         head)]))
        s = e + 1
    return out


def test_matches_bruteforce():
    rng = np.random.default_rng(42)
    texts = ["".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))
             for n in (0, 1, 3, 4, 5, 200, 500)]
    got = cdc_chunk_batch(_batch(texts)).to_pylist()
    exp = []
    for di, t in enumerate(texts):
        for ci, s, ln, hd in _brute(t):
            exp.append({"doc_id": di, "chunk_idx": ci, "start": s,
                        "chunk_len": ln, "chunk_head": hd})
    assert got == exp


def test_chunks_partition_text():
    rng = np.random.default_rng(1)
    text = "".join(chr(32 + int(c)) for c in rng.integers(0, 90, 3000))
    rows = cdc_chunk_batch(_batch([text])).to_pylist()
    pos = 1
    for i, r in enumerate(rows, 1):
        assert r["chunk_idx"] == i and r["start"] == pos
        assert text[r["start"] - 1:][:min(r["chunk_len"], 32)] == \
            r["chunk_head"]
        pos += r["chunk_len"]
    assert pos - 1 == len(text)


def test_insertion_shifts_boundaries_only_locally():
    # the CDC property: prefix insertion re-chunks only the prefix
    # region — the tail boundary POSITIONS shift by the insert length
    # but the tail chunk CONTENT set is unchanged.
    rng = np.random.default_rng(7)
    base_text = "".join(chr(97 + int(c))
                        for c in rng.integers(0, 26, 4000))
    ins = "XYZZY"
    a = cdc_chunk_batch(_batch([base_text])).to_pylist()
    b = cdc_chunk_batch(_batch([ins + base_text])).to_pylist()

    def key(r):
        return (r["chunk_len"], r["chunk_head"])

    tail_a = [key(r) for r in a[2:]]
    tail_b = [key(r) for r in b[len(b) - len(tail_a):]]
    assert tail_a == tail_b and len(tail_a) > 10


def test_unicode_and_doc_isolation():
    # multibyte codepoints count as one position; windows never span
    # doc boundaries (same text chunks identically alone or batched)
    t1 = "héllo wörld ünïcode " * 20
    t2 = "plain ascii text " * 30
    solo = cdc_chunk_batch(_batch([t1])).to_pylist()
    both = cdc_chunk_batch(_batch([t2, t1], ids=[9, 0])).to_pylist()
    mine = [r for r in both if r["doc_id"] == 0]
    for r in mine:
        r["doc_id"] = 0
    assert [tuple(r.values())[1:] for r in mine] == \
        [tuple(r.values())[1:] for r in solo]


def test_dataset_roundtrip(ray_session):
    import ray

    texts = ["content defined chunking " * 40] * 4
    ds = ray.data.from_arrow(_batch(texts))
    out = cdc_chunks(ds).to_pandas()
    assert (out.groupby("doc_id").chunk_len.sum() ==
            len(texts[0])).all()
