"""Per-document TextRank (text/textrank.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from geoflow.text.textrank import (textrank_batch, textrank_keywords,
                                   textrank_oracle_sql)


def _brute(texts, window=2, iterations=4, mass=10 ** 12,
           damping=(17, 20)):
    """Independent per-doc reference: dict-based graph + loops."""
    import re
    num, den = damping
    out = {}
    for di, text in enumerate(texts):
        toks = re.findall(r"[^\W]+", text.lower(), re.UNICODE)
        w = {}
        for d in range(1, window + 1):
            for i in range(len(toks) - d):
                a, b = toks[i], toks[i + d]
                if a == b:
                    continue
                w[(a, b)] = w.get((a, b), 0) + 1
                w[(b, a)] = w.get((b, a), 0) + 1
        if not w:
            continue
        nodes = sorted({a for a, _ in w})
        wout = {a: 0 for a in nodes}
        for (a, _), c in w.items():
            wout[a] += c
        n = len(nodes)
        r0 = mass // n
        base = (r0 * (den - num)) // den
        r = {a: r0 for a in nodes}
        for _ in range(iterations):
            s = {a: 0 for a in nodes}
            for (a, b), c in w.items():
                s[b] += (r[a] * c) // wout[a]
            r = {a: base + (num * s[a]) // den for a in nodes}
        out[di] = r
    return out


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)),
                                        type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def test_matches_bruteforce():
    texts = [
        "the quick brown fox jumps over the lazy dog the fox",
        "alpha beta alpha beta gamma delta gamma alpha",
        "single",
        "",
        "rep rep rep rep",          # only self-pairs -> no graph
        "x y x y x y x y z q x",
    ]
    got = textrank_batch(_batch(texts), k=1000)
    exp = _brute(texts)
    got_map = {}
    for row in got.to_pylist():
        got_map.setdefault(row["doc_id"], {})[row["token"]] = \
            row["rank_units"]
    assert got_map == exp


def test_topk_order_and_ties():
    # two tokens with identical symmetric structure tie -> token ASC
    texts = ["b a b a b a"]
    got = textrank_batch(_batch(texts), k=1).to_pylist()
    assert len(got) == 1 and got[0]["token"] == "a"
    full = textrank_batch(_batch(texts), k=5).to_pylist()
    assert [r["token"] for r in full] == ["a", "b"]
    assert full[0]["rank_units"] == full[1]["rank_units"]


def test_mass_conservation_scale():
    # per-doc total rank stays within integer-floor slack of mass
    texts = ["w%d w%d w%d" % (i % 7, (i * 3) % 7, (i * 5) % 7)
             for i in range(50)]
    text = " ".join(texts)
    got = textrank_batch(_batch([text]), k=10 ** 6)
    tot = sum(r["rank_units"] for r in got.to_pylist())
    assert 0.99 * 10 ** 12 < tot <= 10 ** 12


def test_dataset_roundtrip(ray_session):
    import ray

    texts = ["graph rank graph node rank edge"] * 3
    ds = ray.data.from_arrow(_batch(texts))
    out = textrank_keywords(ds, k=2).to_pandas()
    assert len(out) == 6
    assert set(out.columns) == {"doc_id", "token", "rank_units"}


def test_oracle_sql_matches_kernel():
    texts = [
        "spark query engine query plan spark",
        "hello world hello again world again hello",
        "a b c d e f g a b c",
    ]
    t = _batch(texts)
    got = textrank_batch(t).to_pandas().sort_values(
        ["doc_id", "token"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(textrank_oracle_sql()).df().sort_values(
        ["doc_id", "token"]).reset_index(drop=True)
    exp["rank_units"] = exp["rank_units"].astype("int64")
    assert got.equals(exp)


def test_batch_too_large_guard():
    with pytest.raises(ValueError):
        # fake an oversized vocab via monkey batch: 2**21 rows is too
        # big to build here; instead check the row-count guard branch
        textrank_batch(pa.table({
            "doc_id": pa.array(np.arange(1 << 21), type=pa.int64()),
            "text": pa.array(["a b"] * (1 << 21), type=pa.string())}))
