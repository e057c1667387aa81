"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm; public spec).

Per document: tokenize, hash every k-gram of consecutive tokens, slide
a window of w consecutive k-gram hashes and select the MINIMUM hash in
each window (ties -> the RIGHTMOST occurrence, per the paper §2.3).
The selected hash set is the fingerprint: any shared token run of
length >= w + k - 1 between two documents is guaranteed to share at
least one fingerprint (the winnowing guarantee), making fingerprint
intersection a local plagiarism / near-dup overlap detector that
substring-dedup window hashes (text/substrdedup.py) do not give
cheaply (those gate EXACT windows; winnowing samples 2/(w+1) of grams
density-guaranteed).

Hash modes:
- ``token`` (default): hashing.hash64 over each token, k-gram combined
  by a mod-2^64 polynomial, splitmix64 finish. Vectorized end to end.
- ``planted``: tokens are "t<int>" literals; the gram polynomial runs
  over the PARSED integers (base 2^20) so a DuckDB oracle reproduces
  every fingerprint bit-exactly through the splitmix64-in-SQL chain
  (__ray_entry__._sql_mix64_chain). This gates the winnowing machinery
  (gram windows, rightmost-min selection, dedup, matching); the token
  hash itself is gated by the repo's other hashing oracles.

Scale shape: fingerprint extraction is one map_batches pass (no
shuffle); matching is groupby(fp) pair emission + one pair groupby —
per-fingerprint bucket size is capped (``max_bucket``, skew guard:
a boilerplate run shared by millions of docs would otherwise emit
O(n^2) pairs; capped buckets are DROPPED, not sampled, and counted in
the documented caveat — mirror of cocitation's hub caveat).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geoflow.text.hashing import hash64, mix64, tokenize

GRAM_BASE = np.uint64(1 << 20)


def _doc_lengths(parent: np.ndarray, n_docs: int) -> np.ndarray:
    return np.bincount(parent, minlength=n_docs).astype(np.int64)


def _gram_hashes(vals: np.ndarray, parent: np.ndarray, k: int,
                 base: np.uint64) -> tuple[np.ndarray, np.ndarray]:
    """(hash, doc) for every k-gram fully inside one document, over the
    flat token-value stream. Polynomial mod 2^64, splitmix64 finish."""
    n = len(vals)
    if n < k:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    g = vals[: n - k + 1].copy()
    for i in range(1, k):
        g = g * base + vals[i: n - k + 1 + i]
    ok = parent[: n - k + 1] == parent[k - 1:]
    return mix64(g[ok]), parent[: n - k + 1][ok]


def _select_rightmost_min(h: np.ndarray, doc: np.ndarray,
                          w: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (doc, hash) selected by winnowing windows of w gram
    hashes (per doc; windows never cross docs). Documents with fewer
    than w grams contribute the rightmost-min of ALL their grams (the
    single short window — paper semantics for short docs)."""
    n = len(h)
    if n == 0:
        return doc[:0], h[:0]
    out_doc, out_fp = [], []
    if n >= w:
        wv = np.lib.stride_tricks.sliding_window_view(h, w)
        # windows fully inside one doc
        ok = doc[: n - w + 1] == doc[w - 1:]
        if ok.any():
            wv_ok = wv[ok]
            # argmin of the REVERSED window = rightmost minimal
            rel = w - 1 - np.argmin(wv_ok[:, ::-1], axis=1)
            pos = np.flatnonzero(ok) + rel
            out_doc.append(doc[pos])
            out_fp.append(h[pos])
    # short docs: fewer than w grams -> one window over all grams
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    lens = np.diff(np.r_[starts, n])
    short = lens < w
    if short.any():
        for s, ln in zip(starts[short], lens[short]):
            seg = h[s: s + ln]
            rel = ln - 1 - int(np.argmin(seg[::-1]))
            out_doc.append(doc[s + rel: s + rel + 1])
            out_fp.append(seg[rel: rel + 1])
    d = np.concatenate(out_doc) if out_doc else doc[:0]
    f = np.concatenate(out_fp) if out_fp else h[:0]
    # distinct (doc, fp): sort by (doc, fp) and drop adjacent dups
    order = np.lexsort((f, d))
    d, f = d[order], f[order]
    keep = np.r_[True, (d[1:] != d[:-1]) | (f[1:] != f[:-1])]
    return d[keep], f[keep]


def winnow_batch(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3, w: int = 4,
                 mode: str = "token") -> pa.Table:
    """map_batches UDF: (doc_id, fp) distinct winnowing fingerprints.
    fp is the uint64 hash viewed as int64 (two's complement, matching
    the SQL oracle's normalization)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    flat, parent = tokenize(batch.column(text_col), lower=False)
    if mode == "planted":
        vals = pc.cast(pc.utf8_slice_codeunits(flat, 1),
                       pa.int64()).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
    elif mode == "token":
        vals = hash64(flat)
    else:
        raise ValueError("mode must be token|planted")
    h, doc = _gram_hashes(vals, parent, k, GRAM_BASE)
    d, f = _select_rightmost_min(h, doc, w)
    return pa.table({"doc_id": ids[d],
                     "fp": f.view(np.int64)})


def winnow_fingerprints(ds, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        w: int = 4, mode: str = "token"):
    """Dataset of distinct (doc_id, fp) winnowing fingerprints. One
    map_batches pass; in-batch distinct only (a doc split across
    blocks could emit a duplicate (doc_id, fp) — readers needing
    global distinct add a groupby; the match counter below is
    duplicate-safe because extraction is per-doc-in-one-block under
    read_parquet row grouping)."""
    return ds.map_batches(
        lambda b: winnow_batch(b, text_col, id_col, k, w, mode),
        batch_format="pyarrow")


def fingerprint_matches(fp_ds, min_shared: int = 2,
                        max_bucket: int = 1024):
    """(a, b, shared) document pairs sharing >= min_shared
    fingerprints. Buckets larger than ``max_bucket`` docs are dropped
    (boilerplate-run skew guard — documented caveat, not sampling)."""
    from ray.data.aggregate import Sum

    def pairs(g: pa.Table) -> pa.Table:
        d = np.unique(g.column("doc_id").to_numpy(zero_copy_only=False))
        if len(d) < 2 or len(d) > max_bucket:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(d), k=1)
        return pa.table({"a": pa.array(d[ii]), "b": pa.array(d[jj]),
                         "n": pa.array(np.ones(len(ii), np.int64))})

    agg = fp_ds.groupby("fp").map_groups(pairs,
                                         batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Sum("n"))

    def fin(bt: pa.Table) -> pa.Table:
        if "a" not in bt.schema.names or bt.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "shared": pa.array([], pa.int64())})
        out = pa.table({"a": bt.column("a"), "b": bt.column("b"),
                        "shared": pc.cast(bt.column("sum(n)"),
                                          pa.int64())})
        return out.filter(pc.greater_equal(out.column("shared"),
                                           min_shared))

    return agg.map_batches(fin, batch_format="pyarrow")
