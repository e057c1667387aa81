"""Exact phrase matching over tokenized text — the positional layer
of keyword search (reference surface: text query operators; engine
shape: one vectorized map_batches scan, no shuffle).

A phrase hit is a CONSECUTIVE token-sequence window (overlapping
windows each count: 'batch batch batch' holds two 'batch batch'
hits), under the repo token rule (hashing.tokenize — RE2
[\\p{L}\\p{N}_]+ runs over lowercased text), so DuckDB reproduces
hits via regexp_extract_all + LATERAL window indexing (CLAUDE.md
n-gram precedent). Token identity inside the engine is the 64-bit
blake2b token hash (hash64) — the same identity the inverted index
uses; a cross-engine divergence needs a 64-bit collision INSIDE one
document window (~2^-64 per pair, accepted and documented)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import hash64, tokenize

__all__ = ["phrase_counts"]


def phrase_counts(ds, phrase: str, text_col: str = "text",
                  key_col: str = "doc_id"):
    """(key, n_hits) for every document containing the phrase at
    least once; n_hits = number of (overlapping) windows."""
    ph_flat, _ = tokenize(pa.array([phrase]))
    p = hash64(ph_flat).view(np.int64)
    m = len(p)
    if m == 0:
        raise ValueError("phrase has no tokens")

    def count(batch: pa.Table) -> pa.Table:
        flat, parent = tokenize(batch.column(text_col))
        th = hash64(flat).view(np.int64)
        n = len(th)
        if n < m:
            return pa.table({key_col: batch.column(key_col).slice(0, 0),
                             "n_hits": pa.array([], pa.int64())})
        nw = n - m + 1
        ok = th[0:nw] == p[0]
        for j in range(1, m):
            ok &= th[j:nw + j] == p[j]
        ok &= parent[0:nw] == parent[m - 1:n]
        hits = np.bincount(parent[:nw][ok],
                           minlength=batch.num_rows).astype(np.int64)
        nz = np.flatnonzero(hits)
        return pa.table({
            key_col: batch.column(key_col).take(
                pa.array(nz, pa.int64())),
            "n_hits": pa.array(hits[nz])})

    return ds.map_batches(count, batch_format="pyarrow")
