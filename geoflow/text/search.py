"""Corpus keyword search: conjunctive token match + term-frequency
ranking as one streaming pass.

The scan-search shape for ad-hoc corpus queries ("which documents
mention all of X, Y, Z"): no index is built — the corpus streams
through one map_batches pass that tokenizes (hashing.tokenize, RE2),
hashes, and counts query-token occurrences fully vectorized; only the
matched (key, tf) 16-byte projection leaves the read task, and the
global top-k moves just those rows through a sort. Query-token sets
are a handful of strings — they ride the task closure, no broadcast
machinery needed. For repeated interactive search over a fixed corpus
the PQ/IVF family (vector/) and the persisted content index
(text/incremental.py) are the indexed alternatives; this is the
one-shot distributed grep.

Ranking is integer term frequency (sum of query-token occurrence
counts), ties by ascending key — deterministic and reproducible
op-for-op in the SQL oracle (list_filter counts). BM25-style scoring
needs float idf/length normalization and is deliberately out of the
oracle surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash64, tokenize

__all__ = ["keyword_match_batch", "keyword_search"]


def keyword_match_batch(batch: pa.Table, query_hashes: np.ndarray,
                        text_col: str = "text",
                        key_col: str = "doc_id") -> pa.Table:
    """(key, n_match, tf) for every row of the batch: n_match = how
    many DISTINCT query tokens appear, tf = total occurrences of all
    query tokens. ``query_hashes`` is the SORTED uint64 hash64 array of
    the lowercased query tokens."""
    n_rows = batch.num_rows
    nq = len(query_hashes)
    flat, parent = tokenize(batch.column(text_col))
    th = hash64(flat)
    if len(th) and nq:
        pos = np.clip(np.searchsorted(query_hashes, th), 0, nq - 1)
        hit = query_hashes[pos] == th
        doc = parent[hit]
        qi = pos[hit]
        # per (doc, query-token) occurrence counts in one bincount
        cell = np.bincount(doc * nq + qi,
                           minlength=n_rows * nq).reshape(n_rows, nq)
        tf = cell.sum(axis=1).astype(np.int64)
        n_match = (cell > 0).sum(axis=1).astype(np.int64)
    else:
        tf = np.zeros(n_rows, np.int64)
        n_match = np.zeros(n_rows, np.int64)
    return pa.table({key_col: batch.column(key_col),
                     "n_match": pa.array(n_match),
                     "tf": pa.array(tf)})


def keyword_search(ds, query_tokens, text_col: str = "text",
                   key_col: str = "doc_id", k: int | None = None,
                   mode: str = "all"):
    """Documents matching the query tokens, ranked by term frequency.

    mode="all": conjunctive — every query token must appear (the
    distributed-grep AND). mode="any": disjunctive. Returns
    (key, tf) rows; with ``k`` set, the global top-k by
    (tf desc, key asc) — the sort runs over the matched projection
    only (16 bytes/row), never the corpus payload."""
    if mode not in ("all", "any"):
        raise ValueError("mode must be all|any")
    toks = [t.lower() for t in query_tokens]
    qh = np.sort(hash64(pa.array(toks, type=pa.string())))
    need = len(set(toks)) if mode == "all" else 1

    def match(batch: pa.Table) -> pa.Table:
        m = keyword_match_batch(batch, qh, text_col=text_col,
                                key_col=key_col)
        keep = pc.greater_equal(m.column("n_match"),
                                pa.scalar(need, pa.int64()))
        return m.filter(keep).select([key_col, "tf"])

    out = ds.map_batches(match, batch_format="pyarrow")
    if k is not None:
        out = out.sort(["tf", key_col],
                       descending=[True, False]).limit(k)
    return out
