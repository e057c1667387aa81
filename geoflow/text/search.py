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
op-for-op in the SQL oracle (list_filter counts). BM25 ranking lives
in ``bm25_score`` below — float idf/length normalization IS
oracle-gateable because DuckDB ln() and Python math.log share glibc
libm bit-for-bit (verified; numpy's SIMD np.log does NOT and is
banned from the scoring path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash64, tokenize

__all__ = ["bm25_score", "bm25_term_stats_batch",
           "keyword_match_batch", "keyword_search"]


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


# --------------------------------------------------------------------
# BM25 (Robertson/Walker Okapi, k1=1.2 b=0.75 published defaults)
# --------------------------------------------------------------------

def bm25_term_stats_batch(batch: pa.Table, query_tokens,
                          text_col: str = "text",
                          key_col: str = "doc_id") -> pa.Table:
    """Compact per-doc projection for BM25: (key, dl, tf0..tfK-1,
    m0..mK-1) — dl = total token count, tf_j = occurrences of query
    token j (IN THE CALLER'S ORDER — score summation order depends on
    it), m_j = 1 if tf_j>0 (df partial). One tokenize + bincounts,
    fully vectorized; only ~8·(2+2K) bytes/doc leave the read task."""
    n_rows = batch.num_rows
    toks = [t.lower() for t in query_tokens]
    nq = len(toks)
    qh = hash64(pa.array(toks, type=pa.string()))
    order = np.argsort(qh)
    qh_sorted = qh[order]
    flat, parent = tokenize(batch.column(text_col))
    th = hash64(flat)
    dl = np.bincount(parent, minlength=n_rows).astype(np.int64)
    cols = {key_col: batch.column(key_col), "dl": pa.array(dl)}
    if len(th) and nq:
        pos = np.clip(np.searchsorted(qh_sorted, th), 0, nq - 1)
        hit = qh_sorted[pos] == th
        qi = order[pos[hit]]  # back to caller order
        cell = np.bincount(parent[hit] * nq + qi,
                           minlength=n_rows * nq).reshape(n_rows, nq)
    else:
        cell = np.zeros((n_rows, nq), dtype=np.int64)
    for j in range(nq):
        tf = cell[:, j].astype(np.int64)
        cols[f"tf{j}"] = pa.array(tf)
        cols[f"m{j}"] = pa.array((tf > 0).astype(np.int64))
    return pa.table(cols)


def bm25_score(ds, query_tokens, text_col: str = "text",
               key_col: str = "doc_id", k1: float = 1.2,
               b: float = 0.75, k: int | None = None):
    """Okapi BM25 over the corpus in the canonical two-phase shape:

      1. ONE streaming pass projects each doc to (key, dl, per-term
         tf) — the corpus payload is read once and never again;
      2. the compact projection is materialized (8·(2+2K) bytes/doc)
         and reduced to the global stats (N, Σdl, per-term df) by one
         distributed aggregate;
      3. a scoring map over the same materialized projection emits
         score = Σ_j idf_j · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))
         summed in QUERY-TOKEN ORDER (left-associated), with
         idf_j = ln((N - df_j + ½)/(df_j + ½)).

    Exactness: every step after tokenization is IEEE double +,·,/ in
    a fixed written order, and idf goes through math.log scalar calls
    (glibc libm — bit-identical to DuckDB ln(); numpy's SIMD np.log
    is NOT and must not be used here), so scores hash-match an SQL
    oracle bit-for-bit. With ``k``, returns the global top-k by
    (score desc, key asc) over the projection."""
    import math

    toks = list(query_tokens)
    nq = len(toks)
    stats = ds.map_batches(
        lambda t: bm25_term_stats_batch(t, toks, text_col=text_col,
                                        key_col=key_col),
        batch_format="pyarrow").materialize()
    from ray.data.aggregate import Count, Sum
    aggs = [Count(), Sum("dl")] + [Sum(f"m{j}") for j in range(nq)]
    g = stats.aggregate(*aggs)
    n_docs = int(g["count()"])
    avgdl = (int(g["sum(dl)"] or 0)) / n_docs
    idf = [math.log((n_docs - int(g[f"sum(m{j})"] or 0) + 0.5)
                    / (int(g[f"sum(m{j})"] or 0) + 0.5))
           for j in range(nq)]

    def score(tbl: pa.Table) -> pa.Table:
        dl = tbl.column("dl").to_numpy(zero_copy_only=False)
        norm = k1 * ((1.0 - b) + b * dl / avgdl)
        s = np.zeros(tbl.num_rows, dtype=np.float64)
        for j in range(nq):
            tf = tbl.column(f"tf{j}").to_numpy(zero_copy_only=False)
            w = idf[j] * tf * (k1 + 1.0) / (tf + norm)
            s = s + np.where(tf > 0, w, 0.0)
        return pa.table({key_col: tbl.column(key_col),
                         "dl": tbl.column("dl"),
                         "bm25": pa.array(s)})

    out = stats.map_batches(score, batch_format="pyarrow")
    if k is not None:
        out = out.sort(["bm25", key_col],
                       descending=[True, False]).limit(k)
    return out
