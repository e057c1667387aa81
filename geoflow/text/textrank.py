"""Per-document TextRank keyword extraction (Mihalcea & Tarau 2004).

Each document gets its own word graph: tokens co-occurring within a
window of ``window`` positions are joined by an undirected edge whose
weight is the number of co-occurrences; PageRank over that graph ranks
the document's words and the top-``k`` become its keywords.

Shape (Ray-Data-first): the whole algorithm is a SINGLE stateless
``map_batches`` pass — every document's graph is tiny, so the batch
kernel builds ALL the graphs of a batch at once in flat numpy arrays
(nodes keyed by ``doc_row * V + token_code``) and runs the power
iterations for every document simultaneously with `np.add.reduceat`
over dst-sorted edge segments. No shuffle, no driver state,
embarrassingly parallel at any corpus size.

Exactness: ranks are int64 fixed point exactly like
graph/pagerank.py (mass 1e12, damping 17/20): per-edge contribution
``(rank * w) // wout`` and damping ``base + (17 * s) // 20`` are pure
integer ops whose per-doc sums are order-independent, so the output
hash-matches ``textrank_oracle_sql`` — an unrolled-CTE DuckDB oracle
generated from the same constants (CLAUDE.md: every CTE of an
unrolled-round oracle is AS MATERIALIZED).

Reference semantics: keyword extraction utilities of the reference's
text-processing surface (SURVEY.md §2 text-analysis group); the graph
ranking itself follows the published paper, not reference code.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import tokenize
from ..graph.pagerank import MASS, DAMPING

__all__ = ["textrank_batch", "textrank_keywords", "textrank_oracle_sql"]

_EMPTY = pa.table({"doc_id": pa.array([], type=pa.int64()),
                   "token": pa.array([], type=pa.string()),
                   "rank_units": pa.array([], type=pa.int64())})


def textrank_batch(batch: pa.Table, *, window: int = 2,
                   iterations: int = 4, k: int = 5,
                   mass: int = MASS,
                   damping: tuple[int, int] = DAMPING,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> pa.Table:
    """Vectorized per-batch TextRank: (doc_id, token, rank_units) for
    each document's top-``k`` tokens (rank DESC, token ASC). Documents
    whose graph is empty (fewer than two distinct adjacent tokens)
    emit no rows — mirroring the SQL oracle, whose pair CTE is empty
    for them."""
    num, den = damping
    flat, parent = tokenize(batch.column(text_col))
    if len(flat) == 0:
        return _EMPTY
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_numpy(zero_copy_only=False)
    nv = len(vocab)
    if nv >= 1 << 21 or len(batch) >= 1 << 21:  # packed-key headroom
        raise ValueError("textrank_batch: batch too large to pack keys"
                         " — lower batch_size")
    # ---- directed edge occurrences: both directions per window pair
    srcs, dsts, docs = [], [], []
    for d in range(1, window + 1):
        if len(codes) <= d:
            break
        same = parent[:-d] == parent[d:]
        diff = codes[:-d] != codes[d:]
        m = same & diff
        if not m.any():
            continue
        a, b, p = codes[:-d][m], codes[d:][m], parent[:-d][m]
        srcs.append(np.concatenate([a, b]))
        dsts.append(np.concatenate([b, a]))
        docs.append(np.concatenate([p, p]))
    if not srcs:
        return _EMPTY
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    doc = np.concatenate(docs)
    # ---- aggregate to weighted edges, sorted by (doc, src, dst)
    key = (doc << 42) | (src << 21) | dst
    ekey, w = np.unique(key, return_counts=True)
    w = w.astype(np.int64)
    edoc = ekey >> 42
    esrc = (ekey >> 21) & ((1 << 21) - 1)
    edst = ekey & ((1 << 21) - 1)
    # ---- nodes = unique (doc, src) (undirected expansion covers all)
    skey = ekey >> 21  # (doc << 21) | src, sorted
    nkey, seg = np.unique(skey, return_index=True)
    wout_node = np.add.reduceat(w, seg)
    ndoc = nkey >> 21
    ncode = nkey & ((1 << 21) - 1)
    m_nodes = len(nkey)
    src_idx = np.searchsorted(nkey, skey)           # per edge
    dst_idx = np.searchsorted(nkey, (edoc << 21) | edst)
    wout = wout_node[src_idx]
    # ---- per-doc node counts -> r0/base per node
    udoc, ncount = np.unique(ndoc, return_counts=True)
    n_of_node = np.repeat(ncount, ncount)
    r0 = mass // n_of_node
    base = (r0 * (den - num)) // den
    # ---- power iterations over dst-sorted edge segments
    order = np.argsort(dst_idx, kind="stable")
    e_src_i = src_idx[order]
    e_dst_i = dst_idx[order]
    e_w = w[order]
    e_wout = wout[order]
    udst, ustart = np.unique(e_dst_i, return_index=True)
    r = r0.copy()
    for _ in range(iterations):
        contrib = (r[e_src_i] * e_w) // e_wout
        s = np.zeros(m_nodes, dtype=np.int64)
        s[udst] = np.add.reduceat(contrib, ustart)
        r = base + (num * s) // den
    # ---- per-doc top-k by (rank DESC, token ASC)
    toks = vocab[ncode]
    sel = np.lexsort((toks, -r, ndoc))
    starts = np.searchsorted(ndoc[sel], udoc)
    pos = np.arange(m_nodes) - np.repeat(starts, ncount)
    keep = sel[pos < k]
    doc_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(doc_ids[ndoc[keep]], type=pa.int64()),
        "token": pa.array(toks[keep], type=pa.string()),
        "rank_units": pa.array(r[keep], type=pa.int64())})


def textrank_keywords(ds, *, window: int = 2, iterations: int = 4,
                      k: int = 5, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Dataset API: per-document TextRank keywords in one stateless
    map pass (no shuffle)."""
    def fn(b: pa.Table) -> pa.Table:
        return textrank_batch(b, window=window, iterations=iterations,
                              k=k, id_col=id_col, text_col=text_col)
    return ds.map_batches(fn, batch_format="pyarrow")


def textrank_oracle_sql(table: str = "documents", *, window: int = 2,
                        iterations: int = 4, k: int = 5,
                        mass: int = MASS,
                        damping: tuple[int, int] = DAMPING,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """Unrolled-CTE DuckDB oracle generated from the same constants as
    `textrank_batch` — per-doc window pairs (the cooccur LATERAL
    pattern), undirected expansion, and ``iterations`` weighted
    fixed-point rounds. Every CTE is AS MATERIALIZED (CLAUDE.md:
    DuckDB inlines plain CTEs referenced twice per round →
    exponential rescans)."""
    num, den = damping
    offs = []
    for d in range(1, window + 1):
        offs.append(f"""
  SELECT {id_col} AS doc_id,
         CASE WHEN tk[i] <= tk[i+{d}] THEN tk[i] ELSE tk[i+{d}] END AS t1,
         CASE WHEN tk[i] <= tk[i+{d}] THEN tk[i+{d}] ELSE tk[i] END AS t2
  FROM tk, LATERAL (SELECT unnest(range(1, len(tk) - {d - 1}))) AS g(i)""")
    parts = [f"""WITH tk AS MATERIALIZED (
  SELECT {id_col}, regexp_extract_all(lower({text_col}),
                                      '[\\p{{L}}\\p{{N}}_]+') AS tk
  FROM {table}),
pr AS MATERIALIZED ({" UNION ALL ".join(offs)}),
cnt AS MATERIALIZED (
  SELECT doc_id, t1, t2, CAST(COUNT(*) AS BIGINT) AS w
  FROM pr WHERE t1 <> t2 GROUP BY doc_id, t1, t2),
edges AS MATERIALIZED (
  SELECT doc_id, t1 AS src, t2 AS dst, w FROM cnt
  UNION ALL SELECT doc_id, t2, t1, w FROM cnt),
wo AS MATERIALIZED (
  SELECT doc_id, src, CAST(SUM(w) AS BIGINT) AS wout
  FROM edges GROUP BY doc_id, src),
c AS MATERIALIZED (
  SELECT doc_id, COUNT(*) AS n, {mass} // COUNT(*) AS r0,
         (({mass} // COUNT(*)) * {den - num}) // {den} AS base
  FROM wo GROUP BY doc_id),
r0 AS MATERIALIZED (
  SELECT wo.doc_id, wo.src AS node, c.r0 AS rank_units
  FROM wo JOIN c ON c.doc_id = wo.doc_id)"""]
    for t in range(1, iterations + 1):
        parts.append(f""",
r{t} AS MATERIALIZED (
  SELECT nd.doc_id, nd.node,
         c.base + ({num} * COALESCE(s.s, 0)) // {den} AS rank_units
  FROM (SELECT doc_id, node FROM r0) nd
  JOIN c ON c.doc_id = nd.doc_id
  LEFT JOIN (
    SELECT e.doc_id, e.dst AS node,
           CAST(SUM((r.rank_units * e.w) // ww.wout) AS BIGINT) AS s
    FROM edges e
    JOIN wo ww ON ww.doc_id = e.doc_id AND ww.src = e.src
    JOIN r{t - 1} r ON r.doc_id = e.doc_id AND r.node = e.src
    GROUP BY e.doc_id, e.dst
  ) s ON s.doc_id = nd.doc_id AND s.node = nd.node)""")
    parts.append(f"""
SELECT doc_id, node AS token, rank_units FROM (
  SELECT doc_id, node, rank_units,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY rank_units DESC, node) AS rk
  FROM r{iterations}) WHERE rk <= {k}""")
    return "".join(parts)
