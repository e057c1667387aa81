"""Keyword-in-context (KWIC) concordance — the classic corpus-
linguistics view: every occurrence of a query term with its w tokens
of left and right context (Luhn 1960's KWIC index).

Exactness: contexts are token-joined strings from the same RE2
tokenizer both engines run; the SQL oracle rebuilds them with the
LATERAL position + list-slice pattern (bpe n-gram trick, CLAUDE.md)
and array_to_string. Rows are (doc_id, pos, term, left_ctx,
right_ctx) with pos the 1-based token position, so the set is
hash-exact.

Shape: one stateless map_batches pass; occurrence positions come from
one vectorized is_in over the flat token stream, and both contexts
are assembled with a (n_hits × w) gather matrix + row-wise join —
no per-hit Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import tokenize

__all__ = ["kwic_batch", "kwic"]

_EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                   "pos": pa.array([], pa.int64()),
                   "term": pa.array([], pa.string()),
                   "left_ctx": pa.array([], pa.string()),
                   "right_ctx": pa.array([], pa.string())})


def _join_ctx(flat_np: np.ndarray, gather: np.ndarray,
              valid: np.ndarray) -> np.ndarray:
    """Row-wise space-join of gathered tokens where valid (U dtype)."""
    toks = np.where(valid, flat_np[np.minimum(gather,
                                              len(flat_np) - 1)], "")
    if toks.shape[1] == 0:
        return np.full(len(toks), "", dtype="U1")
    out = toks[:, 0]
    for j in range(1, toks.shape[1]):
        sep = np.where((out != "") & (toks[:, j] != ""), " ", "")
        out = np.char.add(np.char.add(out, sep), toks[:, j])
    return out


def kwic_batch(batch: pa.Table, terms, window: int = 3,
               id_col: str = "doc_id",
               text_col: str = "text") -> pa.Table:
    """All occurrences of ``terms`` with ``window`` tokens of context
    on each side (contexts clipped at document edges)."""
    flat, parent = tokenize(batch.column(text_col))
    if len(flat) == 0:
        return _EMPTY
    hits = pc.is_in(flat, value_set=pa.array(sorted(terms),
                                             pa.string())) \
        .to_numpy(zero_copy_only=False)
    if not hits.any():
        return _EMPTY
    idx = np.nonzero(hits)[0]
    flat_np = flat.to_numpy(zero_copy_only=False).astype("U")
    n = len(flat_np)
    pdoc = parent[idx]
    # doc start/end offsets per hit
    starts = np.searchsorted(parent, pdoc, side="left")
    ends = np.searchsorted(parent, pdoc, side="right")
    w = np.arange(1, window + 1, dtype=np.int64)
    lg = idx[:, None] - w[None, ::-1]               # left, in order
    lv = lg >= starts[:, None]
    rg = idx[:, None] + w[None, :]
    rv = rg < ends[:, None]
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    # position within the doc (1-based)
    pos = idx - starts + 1
    return pa.table({
        "doc_id": pa.array(ids[pdoc], pa.int64()),
        "pos": pa.array(pos, pa.int64()),
        "term": pa.array(flat_np[idx], pa.string()),
        "left_ctx": pa.array(_join_ctx(flat_np, lg, lv), pa.string()),
        "right_ctx": pa.array(_join_ctx(flat_np, rg, rv),
                              pa.string())})


def kwic(ds, terms, window: int = 3, id_col: str = "doc_id",
         text_col: str = "text"):
    """Dataset API: concordance rows in one stateless map pass."""
    terms = tuple(sorted(terms))

    def fn(b: pa.Table) -> pa.Table:
        return kwic_batch(b, terms, window=window, id_col=id_col,
                          text_col=text_col)

    return ds.map_batches(fn, batch_format="pyarrow")
