"""Content-defined chunking (CDC) — the rolling-hash boundary pass of
LBFS/rsync-style dedup (Muthitacharoen et al. 2001): chunk boundaries
are placed where a sliding window hash of the content satisfies a
modulus condition, so INSERTIONS shift boundaries only locally and
duplicate spans keep chunking identically — the property exact
line/doc dedup lacks.

Boundary rule: after codepoint i (window fully inside the doc) iff
``mix64(poly) % mod == 0`` where ``poly = Σ_{p=0..w-1} c[i-p]·B^p``
(B=257, w=4) — the polynomial is the same w-gram form as winnowing
(text/winnow.py); the splitmix64 avalanche decorrelates the modulus
from low codepoint bits. The end of each document is always a
boundary. Expected chunk length ≈ ``mod`` codepoints.

Exactness: the whole chain is integer (codepoints < 2^21, poly <
2^45), and mix64 has a verified bit-exact SQL twin
(_sql_mix64_chain, CLAUDE.md) — so (doc_id, chunk_idx, start,
chunk_len, chunk_head) hash-match a LAG-window DuckDB oracle.

Shape: ONE stateless map_batches pass — the batch kernel decodes the
whole batch to a flat UTF-32 array, computes every window hash with
w-1 shifted vector adds, and assembles chunk rows with
searchsorted/unique index math; chunk heads are gathered as an
(n_chunks × head) codepoint matrix viewed as numpy 'U' strings. No
Python loop over rows, chunks, or docs.

Caveat: chunk_head views zero-padded UTF-32 rows as U-strings, so a
NUL codepoint inside the first ``head`` chars would truncate the head
(documents never legitimately contain NUL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import mix64

__all__ = ["cdc_chunk_batch", "cdc_chunks"]

_EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                   "chunk_idx": pa.array([], pa.int64()),
                   "start": pa.array([], pa.int64()),
                   "chunk_len": pa.array([], pa.int64()),
                   "chunk_head": pa.array([], pa.string())})


def cdc_chunk_batch(batch: pa.Table, *, base: int = 257,
                    window: int = 4, mod: int = 64, head: int = 32,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """(doc_id, chunk_idx, start, chunk_len, chunk_head) — 1-based
    chunk_idx and start (codepoint position, SQL substr convention).
    Empty documents emit no rows."""
    texts = batch.column(text_col).to_pylist()
    lens = pc.utf8_length(batch.column(text_col)).to_numpy(
        zero_copy_only=False).astype(np.int64)
    joined = "".join(t or "" for t in texts)
    n = len(joined)
    if n == 0:
        return _EMPTY
    u = np.frombuffer(joined.encode("utf-32-le"),
                      dtype=np.uint32).astype(np.int64)
    ends = np.cumsum(lens)            # exclusive doc ends
    starts = ends - lens
    # ---- rolling polynomial over every global position
    h = u.copy()
    for p in range(1, window):
        h[p:] += u[:-p] * (base ** p)
    pos = np.arange(n, dtype=np.int64)
    doc_of = np.searchsorted(ends, pos, side="right")
    valid = (pos - starts[doc_of]) >= window - 1
    cand = pos[valid & (mix64(h.astype(np.uint64)) % mod == 0)]
    # ---- chunk ends = candidates ∪ last position of each doc
    ends_pos = np.unique(np.concatenate([cand, ends[lens > 0] - 1]))
    edoc = doc_of[ends_pos]
    prev = np.concatenate([[-1], ends_pos[:-1]])
    prev_doc = np.concatenate([[-1], edoc[:-1]])
    cstart = np.where(prev_doc == edoc, prev + 1, starts[edoc])
    clen = ends_pos - cstart + 1
    udoc, first, cnt = np.unique(edoc, return_index=True,
                                 return_counts=True)
    chunk_idx = np.arange(len(edoc)) - np.repeat(first, cnt) + 1
    # ---- heads: (n_chunks × head) codepoint gather -> U strings
    gi = np.minimum(cstart[:, None] + np.arange(head)[None, :], n - 1)
    gm = np.arange(head)[None, :] < np.minimum(clen, head)[:, None]
    mat = np.where(gm, u[gi], 0).astype("<u4")
    heads = np.ascontiguousarray(mat).view(f"<U{head}").ravel()
    doc_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(doc_ids[edoc], pa.int64()),
        "chunk_idx": pa.array(chunk_idx, pa.int64()),
        "start": pa.array(cstart - starts[edoc] + 1, pa.int64()),
        "chunk_len": pa.array(clen, pa.int64()),
        "chunk_head": pa.array(heads, pa.string())})


def cdc_chunks(ds, *, base: int = 257, window: int = 4, mod: int = 64,
               head: int = 32, id_col: str = "doc_id",
               text_col: str = "text"):
    """Dataset API: content-defined chunks in one stateless map pass."""
    def fn(b: pa.Table) -> pa.Table:
        return cdc_chunk_batch(b, base=base, window=window, mod=mod,
                               head=head, id_col=id_col,
                               text_col=text_col)
    return ds.map_batches(fn, batch_format="pyarrow")
