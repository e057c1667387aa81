"""Document chunking: split each document into overlapping fixed-size
token windows (the retrieval/embedding-pipeline unit — chunk, embed,
index; also the long-doc preprocessing step before context-bounded
model scoring). No reference counterpart (SURVEY.md §2.7).

Semantics (mirrored op-for-op by the SQL oracle): tokens are maximal
``[\\p{L}\\p{N}_]+`` runs in ORIGINAL case (hashing.TOKEN_MATCH); a
document with n tokens yields windows of ``chunk_tokens`` tokens
starting every ``chunk_tokens - overlap`` tokens, the last window
clipped to the document end; a document yields at least one window
(possibly shorter than ``chunk_tokens``; tokenless docs yield one
empty chunk). The chunk text is the single-space join of its window —
a canonical detokenization identical to SQL
``array_to_string(list_slice(tokens, a, b), ' ')``.

Scale shape: one pure ``map_batches`` pass — tokenization is Arrow
RE2, window starts come from a repeat/cumsum index build (no per-doc
Python), the window gather is one ``take`` + ``ListArray`` +
``binary_join``. Each doc's chunks are emitted in its own batch, so
the pass shuffles nothing and parallelism is the read's."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import TOKEN_MATCH

__all__ = ["chunk_documents", "chunk_batch"]


def chunk_batch(batch: pa.Table, text_col: str = "text",
                key_col: str = "doc_id", chunk_tokens: int = 128,
                overlap: int = 16) -> pa.Table:
    """(key, chunk_idx, tok_start, tok_end, n_chunk_tokens, chunk_text)
    rows — one per window; see module docstring for the contract."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    s = pc.cast(batch.column(text_col), pa.string())
    # Arrow has no extract_all: split on the complement (non-token
    # runs) and drop empties — identical token sequence to
    # regexp_extract_all(text, TOKEN_MATCH)
    lists = pc.split_pattern_regex(s, pattern=r"[^\p{L}\p{N}_]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = lens > 0
    flat = flat.filter(pa.array(keep))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = parent[keep]

    n_rows = batch.num_rows
    n_tok = np.bincount(parent, minlength=n_rows).astype(np.int64)
    doc_off = np.concatenate([np.zeros(1, np.int64), np.cumsum(n_tok)])

    # windows per doc: ceil((n - overlap) / stride), at least 1
    n_win = np.maximum((n_tok - overlap + stride - 1) // stride, 1)
    total = int(n_win.sum())
    doc_of_win = np.repeat(np.arange(n_rows, dtype=np.int64), n_win)
    first_win = np.concatenate([np.zeros(1, np.int64),
                                np.cumsum(n_win)])[:-1]
    c_idx = np.arange(total, dtype=np.int64) - first_win[doc_of_win]
    tok_start = c_idx * stride
    tok_end = np.minimum(tok_start + chunk_tokens, n_tok[doc_of_win])
    win_len = np.maximum(tok_end - tok_start, 0)

    # gather indices: for each window, its token positions in `flat`
    win_off = np.concatenate([np.zeros(1, np.int64), np.cumsum(win_len)])
    gather = np.arange(int(win_off[-1]), dtype=np.int64)
    gather -= np.repeat(win_off[:-1], win_len)          # 0..len-1 per win
    gather += np.repeat(doc_off[doc_of_win] + tok_start, win_len)
    toks = flat.take(pa.array(gather))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    wl = pa.ListArray.from_arrays(pa.array(win_off.astype(np.int32)),
                                  toks)
    text = pc.binary_join(wl, " ")

    keys = batch.column(key_col).take(pa.array(doc_of_win))
    return pa.table({
        key_col: keys,
        "chunk_idx": pa.array(c_idx),
        "tok_start": pa.array(tok_start),
        "tok_end": pa.array(tok_end),
        "n_chunk_tokens": pa.array(win_len),
        "chunk_text": text,
    })


def chunk_documents(ds, text_col: str = "text", key_col: str = "doc_id",
                    chunk_tokens: int = 128, overlap: int = 16):
    return ds.map_batches(
        lambda b: chunk_batch(b, text_col=text_col, key_col=key_col,
                              chunk_tokens=chunk_tokens, overlap=overlap),
        batch_format="pyarrow")
