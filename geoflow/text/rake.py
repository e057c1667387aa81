"""RAKE — Rapid Automatic Keyword Extraction (Rose et al. 2010).

Candidate phrases are maximal runs of consecutive non-stopword tokens
inside a document's token stream (this implementation splits at
stopwords; the tokenizer has already dropped punctuation — the
common token-stream simplification, stated so the SQL oracle mirrors
it exactly). Word scores are the paper's two integers:

    freq(w) = occurrences of w inside candidate phrases
    deg(w)  = Σ over those occurrences of the containing phrase length

(score(w) = deg/freq and phrase score = Σ score(w) are float ratios
left to the client — floats never hash cross-engine.)

Shape: ONE stateless map_batches pass per output; islands are found
with a vectorized run-start cumsum over the (token, parent) stream,
phrases assembled zero-copy via ListArray offsets + binary_join —
no Python loop. Word partials pre-combine per batch before the one
small groupby-sum (token-cardinality rows only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import _STOPWORDS_EN
from .hashing import tokenize

__all__ = ["RAKE_STOPWORDS", "rake_candidates", "rake_word_scores"]

RAKE_STOPWORDS = tuple(sorted(_STOPWORDS_EN))
_STOP_ARR = pa.array(RAKE_STOPWORDS, type=pa.string())


def _islands(batch: pa.Table, text_col: str):
    """flat non-stop tokens + (island id per kept token, island doc
    row, island length, island start position) — all vectorized."""
    flat, parent = tokenize(batch.column(text_col))
    if len(flat) == 0:
        return None
    stop = pc.is_in(flat, value_set=_STOP_ARR).to_numpy(
        zero_copy_only=False)
    keep = ~stop
    if not keep.any():
        return None
    pos = np.arange(len(flat), dtype=np.int64)
    kpos, kpar = pos[keep], parent[keep]
    flat_k = flat.take(pa.array(kpos, type=pa.int64()))
    # run start: first kept token, a gap in positions, or a new doc
    start = np.empty(len(kpos), bool)
    start[0] = True
    start[1:] = (kpos[1:] != kpos[:-1] + 1) | (kpar[1:] != kpar[:-1])
    gid = np.cumsum(start) - 1
    first = np.flatnonzero(start)
    glen = np.diff(np.r_[first, len(kpos)])
    return flat_k, gid, kpar[first], glen, kpos[first], first


def rake_candidates(ds, *, id_col: str = "doc_id",
                    text_col: str = "text"):
    """(doc_id, phrase_idx, phrase, n_words) — candidate phrases in
    document order, phrase_idx 1-based per doc."""
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "phrase_idx": pa.array([], pa.int64()),
                      "phrase": pa.array([], pa.string()),
                      "n_words": pa.array([], pa.int64())})

    def fn(b: pa.Table) -> pa.Table:
        isl = _islands(b, text_col)
        if isl is None:
            return empty
        flat_k, gid, gdoc, glen, _gpos, first = isl
        offsets = np.r_[first, len(gid)].astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets),
                                         flat_k.combine_chunks()
                                         if isinstance(flat_k,
                                                       pa.ChunkedArray)
                                         else flat_k)
        phrases = pc.binary_join(lists, " ")
        udoc, fidx, cnt = np.unique(gdoc, return_index=True,
                                    return_counts=True)
        pidx = np.arange(len(gdoc)) - np.repeat(fidx, cnt) + 1
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[gdoc], pa.int64()),
                         "phrase_idx": pa.array(pidx, pa.int64()),
                         "phrase": phrases,
                         "n_words": pa.array(glen, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def rake_word_scores(ds, *, text_col: str = "text"):
    """(token, freq, deg) global RAKE word scores."""
    from ray.data.aggregate import Sum

    empty = pa.table({"token": pa.array([], pa.string()),
                      "freq": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        isl = _islands(b, text_col)
        if isl is None:
            return empty
        flat_k, gid, _gdoc, glen, _gpos, _first = isl
        L = glen[gid]                      # phrase length per token
        enc = pc.dictionary_encode(flat_k)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        freq = np.bincount(codes, minlength=len(enc.dictionary))
        deg = np.bincount(codes, weights=L.astype(np.float64),
                          minlength=len(enc.dictionary))
        return pa.table({"token": enc.dictionary,
                         "freq": pa.array(freq.astype(np.int64)),
                         "deg": pa.array(deg.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("freq"), Sum("deg"))

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "token" not in b.schema.names:
            return empty
        return pa.table({"token": b.column("token"),
                         "freq": b.column("sum(freq)"),
                         "deg": b.column("sum(deg)")})

    return agg.map_batches(fin, batch_format="pyarrow")
