"""Vocabulary growth (Heaps'-law) curve over a document corpus.

For each document-count threshold k: vocab(k) = number of distinct
tokens whose FIRST document id is below k, total_tokens(k) = token
occurrences in documents with id < k — the (N, V) points whose
log-log slope is Heaps' β. Both are integers, hash-exact vs one SQL
GROUP BY with conditional counts.

Shape: one streaming pass emits per-batch pre-combined rows
(token, first_doc partial-min, per-threshold count partials) → ONE
token groupby with Min + Sum aggregates → the final reduction over
the vocab-bounded token table happens on the driver (the tfidf
bounded-vocab pattern; token cardinality, not corpus cardinality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import tokenize

__all__ = ["vocab_growth"]


def vocab_growth(ds, thresholds=(32, 64, 128, 256, 500),
                 text_col: str = "text", id_col: str = "doc_id"):
    """Dataset (k, vocab, total_tokens), one row per threshold."""
    import ray.data
    from ray.data.aggregate import Min, Sum

    ths = sorted(int(t) for t in thresholds)
    cols = [f"c{j}" for j in range(len(ths))]

    def partial(b: pa.Table) -> pa.Table:
        flat, parent = tokenize(b.column(text_col))
        if len(flat) == 0:
            base = {"token": pa.array([], pa.string()),
                    "first_doc": pa.array([], pa.int64())}
            base.update({c: pa.array([], pa.int64()) for c in cols})
            return pa.table(base)
        ids = b.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc = ids[parent]
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nv = len(enc.dictionary)
        md = np.full(nv, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(md, codes, doc)
        out = {"token": enc.dictionary, "first_doc": pa.array(md)}
        for j, k in enumerate(ths):
            out[cols[j]] = pa.array(np.bincount(
                codes[doc < k], minlength=nv).astype(np.int64))
        return pa.table(out)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Min("first_doc"),
                                    *[Sum(c) for c in cols])

    vocab = np.zeros(len(ths), np.int64)
    total = np.zeros(len(ths), np.int64)
    for b in agg.iter_batches(batch_format="pyarrow",
                              batch_size=None):
        if b.num_rows == 0 or "min(first_doc)" not in b.schema.names:
            continue
        md = b.column("min(first_doc)").to_numpy(zero_copy_only=False)
        for j, k in enumerate(ths):
            vocab[j] += int((md < k).sum())
            total[j] += int(b.column(f"sum({cols[j]})")
                            .to_numpy(zero_copy_only=False).sum())
    return ray.data.from_arrow(pa.table({
        "k": pa.array(ths, pa.int64()),
        "vocab": pa.array(vocab),
        "total_tokens": pa.array(total)}))
