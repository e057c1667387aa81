"""N-gram novelty scoring — the memorization/contamination-adjacent
curation signal: for each document, how many of its token 3-grams
first appeared in an EARLIER document (ids as the corpus order).

    n_grams        = 3-gram occurrences in the doc
    n_seen_before  = occurrences whose gram's global min(doc_id) is
                     strictly below this doc's id

A doc full of previously-seen grams is boilerplate/near-dup; a doc of
fresh grams is novel. Both columns are integers → hash-exact.

Shape: pass 1 computes gram → min(doc_id) with per-batch pre-combined
partials and ONE groupby-min. Pass 2 re-emits (doc_id, gram)
occurrence counts and hash-joins them against the first-doc table —
the aggregate→join seam is sanitized with drop_schemaless_blocks
(CLAUDE.md: hash-aggregate empty partitions emit 0-column blocks that
poison Dataset.join). A final groupby-sum per doc finishes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import tokenize
from ..join.semijoin import cluster_join_partitions, drop_schemaless_blocks

__all__ = ["ngram_novelty"]

_SEP = "\x1f"


def _gram_rows(batch: pa.Table, id_col: str, text_col: str, n: int):
    """(doc_id, gram, cnt) pre-combined per batch."""
    flat, parent = tokenize(batch.column(text_col))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "gram": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if len(flat) < n:
        return empty
    same = parent[:- (n - 1)] == parent[n - 1:]
    if not same.any():
        return empty
    idx = np.nonzero(same)[0]
    parts = [flat.take(pa.array(idx + j, pa.int64()))
             for j in range(n)]
    args = []
    for j, p in enumerate(parts):
        args.append(p)
        if j < n - 1:
            args.append(pa.scalar(_SEP))
    grams = pc.binary_join_element_wise(*args, "")
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    doc = ids[parent[idx]]
    # pre-combine (doc, gram) inside the batch
    enc = pc.dictionary_encode(grams)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nv = len(enc.dictionary)
    packed = doc * nv + codes
    uk, c = np.unique(packed, return_counts=True)
    return pa.table({
        "doc_id": pa.array(uk // nv),
        "gram": enc.dictionary.take(pa.array(uk % nv, pa.int64())),
        "cnt": pa.array(c.astype(np.int64))})


def ngram_novelty(ds, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text"):
    """(doc_id, n_grams, n_seen_before) per document with ≥n tokens."""
    from ray.data.aggregate import Min, Sum

    grams = ds.map_batches(
        lambda b: _gram_rows(b, id_col, text_col, n),
        batch_format="pyarrow").materialize()

    first = grams.groupby("gram").aggregate(Min("doc_id"))
    first, _keep = drop_schemaless_blocks(first)
    if first is None:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_grams": pa.array([], pa.int64()),
            "n_seen_before": pa.array([], pa.int64())}))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"gram": b.column("gram"),
                         "first_doc": b.column("min(doc_id)")})

    first = first.map_batches(rename, batch_format="pyarrow")
    joined = grams.join(first, join_type="inner",
                        num_partitions=cluster_join_partitions(),
                        on=("gram",))

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "first_doc" not in b.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        c = b.column("cnt").to_numpy(zero_copy_only=False)
        fd = b.column("first_doc").to_numpy(zero_copy_only=False)
        seen = np.where(fd < doc, c, 0)
        ud, inv = np.unique(doc, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(ud),
            "g": pa.array(np.bincount(
                inv, weights=c.astype(np.float64)).astype(np.int64)),
            "s": pa.array(np.bincount(
                inv, weights=seen.astype(np.float64))
                .astype(np.int64))})

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("g"), Sum("s"))

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "n_seen_before": pa.array([], pa.int64())})
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_grams": b.column("sum(g)"),
                         "n_seen_before": b.column("sum(s)")})

    out = agg.map_batches(fin, batch_format="pyarrow")
    out._novelty_keepalive = _keep   # hold block refs (CLAUDE.md)
    return out
