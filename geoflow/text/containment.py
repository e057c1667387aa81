"""Token n-gram containment: asymmetric near-duplicate scoring.

Jaccard (text/dedup.py minhash family) misses SUBSET duplication — a
short quote fully contained in a long article scores near 0 Jaccard
but containment(quote -> article) = 1.0. This operator computes, for
every document pair sharing >= min_inter distinct token n-grams:

    inter      = |G_a ∩ G_b|        (distinct shared grams)
    cont_a     = inter / |G_a|      (how much of a is inside b)
    cont_b     = inter / |G_b|

(Broder 1997's containment measure — the resemblance paper defines
both.) Counts are integers and each containment is ONE float division
of exact ints, so the `shingle_containment` driver gate hash-matches
the SQL set-join oracle; the gram polynomial (base 2^20, k=3) is
INJECTIVE for planted sub-2^20 token ids, so hashed distinct counts
equal triple distinct counts exactly.

Scale shape: one map_batches pass emits per-doc DISTINCT gram rows
(in-block distinct — a doc lives wholly in one block, the repo-wide
read_parquet convention), groupby(gram) pair emission with a hot-gram
bucket cap (same skew guard + caveat as winnow.fingerprint_matches),
one pair groupby-sum; per-doc gram totals are collected to the driver
under ``max_broadcast_docs`` and attached in a final vectorized map
(join-mode attachment is the documented escape hatch past the bound).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geoflow.text.hashing import hash64, tokenize
from geoflow.text.winnow import GRAM_BASE, _gram_hashes


def doc_gram_rows(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3,
                  mode: str = "token") -> pa.Table:
    """(doc_id, gram) distinct token-k-gram hashes per document."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    flat, parent = tokenize(batch.column(text_col), lower=False)
    if mode == "planted":
        vals = pc.cast(pc.utf8_slice_codeunits(flat, 1),
                       pa.int64()).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
    else:
        vals = hash64(flat)
    h, doc = _gram_hashes(vals, parent, k, GRAM_BASE)
    if len(h) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "gram": pa.array([], pa.int64())})
    order = np.lexsort((h, doc))
    hs, ds_ = h[order], doc[order]
    first = np.r_[True, (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])]
    return pa.table({"doc_id": pa.array(ids[ds_[first]]),
                     "gram": pa.array(hs[first].view(np.int64))})


def containment_pairs(ds, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      min_inter: int = 1, mode: str = "token",
                      max_bucket: int = 1024,
                      max_broadcast_docs: int = 50_000_000):
    """(a, b, inter, n_a, n_b, cont_a, cont_b) for unordered doc
    pairs sharing >= min_inter distinct k-grams."""
    import ray
    from ray.data.aggregate import Sum

    grams = ds.map_batches(
        lambda b: doc_gram_rows(b, text_col, id_col, k, mode),
        batch_format="pyarrow").materialize()  # two consumers

    # per-doc distinct gram totals -> driver (bounded) -> broadcast
    tot: dict[int, int] = {}
    for blk in grams.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
        if blk.num_rows == 0 or "doc_id" not in blk.schema.names:
            continue
        d = blk.column("doc_id").to_numpy(zero_copy_only=False)
        u, c = np.unique(d, return_counts=True)
        for uu, cc in zip(u.tolist(), c.tolist()):
            tot[uu] = tot.get(uu, 0) + cc
        if len(tot) > max_broadcast_docs:
            raise ValueError("doc count exceeds max_broadcast_docs; "
                             "attach totals via a key join instead")
    keys = np.array(sorted(tot), dtype=np.int64)
    cnts = np.array([tot[int(x)] for x in keys], dtype=np.int64)
    state = ray.put((keys, cnts))

    def pairs(g: pa.Table) -> pa.Table:
        d = np.unique(g.column("doc_id").to_numpy(zero_copy_only=False))
        if len(d) < 2 or len(d) > max_bucket:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(d), k=1)
        return pa.table({"a": pa.array(d[ii]), "b": pa.array(d[jj]),
                         "n": pa.array(np.ones(len(ii), np.int64))})

    agg = grams.groupby("gram").map_groups(pairs,
                                           batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Sum("n"))

    def fin(bt: pa.Table, _s=state) -> pa.Table:
        empty = pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "cont_a": pa.array([], pa.float64()),
            "cont_b": pa.array([], pa.float64())})
        if "a" not in bt.schema.names or bt.num_rows == 0:
            return empty
        keys_, cnts_ = ray.get(_s)
        a = bt.column("a").to_numpy(zero_copy_only=False)
        b = bt.column("b").to_numpy(zero_copy_only=False)
        inter = pc.cast(bt.column("sum(n)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = inter >= min_inter
        a, b, inter = a[keep], b[keep], inter[keep]
        na = cnts_[np.searchsorted(keys_, a)]
        nb = cnts_[np.searchsorted(keys_, b)]
        return pa.table({
            "a": pa.array(a), "b": pa.array(b),
            "inter": pa.array(inter),
            "n_a": pa.array(na), "n_b": pa.array(nb),
            "cont_a": pa.array(inter.astype(np.float64) / na),
            "cont_b": pa.array(inter.astype(np.float64) / nb)})

    return agg.map_batches(fin, batch_format="pyarrow")
