"""Windowed token co-occurrence counts + PMI — collocation mining,
the preprocessing pass of word2vec/GloVe-style training and a
standard corpus-analytics artifact (Church & Hanks 1990 for PMI).

Shape: one streaming pass tokenizes each doc (hashing.tokenize, the
repo's RE2 word pattern) and emits PRE-COMBINED (t1, t2, cnt)
partials per batch — for window W each token pairs with its next ≤W
successors inside the same doc, the pair is ordered lexicographically
(unordered co-occurrence), and `pc.value_counts` collapses the batch
before anything enters the shuffle. One hash groupby then produces
global pair counts; marginals reuse the pair table (both sides
stacked) so the corpus is never re-read.

Exactness: counts are pure int64 — the SQL oracle rebuilds the same
windows with the LATERAL range + list-slice pattern (bpe n-gram
trick, CLAUDE.md) and hash-matches. PMI for the top-k pairs is
computed per row with math.log over exact-int ratios (glibc libm ==
DuckDB ln(), verified for bm25) — k is small, so the scalar loop is
bounded and never touches the corpus-scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import tokenize

__all__ = ["window_pairs_batch", "cooccur_counts", "cooccur_pmi"]

_SEP = "\x1f"  # never appears in word-pattern tokens


def window_pairs_batch(batch: pa.Table, window: int = 2,
                       text_col: str = "text") -> pa.Table:
    """Per-batch combined (t1, t2, cnt) window co-occurrence partials:
    for every token position i and distance d in 1..window with i and
    i+d in the SAME doc, the unordered (lexicographically sorted)
    token pair counts once. Fully vectorized; self-pairs (x,x) from
    repeated tokens are real collocations and kept."""
    flat, parent = tokenize(batch.column(text_col))
    n = len(flat)
    parts = []
    for d in range(1, window + 1):
        if n <= d:
            break
        same = parent[:-d] == parent[d:]
        if not same.any():
            continue
        idx = np.nonzero(same)[0]
        left = flat.take(pa.array(idx, type=pa.int64()))
        right = flat.take(pa.array(idx + d, type=pa.int64()))
        lo = pc.min_element_wise(left, right)
        hi = pc.max_element_wise(left, right)
        parts.append(pc.binary_join_element_wise(lo, pa.scalar(_SEP),
                                                 hi, ""))
    if not parts:
        return pa.table({"t1": pa.array([], type=pa.string()),
                         "t2": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    joined = pa.concat_arrays([p.combine_chunks()
                               if isinstance(p, pa.ChunkedArray) else p
                               for p in parts])
    vc = pc.value_counts(joined)
    pairs = vc.field("values")
    split = pc.split_pattern(pairs, pattern=_SEP, max_splits=1)
    return pa.table({
        "t1": pc.list_element(split, 0),
        "t2": pc.list_element(split, 1),
        "cnt": pc.cast(vc.field("counts"), pa.int64())})


def cooccur_counts(ds, window: int = 2, text_col: str = "text"):
    """Global (t1, t2, cnt) co-occurrence table: per-batch combined
    partials → one hash groupby sum. The shuffle carries only the
    distinct-pair partials of each batch, never per-position rows."""
    parts = ds.map_batches(
        lambda b: window_pairs_batch(b, window=window,
                                     text_col=text_col),
        batch_format="pyarrow")
    g = parts.groupby(["t1", "t2"]).sum("cnt")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"t1": b.column("t1"), "t2": b.column("t2"),
                         "cnt": pc.cast(b.column("sum(cnt)"),
                                        pa.int64())})

    return g.map_batches(rename, batch_format="pyarrow")


def cooccur_pmi(ds, window: int = 2, k: int = 100,
                text_col: str = "text"):
    """Top-k collocations by count with EXACT PMI:
    pmi(a,b) = ln(c_ab · T / (m_a · m_b)), where T is the total
    windowed pair count and m_x the pair-marginal of token x
    (Σ over pairs containing x, both slots, so Σm = 2T; a standard
    symmetric-margin PMI convention, stated here because conventions
    vary). Pair counts and marginals are distributed; the ln runs
    only over the k result rows (math.log — bit-identical to DuckDB
    ln(); numpy's SIMD log is banned from gated float paths)."""
    import math

    from ray.data.aggregate import Sum

    counts = cooccur_counts(ds, window=window,
                            text_col=text_col).materialize()
    top = counts.sort(["cnt", "t1", "t2"],
                      descending=[True, False, False]) \
        .limit(k).materialize()
    total = int(counts.aggregate(Sum("cnt"))["sum(cnt)"] or 0)

    # distributed pair-marginals (both slots stacked inside the map —
    # the driver never sees the vocabulary, only the ≤2k tokens the
    # top-k pairs actually reference)
    def stack(b: pa.Table) -> pa.Table:
        c = b.column("cnt")
        return pa.table({
            "tok": pa.concat_arrays([
                b.column("t1").combine_chunks(),
                b.column("t2").combine_chunks()]),
            "c": pa.concat_arrays([c.combine_chunks()] * 2)})

    marg_ds = counts.map_batches(stack, batch_format="pyarrow") \
        .groupby("tok").sum("c")
    need = set()
    for b in top.iter_batches(batch_format="pyarrow"):
        if "t1" in b.schema.names:
            need.update(b.column("t1").to_pylist())
            need.update(b.column("t2").to_pylist())
    need_arr = pa.array(sorted(need), type=pa.string())

    def only_needed(b: pa.Table) -> pa.Table:
        if "tok" not in b.schema.names or b.num_rows == 0:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "m": pa.array([], type=pa.int64())})
        keep = pc.is_in(b.column("tok"), value_set=need_arr)
        f = b.filter(keep)
        return pa.table({"tok": f.column("tok"),
                         "m": pc.cast(f.column("sum(c)"), pa.int64())})

    marg: dict[str, int] = {
        r["tok"]: r["m"]
        for r in marg_ds.map_batches(
            only_needed, batch_format="pyarrow").take_all()}

    def attach(b: pa.Table) -> pa.Table:
        t1 = b.column("t1").to_pylist()
        t2 = b.column("t2").to_pylist()
        c = b.column("cnt").to_pylist()
        # double products in fixed order (NOT exact-int python
        # products: the SQL mirror rounds after each CAST/multiply,
        # so we must too — identical beyond 2^53)
        pmi = [math.log((float(cnt) * float(total))
                        / (float(marg[a]) * float(marg[bb])))
               for a, bb, cnt in zip(t1, t2, c)]
        return pa.table({"t1": b.column("t1"), "t2": b.column("t2"),
                         "cnt": pa.array(c, type=pa.int64()),
                         "pmi": pa.array(pmi, type=pa.float64())})

    return top.map_batches(attach, batch_format="pyarrow")


def _sum_by(tokens: pa.Array, weights: np.ndarray):
    """(distinct tokens, summed weights) — one dictionary-encode +
    bincount, no Python loop over rows."""
    enc = pc.dictionary_encode(tokens)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    sums = np.bincount(codes, weights=weights,
                       minlength=len(enc.dictionary)).astype(np.int64)
    return enc.dictionary.to_pylist(), sums
