"""Character n-gram language profiles (the Cavnar–Trenkle 1994
n-gram-profile shape behind classic language ID): per-language
counts of every character trigram, then the top-k profile under the
deterministic (count DESC, gram ASC) order.

Kernel: the repo-wide UTF-32 flat-array convention (cdc.py /
pretoken.py) — one join of the batch's texts, windows of 3 read as
three shifted views, cross-document windows masked by parent
boundaries, gram identity packed into int64 (3 × 21-bit codepoints —
every Unicode scalar < 2^21). Per-batch np.unique pre-combines
before the (lang, gram) groupby-sum; top-k runs per-language in
map_groups over the gram-bounded aggregate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["char_trigram_profiles"]

_SHIFT = np.int64(1 << 21)


def _pack3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    return (a.astype(np.int64) * _SHIFT + b.astype(np.int64)) \
        * _SHIFT + c.astype(np.int64)


def _unpack3(g: np.ndarray) -> np.ndarray:
    """Packed int64 grams back to a U3 numpy array."""
    m = np.empty((len(g), 3), np.uint32)
    m[:, 2] = (g % (1 << 21)).astype(np.uint32)
    m[:, 1] = ((g // (1 << 21)) % (1 << 21)).astype(np.uint32)
    m[:, 0] = (g // (1 << 42)).astype(np.uint32)
    return np.ascontiguousarray(m).view("<U3").reshape(-1)


def char_trigram_profiles(ds, text_col: str = "text",
                          lang_col: str = "lang", k: int = 10):
    """Dataset (lang, gram, cnt, rk): the k most frequent character
    trigrams per language, rk 1..k by (cnt DESC, gram ASC)."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "g": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        texts = batch.column(text_col).to_pylist()
        lens = pc.utf8_length(batch.column(text_col)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        joined = "".join(t or "" for t in texts)
        n = len(joined)
        if n < 3:
            return empty
        u = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        ends = np.cumsum(lens)
        starts = ends - lens
        pos = np.arange(n - 2, dtype=np.int64)
        doc_of = np.searchsorted(ends, pos, side="right")
        valid = (pos + 2) < ends[doc_of]          # window in one doc
        if not valid.any():
            return empty
        p = pos[valid]
        g = _pack3(u[p], u[p + 1], u[p + 2])
        enc = pc.dictionary_encode(batch.column(lang_col))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lg = codes[doc_of[valid]]
        # per-lang np.unique on the PLAIN int64 gram array (few langs
        # per batch; structured-array unique is 14x slower — repo
        # perf note), then stitch the partial rows
        dic = np.asarray(enc.dictionary, dtype=str)
        gs, cs, ls = [], [], []
        for code in np.unique(lg):
            uq, cnt = np.unique(g[lg == code], return_counts=True)
            gs.append(uq)
            cs.append(cnt.astype(np.int64))
            ls.append(np.full(len(uq), dic[code], dtype=object))
        return pa.table({"lang": pa.array(np.concatenate(ls),
                                          pa.string()),
                         "g": pa.array(np.concatenate(gs)),
                         "cnt": pa.array(np.concatenate(cs))})

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby(["lang", "g"]).aggregate(Sum("cnt"))

    def topk(group: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "gram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64()),
                          "rk": pa.array([], pa.int64())})
        if group.num_rows == 0 or "g" not in group.schema.names:
            return empty
        g = group.column("g").to_numpy(zero_copy_only=False)
        c = group.column("sum(cnt)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        grams = _unpack3(g)
        order = np.lexsort((grams, -c))[:k]
        return pa.table({
            "lang": group.column("lang").take(
                pa.array(order, pa.int64())),
            "gram": pa.array(grams[order], pa.string()),
            "cnt": pa.array(c[order]),
            "rk": pa.array(np.arange(1, len(order) + 1,
                                     dtype=np.int64))})

    return agg.groupby("lang").map_groups(topk, batch_format="pyarrow")
