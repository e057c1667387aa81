"""EXACT set-similarity join via prefix filtering (Chaudhuri-Ganti-
Kaushik 2006; Xiao et al. 2008 PPJoin family) — the deterministic
counterpart to the LSH near-dup machinery: every pair with Jaccard
>= tau is FOUND (no probabilistic misses), and the threshold test is
integer-exact (J >= p/q  <=>  q*inter >= p*(|A|+|B|-inter), cross-
multiplied — no float division).

Prefix-filtering theorem: order the token universe by ascending
document frequency (rare first; ties by token id). If
J(A,B) >= tau then A and B share a token among the first
|S| - ceil(tau*|S|) + 1 tokens of each set under that global order —
so emitting only PREFIX tokens as join keys is a complete candidate
generator, and rare-first ordering keeps buckets small (the same
reason the inverted-index search reads rare postings first).

Distributed shape: one groupby for document frequencies, broadcast
as a rank table via ray.put (token-universe sized, not corpus
sized); one fully-vectorized map emitting (prefix_rank, doc,
packed rank-sorted set) rows — the per-doc binary sets are built
zero-copy from the flat rank array's buffers; one
groupby(prefix).map_groups verifying pairwise inside each bucket
with CHUNKED padded-matrix equality (per-row pad sentinels never
match; chunking bounds the (chunk, k, L, L) tensor); one final
groupby(a, b) dedup (a pair verified under several shared prefix
tokens emits identical rows). Buckets above ``bucket_cap`` raise
loudly rather than silently degrade exactness.

Callers must ensure one doc's tokens arrive in ONE batch (derive
tokens per row, or groupby(doc) upstream) — sets are assembled
batch-locally."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pack_sets(tok_doc: np.ndarray, tok_val: np.ndarray):
    """Flat (doc, token) pairs -> (docs, offsets, flat unique
    tokens) with per-doc segments sorted by token value."""
    order = np.lexsort((tok_val, tok_doc))
    d, v = tok_doc[order], tok_val[order]
    keep = np.ones(len(d), bool)
    keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
    d, v = d[keep], v[keep]
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    return d[starts], np.r_[starts, len(d)].astype(np.int64), v


def setsim_join(ds, doc_col: str, tok_col: str,
                tau_num: int = 1, tau_den: int = 2,
                bucket_cap: int = 4096,
                max_broadcast_tokens: int = 100_000_000):
    """All document pairs with Jaccard(token sets) >= tau_num /
    tau_den, with exact intersection/union counts: rows
    (a, b, inter, uni), a < b. ``ds`` holds flat (doc, token) int64
    rows (duplicate pairs fine). Jaccard prefix length
    p = n - ceil(tau*n) + 1; threshold cross-multiplied."""

    def prefix(sizes):
        ceil_tau_n = -((-tau_num * sizes) // tau_den)
        return np.clip(sizes - ceil_tau_n + 1, 1, sizes)

    return _prefix_join(ds, doc_col, tok_col, prefix=prefix,
                        keep=lambda it, uni:
                            tau_den * it >= tau_num * uni,
                        bucket_cap=bucket_cap,
                        max_broadcast_tokens=max_broadcast_tokens)


def overlap_join(ds, doc_col: str, tok_col: str, min_overlap: int = 2,
                 bucket_cap: int = 4096,
                 max_broadcast_tokens: int = 100_000_000):
    """All document pairs sharing at least ``min_overlap`` tokens
    (the T-overlap set join): rows (a, b, inter, uni), a < b. Same
    prefix-filtering machinery with the overlap bound's prefix
    length p = n - c + 1 (a pair with |A∩B| >= c must share a token
    in either set's first n-c+1 rare-first tokens — the standard
    overlap prefix; trivially complete since missing all of them
    leaves fewer than c shared)."""
    return _prefix_join(ds, doc_col, tok_col,
                        prefix=lambda sizes: np.clip(
                            sizes - min_overlap + 1, 1, sizes),
                        keep=lambda it, uni: it >= min_overlap,
                        bucket_cap=bucket_cap,
                        max_broadcast_tokens=max_broadcast_tokens)


def _prefix_join(ds, doc_col, tok_col, prefix, keep, bucket_cap,
                 max_broadcast_tokens):
    """Shared prefix-filter join core: ``prefix(sizes)->p`` chooses
    per-set prefix lengths; ``keep(inter, uni)->mask`` the pair
    predicate. setsim_join/overlap_join wrap it."""
    import ray
    import ray.data
    from ray.data.aggregate import Min

    df = ds.groupby(tok_col).count()
    toks_l, dfs_l = [], []
    for blk in df.iter_batches(batch_format="pyarrow",
                               batch_size=None):
        if blk.num_rows == 0 or tok_col not in blk.schema.names:
            continue
        toks_l.append(blk.column(tok_col).to_numpy(
            zero_copy_only=False).astype(np.int64))
        dfs_l.append(blk.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64))
    if not toks_l:
        return ray.data.from_arrow(pa.table({
            c: pa.array([], pa.int64())
            for c in ("a", "b", "inter", "uni")}))
    toks = np.concatenate(toks_l)
    dfs = np.concatenate(dfs_l)
    if len(toks) > max_broadcast_tokens:
        raise ValueError("token universe exceeds broadcast bound")
    order = np.lexsort((toks, dfs))
    rank_of = np.empty(len(toks), np.int64)
    rank_of[order] = np.arange(len(toks))
    sort_idx = np.argsort(toks, kind="stable")
    toks_ref = ray.put(toks[sort_idx])
    rank_ref = ray.put(rank_of[sort_idx])

    def emit(batch: pa.Table) -> pa.Table:
        tv, rk = ray.get(toks_ref), ray.get(rank_ref)
        d = batch.column(doc_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = batch.column(tok_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        docs, offs, flat = _pack_sets(d, t)
        ndocs = len(docs)
        if ndocs == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "doc": pa.array([], pa.int64()),
                             "pset": pa.array([], pa.large_binary())})
        sizes = np.diff(offs)
        seg = np.repeat(np.arange(ndocs), sizes)
        ranks = rk[np.searchsorted(tv, flat)]
        o2 = np.lexsort((ranks, seg))
        r_sorted = ranks[o2]
        pset = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), ndocs,
            [None, pa.py_buffer((offs * 8).tobytes()),
             pa.py_buffer(r_sorted.astype("<i8").tobytes())])
        p = prefix(sizes)
        intra = np.arange(len(r_sorted)) \
            - np.repeat(offs[:-1], sizes)
        sel = intra < np.repeat(p, sizes)
        idx = seg[sel]
        return pa.table({
            "pk": pa.array(r_sorted[sel]),
            "doc": pa.array(docs[idx]),
            "pset": pset.take(pa.array(idx, type=pa.int64()))})

    em = ds.map_batches(emit, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], pa.int64())
                          for c in ("a", "b", "inter", "uni")})
        k = group.num_rows
        if k < 2:
            return empty
        if k > bucket_cap:
            raise ValueError(f"prefix bucket {k} exceeds "
                             f"bucket_cap={bucket_cap}")
        docs = group.column("doc").to_numpy(zero_copy_only=False)
        psets = group.column("pset").combine_chunks()
        offs = np.frombuffer(psets.buffers()[1], np.int64,
                             count=k + 1, offset=psets.offset * 8)
        flat = np.frombuffer(psets.buffers()[2], "<i8")
        lens = (offs[1:] - offs[:-1]) // 8
        L = int(lens.max())
        m = np.empty((k, L), np.int64)
        for i in range(k):
            s = flat[offs[i] // 8: offs[i + 1] // 8]
            m[i, :len(s)] = s
            m[i, len(s):] = -(i + 1)
        outs = ([], [], [], [])
        step = max(1, (1 << 24) // max(1, k * L * L))
        for lo in range(0, k - 1, step):
            hi = min(lo + step, k - 1)
            eq = (m[lo:hi][:, None, :, None]
                  == m[None, :, :, None].swapaxes(2, 3))
            inter = eq.sum(axis=(2, 3))
            bi0, bj0 = np.nonzero(np.ones((hi - lo, k), bool))
            sel2 = (bi0 + lo) < bj0
            bi0, bj0 = bi0[sel2], bj0[sel2]
            gi = bi0 + lo
            it = inter[bi0, bj0]
            uni = lens[gi] + lens[bj0] - it
            ok = (docs[gi] != docs[bj0]) & keep(it, uni)
            outs[0].append(np.minimum(docs[gi][ok], docs[bj0][ok]))
            outs[1].append(np.maximum(docs[gi][ok], docs[bj0][ok]))
            outs[2].append(it[ok])
            outs[3].append(uni[ok])
        if not outs[0]:
            return empty
        return pa.table({
            "a": pa.array(np.concatenate(outs[0])),
            "b": pa.array(np.concatenate(outs[1])),
            "inter": pa.array(np.concatenate(outs[2])),
            "uni": pa.array(np.concatenate(outs[3]))})

    pairs = em.groupby("pk").map_groups(verify,
                                        batch_format="pyarrow")
    agg = pairs.groupby(["a", "b"]).aggregate(
        Min("inter", alias_name="inter"),
        Min("uni", alias_name="uni"))

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.schema.names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("a", "b", "inter", "uni")})
        return b.select(["a", "b", "inter", "uni"])

    return agg.map_batches(fin, batch_format="pyarrow")
