"""Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
entity-resolution pair generator: rows are ranked by a sort key and
every pair within ``window`` ranks becomes a candidate. Complements
the hash blocking in text/dedup (LSH buckets) with the classic
order-based blocking that catches near-keys hashing separates.

Distributed global rank WITHOUT a single-group sort: the sort key is
range-bucketed (bucket = key // bucket_width, order-preserving, so
ties never straddle buckets), one small groupby(bucket).count gives
the driver the per-bucket offsets (|buckets| rows), and a per-bucket
map_groups assigns rank = offset + local lexsort position — i.e. SQL
row_number() OVER (ORDER BY key, id) - 1, hash-exact.

Pair generation co-locates rank-window neighbors by CHUNK (width =
window): every row lands in its home chunk rank//w and as a ghost in
rank//w + 1; a pair (a, b) with rank_b - rank_a in [1, w) is emitted
ONLY in chunk rank_b // w (b's home) — a is present there as home or
ghost, so each pair appears exactly once. Three shuffles total
(count, rank, chunk), each over one int-keyed stream."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def global_ranks(ds, sort_col: str, id_col: str,
                 bucket_width: int, out_col: str = "rnk"):
    """Append the 0-based global rank by (sort_col, id_col) — ints
    required; ``bucket_width`` is the range-bucket size of the sort
    key (pick so ~thousands of buckets at scale)."""
    import ray

    def bkt(b: pa.Table) -> pa.Table:
        k = b.column(sort_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return b.append_column("__bkt", pa.array(k // bucket_width))

    wb = ds.map_batches(bkt, batch_format="pyarrow").materialize()

    counts = {}
    for blk in wb.groupby("__bkt").count().iter_batches(
            batch_format="pyarrow", batch_size=None):
        if blk.num_rows == 0 or "__bkt" not in blk.schema.names:
            continue
        for k, c in zip(blk.column("__bkt").to_pylist(),
                        blk.column("count()").to_pylist()):
            counts[int(k)] = counts.get(int(k), 0) + int(c)
    buckets = np.array(sorted(counts), np.int64)
    offs = np.concatenate([[0], np.cumsum(
        [counts[int(b)] for b in buckets])[:-1]]).astype(np.int64) \
        if len(buckets) else np.empty(0, np.int64)
    off_ref = ray.put((buckets, offs))

    def rank_group(group: pa.Table, _o=off_ref) -> pa.Table:
        bks, ofs = ray.get(_o)
        k = group.column(sort_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        i = group.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        base = ofs[np.searchsorted(
            bks, group.column("__bkt")[0].as_py())]
        order = np.lexsort((i, k))
        rank = np.empty(len(k), np.int64)
        rank[order] = base + np.arange(len(k))
        return group.drop_columns(["__bkt"]).append_column(
            out_col, pa.array(rank))

    return wb.groupby("__bkt").map_groups(rank_group,
                                          batch_format="pyarrow")


def sorted_neighborhood_pairs(ds, sort_col: str, id_col: str,
                              window: int, bucket_width: int):
    """(id_a, id_b, gap) for every pair with 0 < rank_b - rank_a <
    window under the global (sort_col, id_col) order."""
    ranked = global_ranks(ds, sort_col, id_col, bucket_width)
    w = int(window)

    def emit(b: pa.Table) -> pa.Table:
        r = b.column("rnk").to_numpy(zero_copy_only=False)
        i = b.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        home = r // w
        return pa.table({
            "chunk": np.concatenate([home, home + 1]),
            "rnk": np.concatenate([r, r]),
            "pid": np.concatenate([i, i]),
            "is_home": np.concatenate(
                [np.ones(len(r), np.int8), np.zeros(len(r), np.int8)])})

    def pairs(group: pa.Table) -> pa.Table:
        c = group.column("chunk")[0].as_py()
        r = group.column("rnk").to_numpy(zero_copy_only=False)
        i = group.column("pid").to_numpy(zero_copy_only=False)
        h = group.column("is_home").to_numpy(
            zero_copy_only=False).astype(bool)
        # b must be HOME here (chunk == rank_b // w); a is any row
        rb, ib = r[h], i[h]
        da = r[:, None]
        gap = rb[None, :] - da                      # rank_b - rank_a
        ok = (gap > 0) & (gap < w)
        ai, bj = np.nonzero(ok)
        return pa.table({"id_a": pa.array(i[ai]),
                         "id_b": pa.array(ib[bj]),
                         "gap": pa.array(gap[ai, bj])})

    return (ranked.map_batches(emit, batch_format="pyarrow")
            .groupby("chunk").map_groups(pairs,
                                         batch_format="pyarrow"))
