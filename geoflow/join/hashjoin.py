"""Broadcast hash join (dimension enrichment).

Enrich a big fact Dataset with columns from a small dimension table —
the other canonical 100-TB join shape next to the semi-join: the
dimension is `ray.put` ONCE and every big-side batch joins against it
inside map_batches, so the big side never shuffles (contrast
Dataset.join, whose aggregator actors repartition BOTH sides —
CLAUDE.md Ray-2.49 notes). No reference counterpart (SURVEY §2.4's
joins are spatial); engine-original like bloom_semi_join.

One-to-many is supported: duplicate dimension keys fan each matching
fact row out (sorted-key ranges + vectorized repeat expansion, no
Python loop). how="left" keeps unmatched fact rows with nulls.
Memory bound: the DIMENSION side only (documented; for two big sides
use Dataset.join or the cell-keyed shuffle joins).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["broadcast_hash_join"]


def _np_col(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def broadcast_hash_join(big_ds, small_ds, on: str, big_on: str | None = None,
                        how: str = "inner", suffix: str = "_r"):
    """Join big_ds (fact) with small_ds (dimension) on equality.

    ``on`` names the dimension key column; ``big_on`` the fact key
    (defaults to ``on``). Dimension payload columns whose names collide
    with fact columns get ``suffix``. how: "inner" or "left"."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError("broadcast_hash_join: how must be inner|left")
    big_on = big_on or on
    small = pa.concat_tables(
        list(small_ds.iter_batches(batch_format="pyarrow",
                                   batch_size=65536)))
    keys = _np_col(small.column(on))
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    payload = small.drop_columns([on])
    small_ref = ray.put((sorted_keys, order, payload))

    def probe(batch: pa.Table) -> pa.Table:
        sk, ordr, dim = ray.get(small_ref)
        bk = _np_col(batch.column(big_on))
        lo = np.searchsorted(sk, bk, side="left")
        hi = np.searchsorted(sk, bk, side="right")
        counts = hi - lo
        total = int(counts.sum())
        big_idx = np.repeat(np.arange(len(bk)), counts)
        starts = np.cumsum(counts) - counts
        within = np.arange(total) - np.repeat(starts, counts)
        small_idx = ordr[np.repeat(lo, counts) + within]
        out_big = batch.take(pa.array(big_idx))
        out_dim = dim.take(pa.array(small_idx))
        if how == "left":
            miss = np.nonzero(counts == 0)[0]
            if len(miss):
                out_big = pa.concat_tables(
                    [out_big, batch.take(pa.array(miss))])
                nulls = pa.table({
                    f.name: pa.nulls(len(miss), f.type)
                    for f in dim.schema})
                out_dim = pa.concat_tables([out_dim, nulls])
        cols = {name: out_big.column(name)
                for name in out_big.schema.names}
        for name in out_dim.schema.names:
            out_name = name if name not in cols else name + suffix
            cols[out_name] = out_dim.column(name)
        return pa.table(cols)

    return big_ds.map_batches(probe, batch_format="pyarrow",
                              batch_size=32768)
