"""Incremental (cross-snapshot) dedup: drop documents whose content
already exists in a PERSISTED index built from earlier snapshots.

The 100-TB crawl reality: each month's snapshot must dedup against
everything already curated, without re-reading old snapshots. The
index is the 8-byte content-hash set (text/dedup.content_hash64 —
deterministic blake-free hashing, retry/resume safe), persisted as
hash-sharded parquet; a new snapshot streams once through either a
broadcast membership filter (index fits the object store: 8 B/doc,
~80 GB per 10^10 docs — fine on a real cluster's store, NOT the
driver heap; we stream shard-by-shard to build the sorted array) or
the key-partitioned anti join (arbitrarily large indexes).

Composes with exact_dedup for within-snapshot duplicates: run
exact_dedup first, then dedup_against_index, then append_content_index
with the survivors — the index grows by exactly the new distinct
content. append is idempotent per snapshot tag (content-hash file
names, same layout contract as io/geojson_sink.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import content_hash64

__all__ = ["content_hash_ds", "build_content_index",
           "append_content_index", "dedup_against_index"]


def content_hash_ds(ds, text_col: str = "text"):
    """Dataset of distinct-per-batch int64 ``h64`` rows (global dedup
    happens at index build / join time; per-batch np.unique keeps the
    shuffle volume at distinct-content scale)."""

    def h(batch: pa.Table) -> pa.Table:
        hv = content_hash64(batch.column(text_col))
        return pa.table({"h64": pa.array(np.unique(hv).view(np.int64))})

    return ds.map_batches(h, batch_format="pyarrow")


def build_content_index(ds, path: str, text_col: str = "text"):
    """Create the index at ``path``: distinct h64 of ``ds``, written as
    parquet (one file per output block). Returns the row count."""
    distinct = content_hash_ds(ds, text_col).groupby("h64").count() \
        .map_batches(lambda b: b.select(["h64"]) if "h64" in
                     b.schema.names else b, batch_format="pyarrow")
    distinct.write_parquet(path)
    import ray
    return ray.data.read_parquet(path).count()


def append_content_index(new_ds, path: str, text_col: str = "text"):
    """Add the distinct hashes of ``new_ds`` that are NOT yet in the
    index as additional parquet files under ``path`` (read old + anti
    filter + write new files; existing files untouched, so concurrent
    readers stay consistent and a re-run appends nothing new)."""
    import ray
    from ..join.semijoin import partitioned_key_filter

    old = ray.data.read_parquet(path, columns=["h64"])
    fresh_all = content_hash_ds(new_ds, text_col)
    fresh = partitioned_key_filter(
        fresh_all.groupby("h64").count().map_batches(
            lambda b: b.select(["h64"]) if "h64" in b.schema.names
            else b, batch_format="pyarrow"),
        old, "h64", anti=True)
    n = fresh.count()
    if n:
        fresh.write_parquet(path)
    return n


def dedup_against_index(ds, index, text_col: str = "text",
                        mode: str = "broadcast"):
    """Rows of ``ds`` whose content hash is NOT in ``index`` (a path to
    a built index, or any Dataset with an ``h64`` column).

    mode="broadcast": the index hash array is assembled once (sorted
    int64, 8 B/hash) and read through the per-worker cache; the corpus
    pass is a pure map_batches filter — right whenever the index fits
    the object store. mode="join": key-partitioned anti join
    (join/semijoin.py) for indexes beyond that — the corpus payload
    crosses the wire once, nothing driver-materialized."""
    import ray

    index_ds = ray.data.read_parquet(index, columns=["h64"]) \
        if isinstance(index, str) else index

    def with_h(batch: pa.Table) -> pa.Table:
        hv = content_hash64(batch.column(text_col))
        return batch.append_column("_h64",
                                   pa.array(hv.view(np.int64)))

    if mode == "join":
        from ..join.semijoin import partitioned_key_filter
        big = ds.map_batches(with_h, batch_format="pyarrow")
        out = partitioned_key_filter(big, index_ds, "h64",
                                     big_key_col="_h64", anti=True)
        return out.map_batches(lambda b: b.drop_columns(["_h64"]),
                               batch_format="pyarrow")

    parts = []
    for b in index_ds.iter_batches(batch_format="pyarrow",
                                   batch_size=65536):
        if b.num_rows and "h64" in b.schema.names:
            parts.append(b.column("h64").to_numpy(zero_copy_only=False))
    idx = np.sort(np.concatenate(parts)) if parts \
        else np.empty(0, np.int64)
    ref = ray.put(idx)

    from .dedup import _winner_cache_get

    def flt(batch: pa.Table) -> pa.Table:
        known = _winner_cache_get(ref)
        hv = content_hash64(batch.column(text_col)).view(np.int64)
        if len(known) == 0:
            return batch
        pos = np.clip(np.searchsorted(known, hv), 0, len(known) - 1)
        return batch.filter(pa.array(known[pos] != hv))

    return ds.map_batches(flt, batch_format="pyarrow")
