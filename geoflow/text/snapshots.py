"""Crawl snapshot diffing — CDX-style change detection between two
crawls of the same URL space: every URL is classified added /
deleted / changed / same by comparing content signatures. The
workhorse behind incremental recrawl scheduling and freshness
signals; no reference counterpart (static corpora).

Scale shape: both snapshots are projected to (key, sig) rows — the
signature (a 64-bit content hash upstream, e.g.
text/hashing.hash64 of the body) is computed where the content
lives, so only 16-byte rows enter the one full_outer hash-join
shuffle; classification is a vectorized null/equality pass over the
join output. Join seams are sanitized with drop_schemaless_blocks
(upstream filters empty blocks mid-fused-chain and the stale-schema
empties poison hash-join partitions — CLAUDE.md round-3 session-7).

Assumption (documented): one row per key per snapshot — crawl
snapshots are keyed by URL; duplicate keys fan out through the join
as in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["snapshot_diff"]


def snapshot_diff(old, new, key_col: str = "url",
                  sig_col: str = "sig",
                  num_partitions: int | None = None):
    """Full-outer diff of two (key, sig) snapshot Datasets →
    (key, sig_old, sig_new, status) with status in
    {'added','deleted','changed','same'}."""
    import ray

    from geoflow.join.semijoin import drop_schemaless_blocks

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))

    def proj(name):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({key_col: b.column(key_col),
                             name: b.column(sig_col)})
        return fn

    keepalives = []
    o, ka = drop_schemaless_blocks(
        old.map_batches(proj("sig_old"), batch_format="pyarrow"))
    keepalives.append(ka)
    n, ka2 = drop_schemaless_blocks(
        new.map_batches(proj("sig_new"), batch_format="pyarrow"))
    keepalives.append(ka2)
    if o is None and n is None:
        import ray.data
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.string()),
            "sig_old": pa.array([], pa.int64()),
            "sig_new": pa.array([], pa.int64()),
            "status": pa.array([], pa.string())}))

    def classify(b: pa.Table) -> pa.Table:
        so = b.column("sig_old") if "sig_old" in b.schema.names \
            else pa.nulls(b.num_rows, pa.int64())
        sn = b.column("sig_new") if "sig_new" in b.schema.names \
            else pa.nulls(b.num_rows, pa.int64())
        vo = np.asarray(pc.is_valid(so))
        vn = np.asarray(pc.is_valid(sn))
        eq = np.zeros(b.num_rows, dtype=bool)
        both = vo & vn
        if both.any():
            eq[both] = (np.asarray(pc.fill_null(so, 0))[both]
                        == np.asarray(pc.fill_null(sn, 0))[both])
        status = np.where(~vo, "added",
                          np.where(~vn, "deleted",
                                   np.where(eq, "same", "changed")))
        return pa.table({key_col: b.column(key_col),
                         "sig_old": pc.cast(so, pa.int64()),
                         "sig_new": pc.cast(sn, pa.int64()),
                         "status": pa.array(status.astype(object),
                                            pa.string())})

    if o is None or n is None:
        only = n if o is None else o
        out = only.map_batches(classify, batch_format="pyarrow")
    else:
        j = o.join(n, join_type="full_outer",
                   num_partitions=num_partitions, on=(key_col,))
        out = j.map_batches(classify, batch_format="pyarrow")
    out._geoflow_keepalive = keepalives
    return out
