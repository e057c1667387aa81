"""Snapshot table layer over Parquet: atomic appends, copy-on-write
deletes, time travel, and manifest-level pruning — the minimal
lakehouse-table shape (Iceberg/Delta-style, from public designs) a
100-TB engine needs for incremental processing.

Layout:
    table_dir/
      data/part-<contenthash>.parquet     immutable data files
      meta/snap-00000001.json             one manifest per snapshot

A manifest is the COMPLETE file list of its snapshot plus per-file
stats (rows, byte size, min/max of a declared ``key_col``) and a
parent pointer:
    {"snapshot": n, "parent": n-1, "operation": "append"|"rewrite",
     "key_col": ..., "files": [{"path", "rows", "bytes",
                                "key_min", "key_max"}]}

Commit protocol: data files are written first (content-hash names —
writing the same rows twice is a no-op), then the manifest lands via
tmp+rename, then nothing else: the highest ``snap-*.json`` IS the
current table state, so a crash before the rename leaves the
previous snapshot intact (atomic), and a re-run of the same append
commits an identical snapshot body. Readers list manifests once and
never see partial state. Time travel = read any older manifest.

Deletes are COPY-ON-WRITE at file granularity: files whose key-range
stats can't contain matches are carried over untouched; the rest are
read, filtered, and rewritten as new files (the old files stay for
older snapshots — this is why manifests are complete lists, not
deltas). ``prune`` on read skips files by key range before any I/O
— the manifest-stats pushdown that makes a needle query O(matching
files) instead of O(table).

Scale shape: manifests are O(#files) JSON read once on the driver;
all data I/O is ``ray.data.read_parquet`` over the (pruned) file
list; appends write one file per Ray block inside the map tasks.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "meta")


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "data")


def _snap_path(table_dir: str, n: int) -> str:
    return os.path.join(_meta_dir(table_dir), f"snap-{n:08d}.json")


def list_snapshots(table_dir: str) -> list[int]:
    md = _meta_dir(table_dir)
    if not os.path.isdir(md):
        return []
    out = []
    for f in os.listdir(md):
        if f.startswith("snap-") and f.endswith(".json"):
            out.append(int(f[5:-5]))
    return sorted(out)


def read_manifest(table_dir: str, snapshot: int | None = None) -> dict:
    snaps = list_snapshots(table_dir)
    if not snaps:
        return {"snapshot": 0, "parent": None, "operation": "empty",
                "key_col": None, "files": []}
    n = snaps[-1] if snapshot is None else snapshot
    if n not in snaps:
        raise ValueError(f"snapshot {n} not in {snaps}")
    with open(_snap_path(table_dir, n)) as f:
        return json.load(f)


def _commit(table_dir: str, manifest: dict) -> int:
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    n = manifest["snapshot"]
    path = _snap_path(table_dir, n)
    if os.path.exists(path):
        raise RuntimeError(f"snapshot {n} already exists "
                           "(concurrent commit)")
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, path)
    return n


def _write_data_files(ds, table_dir: str, key_col: str):
    """Write one content-hash-named parquet file per block inside the
    map tasks; returns the per-file stats rows (driver-side list,
    O(#files))."""
    import pyarrow.parquet as pq

    dd = _data_dir(table_dir)
    os.makedirs(dd, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        sink = pa.BufferOutputStream()
        pq.write_table(batch, sink)
        data = sink.getvalue()
        h = hashlib.blake2b(data.to_pybytes(),
                            digest_size=12).hexdigest()
        fp = os.path.join(dd, f"part-{h}.parquet")
        if not os.path.exists(fp):
            tmp = fp + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data.to_pybytes())
            os.replace(tmp, fp)
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        # per-file min/max for EVERY integer/timestamp column — the
        # manifest-stats pushdown then prunes on any of them, not
        # just the key (Iceberg-style column metrics)
        import json as _json
        cols = {}
        for name in batch.schema.names:
            col = batch.column(name)
            t = col.type
            if pa.types.is_integer(t) or pa.types.is_timestamp(t):
                v = col.cast(pa.int64()).to_numpy(
                    zero_copy_only=False) \
                    if pa.types.is_timestamp(t) else \
                    col.to_numpy(zero_copy_only=False)
                if len(v):
                    cols[name] = [int(v.min()), int(v.max())]
        return pa.table({
            "path": pa.array([fp]),
            "rows": pa.array([batch.num_rows], pa.int64()),
            "bytes": pa.array([len(data)], pa.int64()),
            "key_min": pa.array([int(k.min())], pa.int64()),
            "key_max": pa.array([int(k.max())], pa.int64()),
            "col_stats": pa.array([_json.dumps(cols)])})

    stats = ds.map_batches(write_block, batch_format="pyarrow",
                           batch_size=None).take_all()
    out = []
    for r in stats:
        rec = {k: r[k] for k in
               ("path", "rows", "bytes", "key_min", "key_max")}
        rec["cols"] = json.loads(r["col_stats"])
        out.append(rec)
    return out


def append(ds, table_dir: str, key_col: str) -> int:
    """Commit a new snapshot = parent files + this Dataset's rows.
    Returns the new snapshot id."""
    cur = read_manifest(table_dir)
    if cur["files"] and cur.get("key_col") != key_col:
        raise ValueError("key_col mismatch with existing table")
    new_files = _write_data_files(ds, table_dir, key_col)
    manifest = {
        "snapshot": cur["snapshot"] + 1,
        "parent": cur["snapshot"] or None,
        "operation": "append",
        "key_col": key_col,
        "files": cur["files"] + new_files,
    }
    return _commit(table_dir, manifest)


def delete_where(table_dir: str, key_col: str,
                 key_lo: int, key_hi: int,
                 predicate=None) -> int:
    """Copy-on-write delete of rows with key in [key_lo, key_hi]
    (optionally refined by ``predicate(batch) -> bool mask``): files
    whose [key_min, key_max] is disjoint from the range carry over
    untouched; the rest are rewritten filtered. Returns the new
    snapshot id."""
    import ray.data

    cur = read_manifest(table_dir)
    if cur.get("key_col") != key_col:
        raise ValueError("key_col mismatch")
    keep, rewrite = [], []
    for f in cur["files"]:
        if f["key_max"] < key_lo or f["key_min"] > key_hi:
            keep.append(f)
        else:
            rewrite.append(f)
    new_files = []
    if rewrite:
        src = ray.data.read_parquet([f["path"] for f in rewrite])

        def drop(batch: pa.Table) -> pa.Table:
            k = batch.column(key_col).to_numpy(zero_copy_only=False)
            hit = (k >= key_lo) & (k <= key_hi)
            if predicate is not None:
                hit &= predicate(batch)
            return batch.filter(pa.array(~hit))

        # fully-emptied blocks are forwarded untouched by Ray and
        # never reach the write UDF — no 0-row data file is written
        filtered = src.map_batches(drop, batch_format="pyarrow")
        new_files = _write_data_files(filtered, table_dir, key_col)
    manifest = {
        "snapshot": cur["snapshot"] + 1,
        "parent": cur["snapshot"],
        "operation": "rewrite",
        "key_col": key_col,
        "files": keep + new_files,
    }
    return _commit(table_dir, manifest)


def read_snapshot(table_dir: str, snapshot: int | None = None,
                  key_lo: int | None = None,
                  key_hi: int | None = None,
                  columns: list[str] | None = None,
                  where: dict | None = None):
    """Dataset over a snapshot's files — optionally pruned by the
    manifest stats BEFORE any file I/O: key range via
    key_lo/key_hi, and ANY integer/timestamp column via
    ``where={col: (lo, hi)}`` (Iceberg-style column metrics; files
    written before the metrics existed are conservatively kept).
    Empty snapshot -> None (caller decides the schema of
    nothing)."""
    import ray.data

    man = read_manifest(table_dir, snapshot)
    files = man["files"]
    if key_lo is not None or key_hi is not None:
        lo = -(1 << 62) if key_lo is None else key_lo
        hi = (1 << 62) if key_hi is None else key_hi
        files = [f for f in files
                 if not (f["key_max"] < lo or f["key_min"] > hi)]
    if where:
        def _keep(f):
            cs = f.get("cols")
            if not cs:
                return True          # legacy file: no metrics
            for c, (lo, hi) in where.items():
                if c in cs and (cs[c][1] < lo or cs[c][0] > hi):
                    return False
            return True
        files = [f for f in files if _keep(f)]
    if not files:
        return None
    return ray.data.read_parquet([f["path"] for f in files],
                                 columns=columns)


def compact(table_dir: str, target_rows: int = 1 << 20) -> int:
    """Compaction: rewrite groups of small files into fewer larger
    ones (content-preserving; a new ``rewrite`` snapshot). Files are
    greedily binned by manifest row counts until a bin reaches
    ``target_rows``; single-file bins carry over UNREWRITTEN (their
    bytes already have the target shape). The read side of each bin
    is one ``read_parquet`` over its file list; the write side
    reuses the content-hash block writer, so compacting twice is a
    no-op. Returns the new snapshot id."""
    import ray.data

    cur = read_manifest(table_dir)
    key_col = cur.get("key_col")
    bins, binrows, cur_bin = [], 0, []
    for f in sorted(cur["files"], key=lambda f: f["rows"]):
        cur_bin.append(f)
        binrows += f["rows"]
        if binrows >= target_rows:
            bins.append(cur_bin)
            cur_bin, binrows = [], 0
    if cur_bin:
        bins.append(cur_bin)
    keep, new_files = [], []
    for b in bins:
        if len(b) <= 1:
            keep.extend(b)
            continue
        src = ray.data.read_parquet([f["path"] for f in b]) \
            .repartition(max(1, sum(f["rows"] for f in b)
                             // target_rows + 1))
        new_files.extend(_write_data_files(src, table_dir, key_col))
    manifest = {
        "snapshot": cur["snapshot"] + 1,
        "parent": cur["snapshot"],
        "operation": "rewrite",
        "key_col": key_col,
        "files": keep + new_files,
    }
    return _commit(table_dir, manifest)


def snapshot_row_diff(table_dir: str, snap_a: int, snap_b: int,
                      key_col: str):
    """Row-level CDC between two snapshots from the manifest FILE
    diff: read files only in B with weight +1 and files only in A
    with weight -1, sum per key, keep net != 0 — rows carried
    through rewrites/compactions cancel, so the result is exactly
    the logical inserts (+1) and deletes (-1). Cost is O(changed
    files), never O(table). Returns a Dataset (key, delta)."""
    import ray.data

    fa = {f["path"] for f in read_manifest(table_dir, snap_a)["files"]}
    fb = {f["path"] for f in read_manifest(table_dir, snap_b)["files"]}
    added = sorted(fb - fa)
    removed = sorted(fa - fb)

    def partial(w):
        def f(batch: pa.Table) -> pa.Table:
            k = batch.column(key_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            ks, cnt = np.unique(k, return_counts=True)
            return pa.table({key_col: pa.array(ks),
                             "delta": pa.array(
                                 cnt.astype(np.int64) * w)})
        return f

    parts = []
    for paths, w in ((added, 1), (removed, -1)):
        if paths:
            parts.append(
                ray.data.read_parquet(paths, columns=[key_col])
                .map_batches(partial(w), batch_format="pyarrow"))
    if not parts:
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            "delta": pa.array([], pa.int64())}))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)

    def fin(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sum(delta)" not in \
                batch.schema.names:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "delta": pa.array([], pa.int64())})
        d = batch.column("sum(delta)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = pa.table({key_col: batch.column(key_col),
                      "delta": pa.array(d)})
        return t.filter(pa.array(d != 0))

    return ds.groupby(key_col).sum("delta") \
        .map_batches(fin, batch_format="pyarrow")


def upsert(ds_new, table_dir: str, key_col: str) -> int:
    """MERGE-INTO: replace rows whose key appears in ``ds_new`` and
    append the new rows — implemented as key-level copy-on-write
    (files whose key range may contain an upsert key are rewritten
    with those keys dropped; disjoint files carry over) + append,
    committed as ONE snapshot. The upsert key set is collected and
    broadcast (bounded: one upsert batch, not the table). Returns
    the new snapshot id."""
    import ray

    import ray.data

    cur = read_manifest(table_dir)
    if cur["files"] and cur.get("key_col") != key_col:
        raise ValueError("key_col mismatch")
    new_files = _write_data_files(ds_new, table_dir, key_col)
    keys = np.unique(np.concatenate([
        np.asarray([], np.int64)] + [
        _read_keys(f["path"], key_col) for f in new_files]))
    keep, rewrite = [], []
    for f in cur["files"]:
        lo = keys.searchsorted(f["key_min"], side="left")
        hi = keys.searchsorted(f["key_max"], side="right")
        (rewrite if hi > lo else keep).append(f)
    rewritten = []
    if rewrite:
        key_ref = ray.put(keys)

        def drop(batch: pa.Table) -> pa.Table:
            ks = ray.get(key_ref)
            k = batch.column(key_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return batch.filter(pa.array(~np.isin(k, ks)))

        src = ray.data.read_parquet([f["path"] for f in rewrite])
        rewritten = _write_data_files(
            src.map_batches(drop, batch_format="pyarrow"),
            table_dir, key_col)
    manifest = {
        "snapshot": cur["snapshot"] + 1,
        "parent": cur["snapshot"] or None,
        "operation": "upsert",
        "key_col": key_col,
        "files": keep + rewritten + new_files,
    }
    return _commit(table_dir, manifest)


def _read_keys(path: str, key_col: str) -> np.ndarray:
    import pyarrow.parquet as pq
    return pq.read_table(path, columns=[key_col]) \
        .column(key_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64)


def expire_snapshots(table_dir: str, keep_last: int = 2) -> dict:
    """Retention/GC: drop all but the newest ``keep_last`` manifests
    and delete data files referenced ONLY by expired snapshots.
    Time travel shrinks to the kept window; the CURRENT snapshot is
    never touched. Order is crash-safe: manifests are removed first
    (a crash mid-GC leaves orphaned data files — harmless, retried
    by the next expire — never a kept snapshot missing files).
    Single-writer assumption (as for commits): run GC from the table
    owner; a reader holding an EXPIRED manifest's file list may see
    missing files — the standard lakehouse retention caveat (pick
    keep_last above the longest reader horizon).
    Returns {"kept": [...], "expired": [...], "files_deleted": n}."""
    snaps = list_snapshots(table_dir)
    if len(snaps) <= keep_last:
        return {"kept": snaps, "expired": [], "files_deleted": 0}
    expired, kept = snaps[:-keep_last], snaps[-keep_last:]
    live: set = set()
    for n in kept:
        live.update(f["path"] for f in
                    read_manifest(table_dir, n)["files"])
    dead: set = set()
    for n in expired:
        dead.update(f["path"] for f in
                    read_manifest(table_dir, n)["files"])
    dead -= live
    for n in expired:
        os.remove(_snap_path(table_dir, n))
    deleted = 0
    for p in sorted(dead):
        try:
            os.remove(p)
            deleted += 1
        except FileNotFoundError:
            pass
    return {"kept": kept, "expired": expired,
            "files_deleted": deleted}
