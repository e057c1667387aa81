"""Incremental view maintenance (IVM) over the snapshot table layer
(io/snapshots.py): keep a grouped-count materialized view exact
across snapshots by processing ONLY the manifest file diff.

Because snapshot manifests are complete immutable file lists and
data files are content-addressed, the delta between view state at
snapshot A and table state at snapshot B is exactly

    added   = files(B) - files(A)      (weight +1)
    removed = files(A) - files(B)      (weight -1)

and removed files are still on disk (older snapshots own them), so
both sides are readable. Counts maintained with signed weights are
exact under APPEND (adds), COPY-ON-WRITE DELETE (adds the rewritten
files, subtracts the originals) and COMPACTION (adds and removes
equal row multisets — a net zero the equality gate would catch if
the machinery miscounted). This is the only-deltas processing shape
that makes a 100-TB view affordable: update cost is O(changed
files), never O(table).

View state is itself snapshot-versioned: ``state-<snap>.json`` (the
processed file list) + ``state-<snap>.parquet`` (the counts),
written tmp+rename — crash-safe, and re-running an update for an
already-processed snapshot is a no-op. The merge is one distributed
union + groupby-sum of (old state ∪ signed partials); the finalized
state drains to the driver, so this targets bounded-cardinality
category views (lang, host class, …) — a high-cardinality view
should write the merged dataset as partitioned parquet instead.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .snapshots import read_manifest


def _state_ids(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(int(f[6:-5]) for f in os.listdir(state_dir)
                  if f.startswith("state-") and f.endswith(".json"))


def read_view(state_dir: str, snapshot: int | None = None):
    """(snapshot, counts Table) of the latest (or given) view state;
    (0, empty) when no state exists."""
    import pyarrow.parquet as pq

    ids = _state_ids(state_dir)
    if not ids:
        return 0, None
    n = ids[-1] if snapshot is None else snapshot
    return n, pq.read_table(os.path.join(state_dir,
                                         f"state-{n:08d}.parquet"))


def update_view(table_dir: str, state_dir: str, group_col: str,
                snapshot: int | None = None) -> int:
    """Advance the materialized per-``group_col`` count view to the
    table's (latest or given) snapshot by processing only the file
    diff. Returns the snapshot the view now reflects."""
    import pyarrow.parquet as pq

    import ray.data

    man = read_manifest(table_dir, snapshot)
    target = man["snapshot"]
    os.makedirs(state_dir, exist_ok=True)
    prev_id = (_state_ids(state_dir) or [0])[-1]
    if prev_id == target:
        return target  # already current: no-op
    prev_files: list[str] = []
    prev_counts = None
    if prev_id:
        with open(os.path.join(state_dir,
                               f"state-{prev_id:08d}.json")) as f:
            prev_files = json.load(f)["files"]
        _, prev_counts = read_view(state_dir, prev_id)
    cur_files = [f["path"] for f in man["files"]]
    added = [p for p in cur_files if p not in set(prev_files)]
    removed = [p for p in prev_files if p not in set(cur_files)]

    parts = []
    for paths, w in ((added, 1), (removed, -1)):
        if not paths:
            continue
        src = ray.data.read_parquet(paths, columns=[group_col])

        def partial(batch: pa.Table, w=w) -> pa.Table:
            import pyarrow.compute as pc
            enc = pc.dictionary_encode(
                pc.cast(batch.column(group_col),
                        pa.string())).combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cnt = np.bincount(codes,
                              minlength=len(enc.dictionary))
            return pa.table({
                group_col: enc.dictionary,
                "cnt": pa.array(cnt.astype(np.int64) * w)})

        parts.append(src.map_batches(partial,
                                     batch_format="pyarrow"))
    # combine per-block partials on the driver: the view is bounded-
    # cardinality by contract, so this is the standard O(blocks × K)
    # drain — no hash-aggregate actor spin-up per update
    acc: dict = {}
    if prev_counts is not None:
        for g, c in zip(prev_counts.column(group_col).to_pylist(),
                        prev_counts.column("cnt").to_pylist()):
            acc[g] = acc.get(g, 0) + c
    for p in parts:
        for blk in p.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
            if blk.num_rows == 0 or group_col not in blk.schema.names:
                continue
            for g, c in zip(blk.column(group_col).to_pylist(),
                            blk.column("cnt").to_pylist()):
                acc[g] = acc.get(g, 0) + c
    gs = sorted(g for g, c in acc.items() if c != 0)
    out = pa.table({group_col: pa.array(gs, pa.string()),
                    "cnt": pa.array([acc[g] for g in gs],
                                    pa.int64())})

    pqp = os.path.join(state_dir, f"state-{target:08d}.parquet")
    jp = os.path.join(state_dir, f"state-{target:08d}.json")
    tmp = pqp + f".tmp-{os.getpid()}"
    pq.write_table(out, tmp)
    os.replace(tmp, pqp)
    tmpj = jp + f".tmp-{os.getpid()}"
    with open(tmpj, "w") as f:
        json.dump({"files": cur_files, "snapshot": target}, f)
    os.replace(tmpj, jp)
    return target
