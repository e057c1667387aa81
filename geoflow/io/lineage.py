"""Per-partition lineage records + resumable checkpointed output
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

Output layout:
    out_dir/
      part-<pid>.parquet          one file per logical partition
      _lineage/part-<pid>.json    {partition, rows_in, rows_out, bytes,
                                   wall_ms, op_chain_hash, input_desc}

Resume contract: a partition is SKIPPED iff its lineage record exists AND
its recorded op_chain_hash matches the current pipeline hash — so changing
any op invalidates old parts. Kernels must be deterministic (no wall
clock / process-random state in outputs), which this repo enforces
(seeded corpus gen, deterministic hashes in text/dedup.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import time


def op_chain_hash(desc: str) -> str:
    """Stable hash of a pipeline description (op names + params)."""
    return hashlib.blake2b(desc.encode(), digest_size=8).hexdigest()


def lineage_path(out_dir: str, partition: int) -> str:
    return os.path.join(out_dir, "_lineage", f"part-{partition:05d}.json")


def part_path(out_dir: str, partition: int) -> str:
    return os.path.join(out_dir, f"part-{partition:05d}.parquet")


def is_partition_done(out_dir: str, partition: int, chain_hash: str) -> bool:
    lp = lineage_path(out_dir, partition)
    if not os.path.exists(lp) or not os.path.exists(part_path(out_dir, partition)):
        return False
    try:
        with open(lp) as f:
            rec = json.load(f)
        return rec.get("op_chain_hash") == chain_hash
    except (json.JSONDecodeError, OSError):
        return False


def write_partition(out_dir: str, partition: int, table, chain_hash: str,
                    rows_in: int, input_desc: str, t_start: float) -> dict:
    """Atomically write a partition + its lineage record (tmp+rename so a
    crash mid-write never yields a 'done' partition)."""
    import pyarrow.parquet as pq
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    pp = part_path(out_dir, partition)
    tmp = pp + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, pp)
    rec = {
        "partition": partition,
        "rows_in": rows_in,
        "rows_out": table.num_rows,
        "bytes": table.nbytes,
        "wall_ms": round((time.monotonic() - t_start) * 1000.0, 3),
        "op_chain_hash": chain_hash,
        "input_desc": input_desc,
    }
    lp = lineage_path(out_dir, partition)
    with open(lp + ".tmp", "w") as f:
        json.dump(rec, f)
    os.replace(lp + ".tmp", lp)
    return rec


def read_lineage(out_dir: str) -> list:
    ldir = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(ldir):
        return []
    out = []
    for fn in sorted(os.listdir(ldir)):
        if fn.endswith(".json"):
            with open(os.path.join(ldir, fn)) as f:
                out.append(json.load(f))
    return out
