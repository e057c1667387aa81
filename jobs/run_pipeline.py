"""Resumable flagship pipeline job — the `ray job submit` entry point.

    ray job submit -- python jobs/run_pipeline.py \
        --input /data/corpus --output /data/out --partitions 64

Partitioning: the input file list is split into `--partitions` groups;
each partition runs the extract→join→tile pipeline over its files and is
written atomically (tmp+rename parquet + `_lineage/part-N.json` with
rows/bytes/wall-ms/op-chain-hash). A re-run SKIPS partitions whose
lineage record matches the current op-chain hash, so a killed job resumes
where it stopped and produces byte-identical output (kernels are
deterministic; tests/test_resume.py proves the contract at library level).

Partitions are dispatched as Ray tasks (one per partition, each running a
local Dataset pipeline over its file group) so a fixed-size cluster
processes `--parallel` partitions at a time with bounded memory.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def partition_chains(files: list, partitions: int, zoom: int,
                     polygons: int) -> tuple:
    """(groups, per-partition chain hashes). Each chain covers ops +
    params + partition count + that partition's exact file group, so a
    resume with a different --partitions or a changed input dir re-runs
    every partition whose file group changed instead of silently skipping
    against stale output (lineage input_desc alone was never validated)."""
    from geoflow.io.lineage import op_chain_hash
    base = (f"extract_wkt:v1|fused_join_tiles:z{zoom}"
            f"|polys:{polygons}|nparts:{partitions}")
    groups = [files[i::partitions] for i in range(partitions)]
    chains = [op_chain_hash(base + "|files:" + ",".join(grp))
              for grp in groups]
    return groups, chains


def run_partition(pid: int, files: list, out_dir: str, chain: str,
                  polygons_ref, zoom: int) -> dict:
    """Process one partition (runs inside a Ray task)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geoflow.extract import ExtractWkt
    from geoflow.io.lineage import write_partition
    from geoflow.pipelines.flagship import FusedJoinTiles

    t0 = time.monotonic()
    extract = ExtractWkt()
    fused = FusedJoinTiles(polygons_ref, zoom)
    outs = []
    rows_in = 0
    for f in files:
        table = pq.read_table(f, columns=["url", "text"])
        rows_in += table.num_rows
        outs.append(fused(extract(table)))
    result = pa.concat_tables(outs) if outs else None
    if result is None:
        result = pa.table({})
    rec = write_partition(out_dir, pid, result, chain, rows_in,
                          input_desc=json.dumps(files), t_start=t0)
    return rec


def cleanup_orphan_partitions(out_dir: str, partitions: int) -> None:
    """Drop orphan partitions from an earlier run with a larger
    --partitions: their files would otherwise sit beside the new output
    and be read by any consumer globbing out_dir/*.parquet. Lists the
    directory and removes EVERY part/lineage file with pid >= partitions
    (sequential probing would stop at the first gap — empty file groups
    are never written, so prior runs legitimately leave holes)."""
    pat = re.compile(r"^part-(\d{5})\.(?:parquet|json)$")
    for d in (out_dir, os.path.join(out_dir, "_lineage")):
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            m = pat.match(f)
            if m and int(m.group(1)) >= partitions:
                os.remove(os.path.join(d, f))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus parquet dir")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--parallel", type=int, default=0,
                    help="concurrent partitions (default: cluster CPUs)")
    ap.add_argument("--polygons", type=int, default=2000,
                    help="synthetic polygon corpus size")
    ap.add_argument("--zoom", type=int, default=12)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    from geoflow.io.lineage import is_partition_done, read_lineage
    from geoflow.io.synth import make_polygon_table
    from geoflow.join import PolygonIndex

    files = sorted(os.path.join(args.input, f)
                   for f in os.listdir(args.input)
                   if f.endswith(".parquet"))
    groups, chains = partition_chains(files, args.partitions, args.zoom,
                                      args.polygons)

    cleanup_orphan_partitions(args.output, args.partitions)

    todo = [(pid, grp) for pid, grp in enumerate(groups)
            if grp and not is_partition_done(args.output, pid, chains[pid])]
    print(f"partitions: {args.partitions} total, {len(todo)} to run "
          f"({args.partitions - len(todo)} resumed from checkpoint)")

    polygons_ref = ray.put(PolygonIndex(make_polygon_table(args.polygons)))
    task = ray.remote(num_cpus=1)(run_partition)
    max_parallel = args.parallel or int(ray.cluster_resources().get("CPU", 8))

    pending = []
    t_start = time.monotonic()
    done = 0
    for pid, grp in todo:
        pending.append(task.remote(pid, grp, args.output, chains[pid],
                                   polygons_ref, args.zoom))
        if len(pending) >= max_parallel:
            ready, pending = ray.wait(pending, num_returns=1)
            ray.get(ready)
            done += 1
    ray.get(pending)
    done += len(pending)

    recs = read_lineage(args.output)
    total_in = sum(r["rows_in"] for r in recs)
    total_out = sum(r["rows_out"] for r in recs)
    wall = time.monotonic() - t_start
    # throughput counts only rows processed THIS run (a fully-resumed run
    # did no work — reporting corpus_rows/epsilon would be nonsense)
    rows_this_run = sum(r["rows_in"] for r in recs
                        if r["partition"] in {pid for pid, _ in todo})
    print(json.dumps({
        "partitions_run": done, "partitions_total": len(recs),
        "rows_in": total_in, "rows_out": total_out,
        "wall_s": round(wall, 2),
        "rows_per_sec": round(rows_this_run / wall, 1) if wall > 0.01 and rows_this_run else None,
    }))


if __name__ == "__main__":
    main()
