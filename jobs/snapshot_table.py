"""Operate a snapshot table (io/snapshots.py) from the command line —
the `ray job submit` surface for the lakehouse layer.

    python jobs/snapshot_table.py append  T --input DIR --key doc_id
    python jobs/snapshot_table.py upsert  T --input DIR --key doc_id
    python jobs/snapshot_table.py delete  T --key doc_id --lo 0 --hi 99
    python jobs/snapshot_table.py compact T [--target-rows N]
    python jobs/snapshot_table.py read    T [--snapshot N] [--lo A --hi B]
                                            [--output DIR]
    python jobs/snapshot_table.py log     T            # snapshot history
    python jobs/snapshot_table.py expire  T --keep-last 2  # retention GC
    python jobs/snapshot_table.py diff    T --a 1 --b 3 --key doc_id

Each mutating command prints one JSON line {"snapshot": n, ...};
`read` streams to partitioned parquet with --output (never a driver
collect), else prints row count + schema. The CLI stays THIN: all
worker-side logic lives in the geoflow package (jobs/ is not on
worker sys.path — CLAUDE.md)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("cmd", choices=["append", "upsert", "delete",
                                    "compact", "read", "log", "diff",
                                    "expire"])
    ap.add_argument("table")
    ap.add_argument("--input")
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--lo", type=int)
    ap.add_argument("--hi", type=int)
    ap.add_argument("--snapshot", type=int)
    ap.add_argument("--target-rows", type=int, default=1 << 20)
    ap.add_argument("--a", type=int)
    ap.add_argument("--keep-last", type=int, default=2)
    ap.add_argument("--b", type=int)
    ap.add_argument("--output")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    from geoflow.io import snapshots as st

    if args.cmd == "expire":
        res = st.expire_snapshots(args.table,
                                  keep_last=args.keep_last)
        print(json.dumps(res))
        return 0

    if args.cmd == "log":
        for n in st.list_snapshots(args.table):
            m = st.read_manifest(args.table, n)
            print(json.dumps({
                "snapshot": n, "operation": m["operation"],
                "parent": m["parent"], "files": len(m["files"]),
                "rows": sum(f["rows"] for f in m["files"])}))
        return 0

    if args.cmd in ("append", "upsert"):
        import ray.data
        ds = ray.data.read_parquet(args.input)
        fn = st.append if args.cmd == "append" else st.upsert
        n = fn(ds, args.table, args.key)
        print(json.dumps({"snapshot": n, "operation": args.cmd}))
        return 0

    if args.cmd == "delete":
        n = st.delete_where(args.table, args.key, args.lo, args.hi)
        print(json.dumps({"snapshot": n, "operation": "delete"}))
        return 0

    if args.cmd == "compact":
        n = st.compact(args.table, target_rows=args.target_rows)
        m = st.read_manifest(args.table, n)
        print(json.dumps({"snapshot": n, "operation": "compact",
                          "files": len(m["files"])}))
        return 0

    if args.cmd == "diff":
        ds = st.snapshot_row_diff(args.table, args.a, args.b,
                                  args.key)
        if args.output:
            ds.write_parquet(args.output)
            print(json.dumps({"rows": ds.count(),
                              "output": args.output}))
        else:
            rows = ds.take_all()
            ins = sum(1 for r in rows if r["delta"] > 0)
            print(json.dumps({"inserts": ins,
                              "deletes": len(rows) - ins}))
        return 0

    # read
    ds = st.read_snapshot(args.table, args.snapshot,
                          key_lo=args.lo, key_hi=args.hi)
    if ds is None:
        print(json.dumps({"rows": 0}))
        return 0
    if args.output:
        ds.write_parquet(args.output)
        print(json.dumps({"rows": ds.count(), "output": args.output}))
    else:
        print(json.dumps({"rows": ds.count(),
                          "schema": [f.name for f in
                                     ds.schema().base_schema]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
