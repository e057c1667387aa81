"""Run any registered pipeline from the command line — the `ray job
submit` entry point for the query surface (`__ray_entry__.queries()`).

    ray job submit -- python jobs/run_query.py flagship \
        --sf-dir /root/testdata/sf0.01 --output /tmp/out

    python jobs/run_query.py --list            # names, one per line
    python jobs/run_query.py bpe_train --sf-dir /root/testdata/sf0.001

With --output the result streams to partitioned parquet (never a
driver collect); without it, row count + schema + the first --head
rows print to stdout (the head is the ONLY driver materialization).
The equivalent reference surface is its REST/benchmark query
execution (SURVEY.md §3.1-3.2); here a query is a named function over
a parquet directory, which is what `ray job submit` wants.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="input table directory (parquet per table)")
    ap.add_argument("--output", default=None,
                    help="write result to this parquet directory "
                         "(streaming); omit to print a preview")
    ap.add_argument("--head", type=int, default=5,
                    help="preview rows when no --output (default 5)")
    ap.add_argument("--list", action="store_true",
                    help="list query names and exit")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.list or not args.name:
        for n in sorted(qs):
            print(n)
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r}; --list shows the "
              f"{len(qs)} available names", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    t0 = time.monotonic()
    res = qs[args.name](args.sf_dir)
    try:
        import pandas as pd
        import pyarrow as pa

        if isinstance(res, pd.DataFrame):
            res = ray.data.from_pandas(res)
        elif isinstance(res, pa.Table):
            res = ray.data.from_arrow(res)
        if args.output:
            res.write_parquet(args.output)
            # row count from parquet footers — never re-run the lineage
            import pyarrow.parquet as pq
            n = sum(pq.read_metadata(os.path.join(args.output, f)).num_rows
                    for f in os.listdir(args.output)
                    if f.endswith(".parquet"))
            out = {"query": args.name, "rows": n, "output": args.output,
                   "wall_s": round(time.monotonic() - t0, 3)}
        else:
            # materialize ONCE: count() + take() on a lazy Dataset each
            # re-execute the whole lineage (CLAUDE.md two-consumers rule)
            res = res.materialize()
            n = res.count()
            out = {"query": args.name, "rows": n,
                   "schema": [f.name for f in res.schema().base_schema],
                   "wall_s": round(time.monotonic() - t0, 3)}
            for r in res.take(args.head):
                print(r)
        print(json.dumps(out))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
