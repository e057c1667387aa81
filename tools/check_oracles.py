"""Local stand-in for the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side, compare row-count + schema +
order-insensitive values. Usage:
python tools/check_oracles.py [sf_dir] [query_name ...]
(extra args restrict the run to the named queries)."""

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res):
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def main(sf_dir, names=()):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    if names:
        # accept space- or comma-separated names; UNKNOWN names are a
        # hard error — a typo (or a made-up flag like "--only") used
        # to silently filter to {} and print "failures: none" (round 4
        # session 3: several gates were no-ops because of this)
        wanted = [w for n in names for w in n.split(",") if w]
        unknown = [w for w in wanted if w not in qs]
        if unknown:
            raise SystemExit(f"unknown query names: {unknown}")
        qs = {k: v for k, v in qs.items() if k in wanted}
    oracles = entrymod.oracle_sql()
    failures = []
    import gc
    import os
    fd_dir = f"/proc/{os.getpid()}/fd"
    for name, fn in qs.items():
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[FAIL-RUN] {name}: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        # one process runs 140+ Ray query executions back-to-back;
        # dataset/block refs pin plasma mmaps + ipc sockets until
        # collected — without this the process exhausts RLIMIT_NOFILE
        # (20k) around query ~130 ("Too many open files", round 4)
        gc.collect()
        nfd = len(os.listdir(fd_dir))
        print(f"[FD] {name}: {nfd}")
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        # "Too many open files" from duckdb is a TRANSIENT system
        # condition while a Ray aggregate's worker fleet spins up
        # (driver-process fds measured at ~52 when it fires, round 4
        # session 3) — retry with backoff before declaring failure
        exp = None
        for attempt in range(4):
            try:
                exp = canon(con.sql(oracles[name]).df())
                break
            except Exception as e:
                if attempt == 3:
                    print(f"[FAIL-ORACLE] {name}: {type(e).__name__}:"
                          f" {e} (fds={len(os.listdir(fd_dir))})")
                    failures.append(name)
                else:
                    import time
                    time.sleep(2.0 * (attempt + 1))
        if exp is None:
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            ok_vals = True
            for c in got.columns:
                a, b = got[c].to_numpy(), exp[c].to_numpy()
                # emulate the driver's value-hash semantics with
                # pd.util.hash_pandas_object: int width is normalized,
                # but float-vs-int, float bit patterns and timestamp
                # UNITS all matter (round-1 red rows were exactly these)
                ha = pd.util.hash_pandas_object(got[c], index=False).to_numpy()
                hb = pd.util.hash_pandas_object(exp[c], index=False).to_numpy()
                same = np.array_equal(ha, hb)
                if not same:
                    print(f"    col {c} hash mismatch "
                          f"(dtypes {a.dtype} vs {b.dtype})")
                if not same:
                    ok_vals = False
                    bad = np.nonzero(~(pd.Series(a).astype(object)
                                       == pd.Series(b).astype(object)).to_numpy())[0][:3]
                    print(f"    col {c} mismatch at rows {bad}:"
                          f" got={a[bad]} exp={b[bad]}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
        if status != "OK":
            failures.append(name)
        print(f"[{status}] {name}: rows {len(got)}/{len(exp)} cols_ok={ok_cols}")
    print("\nfailures:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
                  names=frozenset(sys.argv[2:])))
