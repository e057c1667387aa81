"""Bucket-partitioned Parquet storage + co-partitioned (shuffle-free)
equi-join.

THE scale lever for repeated joins at 100 TB: when both sides are
stored bucketed by the SAME key hash (``bucket = splitmix64(key) %
n_buckets``, directory per bucket — the layout Hive/Spark call
bucketing and Iceberg calls bucket transforms), an equi-join needs
NO all-to-all exchange at query time: bucket b of A can only match
bucket b of B, so the join runs as one independent task per bucket
pair, each a local hash join over two bounded file sets. Build cost
is paid once at write; every subsequent join of the two tables (or
incremental appends into the same layout) skips the shuffle
entirely — the same build-once/query-many shape as the inverted
index (text/invindex.py) and the spatial index (io/spatialindex.py).

Writer: one file per (Ray block × non-empty bucket) inside the map
tasks (content-hash names, tmp+rename, idempotent). Join: a Dataset
over bucket ids fans out via ``flat_map``-style map_batches — each
task reads ONLY its bucket's files from both sides and joins with
``pyarrow.Table.join`` (buckets are sized by n_buckets to fit a
task's heap; size n_buckets so data_size / n_buckets fits workers).
Key hashing uses text/hashing.mix64, the repo-wide splitmix64."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..text.hashing import mix64


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (mix64(keys.astype(np.int64).view(np.uint64))
            % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds, path: str, key_col: str, n_buckets: int = 16):
    """Write ``ds`` under ``path/bucket=NNNN/`` bucketed by
    splitmix64(key) % n_buckets. Returns per-file (bucket, path,
    rows) stats rows."""
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        b = _bucket_of(k, n_buckets)
        order = np.argsort(b, kind="stable")
        bs = b[order]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.r_[starts[1:], len(bs)]
        out_b, out_p, out_r = [], [], []
        sorted_batch = batch.take(pa.array(order))
        for s, e in zip(starts.tolist(), ends.tolist()):
            bid = int(bs[s])
            part = sorted_batch.slice(s, e - s)
            bd = os.path.join(path, f"bucket={bid:04d}")
            os.makedirs(bd, exist_ok=True)
            sink = pa.BufferOutputStream()
            pq.write_table(part, sink)
            data = sink.getvalue().to_pybytes()
            h = hashlib.blake2b(data, digest_size=12).hexdigest()
            fp = os.path.join(bd, f"part-{h}.parquet")
            if not os.path.exists(fp):
                tmp = fp + f".tmp-{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, fp)
            out_b.append(bid)
            out_p.append(fp)
            out_r.append(part.num_rows)
        return pa.table({"bucket": pa.array(out_b, pa.int64()),
                         "path": pa.array(out_p),
                         "rows": pa.array(out_r, pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None)


def _bucket_files(path: str, bucket: int) -> list[str]:
    bd = os.path.join(path, f"bucket={bucket:04d}")
    if not os.path.isdir(bd):
        return []
    return sorted(os.path.join(bd, f) for f in os.listdir(bd)
                  if f.endswith(".parquet"))


def copartitioned_join(left_path: str, right_path: str,
                       left_key: str, right_key: str,
                       n_buckets: int = 16,
                       left_cols: list[str] | None = None,
                       right_cols: list[str] | None = None,
                       join_type: str = "inner"):
    """Shuffle-free equi-join of two bucket-partitioned tables
    written with the SAME n_buckets: one independent task per
    bucket, each a local pyarrow hash join over its two file sets.
    Returns a Dataset of joined rows."""
    import pyarrow.parquet as pq

    import ray.data

    def _schema_of(path, cols):
        for b in range(n_buckets):
            fs = _bucket_files(path, b)
            if fs:
                s = pq.read_schema(fs[0])
                if cols is not None:
                    s = pa.schema([s.field(c) for c in cols])
                return s
        return None

    ls, rs = _schema_of(left_path, left_cols), \
        _schema_of(right_path, right_cols)
    if ls is None or rs is None:
        raise ValueError("empty bucketed table")
    # typed empty result (metadata-only probe join) so missing-bucket
    # tasks emit schema-carrying empties, not pa.table({})
    empty_out = ls.empty_table().join(
        rs.empty_table(), keys=left_key, right_keys=right_key,
        join_type=join_type)

    buckets = ray.data.from_arrow(pa.table(
        {"bucket": pa.array(np.arange(n_buckets, dtype=np.int64))}))
    # one bucket per task: every row must be its own block
    buckets = buckets.repartition(n_buckets)

    def join_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for bid in batch.column("bucket").to_pylist():
            lf = _bucket_files(left_path, bid)
            rf = _bucket_files(right_path, bid)
            if not lf and not rf:
                continue
            # a side with no files in this bucket joins as a typed
            # empty table so outer joins still emit the other side
            lt = pa.concat_tables([pq.read_table(f, columns=left_cols)
                                   for f in lf]) if lf \
                else ls.empty_table()
            rt = pa.concat_tables([pq.read_table(f,
                                                 columns=right_cols)
                                   for f in rf]) if rf \
                else rs.empty_table()
            outs.append(lt.join(rt, keys=left_key,
                                right_keys=right_key,
                                join_type=join_type))
        if not outs:
            return empty_out
        return pa.concat_tables(outs, promote_options="default")

    return buckets.map_batches(join_bucket, batch_format="pyarrow",
                               batch_size=None)


def rebucket(path: str, out_path: str, key_col: str,
             n_buckets: int, factor: int = 2):
    """Partition evolution WITHOUT a shuffle: grow a bucketed layout
    from B to B·factor buckets. Because bucket assignment is
    ``hash % B``, every row of old bucket b lands in one of the
    ``factor`` new buckets {b, b+B, b+2B, …} (hash % (B·f) ≡ b mod
    B) — so each old bucket splits LOCALLY in one task, no data
    crosses bucket boundaries and no all-to-all runs. This is how a
    bucketed table keeps per-bucket size bounded as it grows at
    100 TB: double the bucket count when buckets outgrow a task's
    heap, paying one linear read+write. Returns per-file stats rows
    (the same shape as write_bucketed)."""
    import pyarrow.parquet as pq

    import ray.data

    nb2 = n_buckets * factor
    os.makedirs(out_path, exist_ok=True)
    buckets = ray.data.from_arrow(pa.table(
        {"bucket": pa.array(np.arange(n_buckets, dtype=np.int64))}))
    buckets = buckets.repartition(n_buckets)

    def split_bucket(batch: pa.Table) -> pa.Table:
        out_b, out_p, out_r = [], [], []
        for bid in batch.column("bucket").to_pylist():
            files = _bucket_files(path, bid)
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files])
            k = t.column(key_col).to_numpy(zero_copy_only=False)
            nb = _bucket_of(k, nb2)
            assert (nb % n_buckets == bid).all(), \
                "rebucket invariant violated"
            for sub in np.unique(nb):
                part = t.filter(pa.array(nb == sub))
                bd = os.path.join(out_path, f"bucket={int(sub):04d}")
                os.makedirs(bd, exist_ok=True)
                sink = pa.BufferOutputStream()
                pq.write_table(part, sink)
                data = sink.getvalue().to_pybytes()
                h = hashlib.blake2b(data,
                                    digest_size=12).hexdigest()
                fp = os.path.join(bd, f"part-{h}.parquet")
                if not os.path.exists(fp):
                    tmp = fp + f".tmp-{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(data)
                    os.replace(tmp, fp)
                out_b.append(int(sub))
                out_p.append(fp)
                out_r.append(part.num_rows)
        return pa.table({"bucket": pa.array(out_b, pa.int64()),
                         "path": pa.array(out_p),
                         "rows": pa.array(out_r, pa.int64())})

    return buckets.map_batches(split_bucket, batch_format="pyarrow",
                               batch_size=None)
