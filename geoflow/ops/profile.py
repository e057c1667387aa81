"""Distributed table profiling: per-column row/null counts and
min/max in ONE streaming pass.

The data-quality step every corpus pipeline runs before training
(column completeness, range sanity, schema drift detection). No
reference equivalent (jena-geo's aggregate surface is per-query
Min/Max/Avg — aggregates/*.java); this is engine infrastructure like
sketches.py.

Scale shape: each batch collapses to ONE tiny row per profiled column
(n, nulls, min, max — computed by pyarrow.compute kernels, zero-copy),
so a 10^12-row table exchanges only batches×columns 40-byte rows into
a groupby over the column-name key (cardinality = #columns). min/max
are order-independent and hash-safe across engines; sums of floats are
deliberately NOT emitted (accumulation order differs — CLAUDE.md
oracle-parity rules), and counts are int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_columns", "profile_batch"]


def profile_batch(batch: pa.Table, columns=None) -> pa.Table:
    """One (col_name, n_rows, n_nulls, min_v, max_v) row per profiled
    column of this batch. Numeric/temporal columns report min/max cast
    to float64; string/binary report min/max BYTE LENGTH (the corpus
    profiling convention — value ordering on text is collation-trapped
    across engines, lengths are not)."""
    cols = list(columns) if columns is not None else batch.column_names
    names, nrows, nnull, mins, maxs = [], [], [], [], []
    for name in cols:
        col = batch.column(name)
        t = col.type
        names.append(name)
        nrows.append(batch.num_rows)
        nnull.append(col.null_count)
        target = None
        if pa.types.is_string(t) or pa.types.is_large_string(t) \
                or pa.types.is_binary(t) or pa.types.is_large_binary(t):
            target = pc.binary_length(col)
        elif pa.types.is_integer(t) or pa.types.is_floating(t) \
                or pa.types.is_boolean(t):
            target = col
        elif pa.types.is_timestamp(t) or pa.types.is_date(t) \
                or pa.types.is_time(t):
            target = pc.cast(col, pa.int64())
        if target is None or batch.num_rows == col.null_count:
            mins.append(None)
            maxs.append(None)
        else:
            mm = pc.min_max(target)
            mins.append(float(mm["min"].cast(pa.float64()).as_py()))
            maxs.append(float(mm["max"].cast(pa.float64()).as_py()))
    return pa.table({
        "col_name": pa.array(names, type=pa.string()),
        "n_rows": pa.array(np.asarray(nrows, dtype=np.int64)),
        "n_nulls": pa.array(np.asarray(nnull, dtype=np.int64)),
        "min_v": pa.array(mins, type=pa.float64()),
        "max_v": pa.array(maxs, type=pa.float64())})


def profile_columns(ds, columns=None, group_by: str | None = None):
    """Dataset → Dataset[(col_name, n_rows, n_nulls, min_v, max_v)],
    one row per column — or per (group, column) with ``group_by`` (the
    per-source / per-language corpus-quality breakdown that drives
    mixing decisions). Per-batch partials + one groupby whose
    cardinality is #columns (× #groups), never #rows."""
    from ray.data.aggregate import Max, Min, Sum

    def partials(batch: pa.Table) -> pa.Table:
        if group_by is None:
            return profile_batch(batch, columns)
        gcol = pc.cast(batch.column(group_by), pa.string())
        gd = pc.dictionary_encode(gcol).combine_chunks()
        # NULL group keys: dictionary_encode yields null indices —
        # fill to -1 so those rows land in a dedicated NULL-group
        # partition (matching SQL GROUP BY, which emits a NULL group)
        # instead of silently vanishing from every `codes == gi` mask.
        codes = gd.indices.fill_null(-1).to_numpy(zero_copy_only=False)
        groups = [(gi, gd.dictionary[gi].as_py())
                  for gi in range(len(gd.dictionary))]
        if (codes == -1).any():
            groups.append((-1, None))
        parts = []
        for gi, gval in groups:
            sub = batch.filter(pa.array(codes == gi))
            p = profile_batch(sub, columns)
            parts.append(p.append_column(
                group_by, pa.array([gval] * p.num_rows,
                                   type=pa.string())))
        if not parts:
            p = profile_batch(batch.slice(0, 0), columns)
            return p.append_column(group_by,
                                   pa.array([], type=pa.string()))
        return pa.concat_tables(parts)

    keys = ["col_name"] if group_by is None else [group_by, "col_name"]
    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby(keys if len(keys) > 1 else keys[0]).aggregate(
            Sum("n_rows"), Sum("n_nulls"),
            Min("min_v"), Max("max_v"))

    def rename(b: pa.Table) -> pa.Table:
        out = {k: b.column(k) for k in keys}
        out["n_rows"] = pc.cast(b.column("sum(n_rows)"), pa.int64())
        out["n_nulls"] = pc.cast(b.column("sum(n_nulls)"), pa.int64())
        out["min_v"] = pc.cast(b.column("min(min_v)"), pa.float64())
        out["max_v"] = pc.cast(b.column("max(max_v)"), pa.float64())
        return pa.table(out)

    return agg.map_batches(rename, batch_format="pyarrow")
