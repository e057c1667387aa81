"""Pivot / crosstab: per-key counts fanned into one column per
declared pivot value (SQL COUNT(*) FILTER (...) columns). The pivot
value set is DECLARED, not discovered — the engine contract every
SQL pivot shares (and what keeps the schema stable for downstream
stages).

Shape: a per-batch partial crosstab (np.unique keys × value-index
bincount — the combine-before-shuffle pattern) so the groupby ships
at most |batch keys| rows per batch, then ONE groupby(key) sum over
the value columns. Values outside the declared set still count into
``n_total``."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pivot_counts(ds, key_col: str, val_col: str, values,
                 prefix: str = "n_"):
    """(key, n_<v1>, ..., n_<vk>, n_total) int64 counts per key."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    values = list(values)
    vcols = [f"{prefix}{v}" for v in values]
    vsort = np.argsort(np.asarray(values, dtype="U64"))
    vals_sorted = np.asarray(values, dtype="U64")[vsort]

    def partial(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = np.asarray(b.column(val_col).to_pylist(), dtype="U64")
        uk, inv = np.unique(k, return_inverse=True)
        pos = np.searchsorted(vals_sorted, v).clip(0, len(values) - 1)
        hit = vals_sorted[pos] == v
        mat = np.zeros((len(uk), len(values)), np.int64)
        np.add.at(mat, (inv[hit], vsort[pos[hit]]), 1)
        cols = {key_col: pa.array(uk)}
        for j, c in enumerate(vcols):
            cols[c] = pa.array(mat[:, j])
        cols["n_total"] = pa.array(
            np.bincount(inv, minlength=len(uk)).astype(np.int64))
        return pa.table(cols)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(*[Sum(c, alias_name=c) for c in
                        vcols + ["n_total"]]))

    def clean(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key_col not in b.schema.names:
            return pa.table(
                {key_col: pa.array([], pa.int64()),
                 **{c: pa.array([], pa.int64())
                    for c in vcols + ["n_total"]}})
        return pa.table({key_col: b.column(key_col),
                         **{c: pc.cast(b.column(c), pa.int64())
                            for c in vcols + ["n_total"]}})

    return agg.map_batches(clean, batch_format="pyarrow")
