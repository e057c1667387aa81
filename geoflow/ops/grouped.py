"""Per-key top-k over a Dataset (grouped top-N).

The training-data-pipeline staple "keep the best k documents per
domain / top events per user". No reference counterpart (its only
ranked op is a global sort — SURVEY §2.6); engine-original like the
dedup/sketch family.

Scale shape: a vectorized per-block PARTIAL top-k first (one lexsort
per batch, no per-key Python) bounds the shuffle to <= k rows per key
per block, then a groupby().map_groups merge re-ranks the reduced
candidate set — Ray 2.49's sort-based map_groups amortizes the many
tiny groups (CLAUDE.md round-3 facts). Determinism: ties broken by
``tie_col`` ascending, so results are stable under retries and block
reordering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["grouped_topk", "grouped_rank", "grouped_cumsum",
           "grouped_budget_filter", "latest_by_key"]


def _topk_table(batch: pa.Table, key_col, val_col, tie_col, k,
                descending) -> pa.Table:
    keys = batch.column(key_col)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    kv = keys.to_numpy(zero_copy_only=False)
    vals = batch.column(val_col).to_numpy(zero_copy_only=False)
    ties = batch.column(tie_col).to_numpy(zero_copy_only=False)
    sv = -vals if descending else vals
    order = np.lexsort((ties, sv, kv))
    sk = kv[order]
    if len(sk) == 0:
        return batch
    first = np.concatenate([[0], np.nonzero(sk[1:] != sk[:-1])[0] + 1])
    counts = np.diff(np.concatenate([first, [len(sk)]]))
    rank = np.arange(len(sk)) - np.repeat(first, counts)
    keep = np.sort(order[rank < k])
    return batch.take(pa.array(keep))


def grouped_topk(ds, key_col: str, val_col: str, k: int,
                 tie_col: str, descending: bool = True):
    """Top ``k`` rows per ``key_col`` ordered by ``val_col``
    (descending by default), ties by ``tie_col`` ascending. Returns the
    winning rows with their original columns."""
    partial = ds.map_batches(
        lambda b: _topk_table(b, key_col, val_col, tie_col, k, descending),
        batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        return _topk_table(group, key_col, val_col, tie_col, k, descending)

    return partial.groupby(key_col).map_groups(final,
                                               batch_format="pyarrow")


def grouped_rank(ds, key_col: str, val_col: str, tie_col: str,
                 out_col: str = "rank", descending: bool = False):
    """0-based rank of every row within its ``key_col`` group,
    ordered by ``val_col`` (ties by ``tie_col`` ascending) — SQL
    ROW_NUMBER()-1 OVER (PARTITION BY key ORDER BY val). Unlike
    grouped_topk there is no partial pruning stage (every row keeps a
    rank), so the shape is one groupby shuffle + an in-group lexsort;
    the per-host politeness scheduler of a crawl frontier
    (wave = rank means one fetch per host per round)."""

    def rank_group(group: pa.Table) -> pa.Table:
        vals = group.column(val_col).to_numpy(zero_copy_only=False)
        ties = group.column(tie_col).to_numpy(zero_copy_only=False)
        sv = -vals if descending else vals
        order = np.lexsort((ties, sv))
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(len(order))
        return group.append_column(out_col, pa.array(rank))

    return ds.groupby(key_col).map_groups(rank_group,
                                          batch_format="pyarrow")


def grouped_cumsum(ds, key_col: str, val_col: str, order_col: str,
                   out_col: str = "cumsum",
                   include_current: bool = True):
    """Per-key running sum of ``val_col`` ordered by ``order_col``
    (ascending, unique within key for determinism) — SQL
    SUM(val) OVER (PARTITION BY key ORDER BY ord). With
    ``include_current=False`` the row's own value is excluded
    (ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING, 0 for the
    first row) — the form a budget filter wants: keep while the
    PRIOR spend is under the cap. One groupby shuffle + an in-group
    sort/cumsum; int64 in, int64 out (order-independent)."""

    def cum_group(group: pa.Table) -> pa.Table:
        o = group.column(order_col).to_numpy(zero_copy_only=False)
        v = group.column(val_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(o, kind="stable")
        cs = np.cumsum(v[order])
        if not include_current:
            cs = cs - v[order]
        out = np.empty(len(o), dtype=np.int64)
        out[order] = cs
        return group.append_column(out_col, pa.array(out))

    return ds.groupby(key_col).map_groups(cum_group,
                                          batch_format="pyarrow")


def grouped_ntile(ds, key_col: str, val_col: str, tie_col: str,
                  k: int, out_col: str = "ntile"):
    """0-based NTILE(k) within each ``key_col`` group ordered by
    (``val_col``, ``tie_col``) — exact SQL NTILE semantics: with
    n = q*k + s rows the first s buckets hold q+1 rows, the rest q
    (fuzz-tested against DuckDB NTILE; note ``rank*k//n`` is NOT
    NTILE — it spreads the s extra rows evenly instead of front-
    loading them). The CCNet-style per-language quantile-bucketing
    primitive. Same shape as grouped_rank: one groupby shuffle + an
    in-group lexsort."""

    def ntile_group(group: pa.Table) -> pa.Table:
        vals = group.column(val_col).to_numpy(zero_copy_only=False)
        ties = group.column(tie_col).to_numpy(zero_copy_only=False)
        n = len(vals)
        order = np.lexsort((ties, vals))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        q, s = divmod(n, k)
        cut = s * (q + 1)
        bucket = np.where(rank < cut, rank // (q + 1),
                          s + (rank - cut) // max(q, 1))
        return group.append_column(out_col,
                                   pa.array(bucket.astype(np.int64)))

    return ds.groupby(key_col).map_groups(ntile_group,
                                          batch_format="pyarrow")


def grouped_budget_filter(ds, key_col: str, val_col: str,
                          order_col: str, budget: int,
                          spent_col: str = "spent_before"):
    """Keep each key's rows, in ``order_col`` order, while the PRIOR
    cumulative ``val_col`` stays under ``budget`` (so one row may
    straddle the cap — the standard token-budget semantics: a doc is
    taken iff the budget wasn't already exhausted). The corpus-mixing
    primitive "at most N tokens per domain"."""
    import pyarrow.compute as pc
    cum = grouped_cumsum(ds, key_col, val_col, order_col,
                         out_col=spent_col, include_current=False)

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b.column(spent_col), budget))

    return cum.map_batches(keep, batch_format="pyarrow")


def latest_by_key(ds, key_col: str, order_cols, value_cols):
    """CDC-style upsert collapse: keep each key's LATEST row by the
    ``order_cols`` tuple (lexicographic; ties impossible when the
    tuple is unique, e.g. (ts, event_id)) — the materialize-current-
    snapshot primitive of log-structured ingestion. One groupby;
    per-group argmax is a single lexsort row pick. Output: key,
    order cols, value cols of the winning row (int64/typed
    passthrough — hash-exact vs the SQL ROW_NUMBER oracle)."""
    order_cols = list(order_cols)
    value_cols = list(value_cols)

    def pick(group: pa.Table) -> pa.Table:
        keys = [group.column(c).to_numpy(zero_copy_only=False)
                for c in reversed(order_cols)]
        i = int(np.lexsort(keys)[-1])
        return group.slice(i, 1).select(
            [key_col] + order_cols + value_cols)

    return ds.groupby(key_col).map_groups(pick,
                                          batch_format="pyarrow")
