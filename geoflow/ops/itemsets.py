"""Market-basket frequent itemsets over event streams (Agrawal &
Srikant 1994, apriori counting layer): supports of item PAIRS and
TRIPLES within per-key baskets (a user's distinct event types, a
session's distinct hosts, ...).

Shape: ONE groupby(basket).map_groups deduplicates items inside the
basket (np.unique) and fans out the sorted combinations — the basket
side never leaves its group — then one groupby(items).count().sum
collapses to supports. Pair fan-out is |items|²/2 per basket; apriori
pruning (only items above min_support enter pairs) is the documented
scale lever and available via ``prune_items``.

Exactness: supports are integer counts; item ordering inside a
combination is lexicographic string order — identical to SQL
``a.item < b.item`` self-join ordering."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def frequent_pairs(ds, basket_col: str = "user_id",
                   item_col: str = "event_type",
                   min_support: int = 2,
                   prune_items: set | None = None):
    """(item_a, item_b, support) for item_a < item_b, support =
    number of baskets containing both, filtered to
    support >= min_support."""

    def pairs(group: pa.Table) -> pa.Table:
        items = np.unique(
            np.asarray(group.column(item_col).to_pylist(), dtype="U64"))
        if prune_items is not None:
            items = items[np.isin(items,
                                  np.asarray(sorted(prune_items)))]
        n = len(items)
        if n < 2:
            return pa.table({"item_a": pa.array([], pa.string()),
                             "item_b": pa.array([], pa.string())})
        ia, ib = np.triu_indices(n, k=1)
        return pa.table({"item_a": pa.array(items[ia]),
                         "item_b": pa.array(items[ib])})

    cnt = (ds.groupby(basket_col)
           .map_groups(pairs, batch_format="pyarrow")
           .groupby(["item_a", "item_b"]).count())

    def fin(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if b.num_rows == 0 or "item_a" not in b.schema.names:
            return pa.table({"item_a": pa.array([], pa.string()),
                             "item_b": pa.array([], pa.string()),
                             "support": pa.array([], pa.int64())})
        t = pa.table({"item_a": b.column("item_a"),
                      "item_b": b.column("item_b"),
                      "support": pc.cast(b.column("count()"),
                                         pa.int64())})
        return t.filter(pc.greater_equal(t.column("support"),
                                         pa.scalar(min_support)))

    return cnt.map_batches(fin, batch_format="pyarrow")


def frequent_triples(ds, basket_col: str = "user_id",
                     item_col: str = "event_type",
                     min_support: int = 2):
    """(item_a, item_b, item_c, support) for a < b < c — the apriori
    level-3 counting pass (run after pair pruning at scale)."""
    from itertools import combinations

    def triples(group: pa.Table) -> pa.Table:
        items = np.unique(
            np.asarray(group.column(item_col).to_pylist(), dtype="U64"))
        combos = list(combinations(items.tolist(), 3))
        return pa.table({
            "item_a": pa.array([c[0] for c in combos], pa.string()),
            "item_b": pa.array([c[1] for c in combos], pa.string()),
            "item_c": pa.array([c[2] for c in combos], pa.string())})

    cnt = (ds.groupby(basket_col)
           .map_groups(triples, batch_format="pyarrow")
           .groupby(["item_a", "item_b", "item_c"]).count())

    def fin(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if b.num_rows == 0 or "item_a" not in b.schema.names:
            return pa.table({"item_a": pa.array([], pa.string()),
                             "item_b": pa.array([], pa.string()),
                             "item_c": pa.array([], pa.string()),
                             "support": pa.array([], pa.int64())})
        t = b.drop_columns(["count()"]).append_column(
            "support", pc.cast(b.column("count()"), pa.int64()))
        return t.filter(pc.greater_equal(t.column("support"),
                                         pa.scalar(min_support)))

    return cnt.map_batches(fin, batch_format="pyarrow")
