"""Training-data mixture allocation: split a document budget across
sources (languages/domains) by temperature-scaled counts — the
standard multilingual-LM data-mix rule (α-scaled sampling, e.g.
mBERT/XLM-R's p^α with α = 0.5) made INTEGER-exact end to end:

    w_s   = ⌊sqrt(n_s)⌋          (integer weight; IEEE sqrt is
                                  exactly rounded, so floor(sqrt(n))
                                  agrees bit-for-bit across engines
                                  for n ≪ 2^52)
    alloc = ⌊B·w_s / Σw⌋ + 1 for the (B − Σ⌊·⌋) sources with the
            largest integer remainders (B·w_s) mod Σw, ties → source
            ASC (largest-remainder / Hamilton apportionment)

No float ever enters a sum or a hashed column, so (source, n_docs,
alloc) hash-match the SQL oracle exactly and Σalloc == B.

Shape: one small groupby collapses the corpus to source cardinality;
the apportionment runs on the driver over that bounded table (the
tfidf bounded-vocab pattern).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

__all__ = ["mixture_allocation"]


def mixture_allocation(ds, budget: int, source_col: str = "lang"):
    """(source, n_docs, alloc) with Σalloc == budget (requires at
    least one non-empty source)."""
    import ray.data

    counts = ds.groupby(source_col).count()
    names, ns = [], []
    for b in counts.iter_batches(batch_format="pyarrow",
                                 batch_size=None):
        if b.num_rows == 0 or source_col not in b.schema.names:
            continue
        names += b.column(source_col).to_pylist()
        ns += b.column("count()").to_pylist()
    order = sorted(range(len(names)), key=lambda i: names[i])
    names = [names[i] for i in order]
    n = np.asarray(ns, dtype=np.int64)[order]
    w = np.array([int(math.floor(math.sqrt(int(v)))) for v in n],
                 dtype=np.int64)
    tot = int(w.sum())
    if tot == 0:
        raise ValueError("mixture_allocation: all weights zero")
    base = (budget * w) // tot
    rem = (budget * w) % tot
    missing = int(budget - base.sum())
    take = np.lexsort((np.arange(len(rem)), -rem))[:missing]
    alloc = base.copy()
    alloc[take] += 1
    return ray.data.from_arrow(pa.table({
        "source": pa.array(names, pa.string()),
        "n_docs": pa.array(n),
        "alloc": pa.array(alloc)}))
