"""Link reciprocity — the classic link-spam / community signal over
a (host) link graph: a directed edge (a, b) is *reciprocated* iff
(b, a) also exists; a host whose outlinks are mostly reciprocated is
link-exchange-shaped. Public spec: reciprocity in directed networks
(Garlaschelli & Loffredo 2004) applied to web host graphs.

Scale shape: ONE groupby shuffle on the undirected pair key
``mix64(min_hash * PRIME + max_hash)`` (64-bit collision exposure —
the engine-wide documented tradeoff); each group holds the (at most
two) directions of one undirected pair, so marking reciprocation and
deduping duplicate directed edges is a tiny in-group pass. Per-host
ratios are one further small aggregate over the distinct-edge rows.
Self-loops are dropped (reciprocity is undefined for them)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geoflow.text.hashing import mix64

__all__ = ["edge_reciprocity", "host_reciprocity"]

_P = np.uint64(0x9E3779B97F4A7C15)


def _pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lo = np.minimum(a, b).view(np.uint64)
    hi = np.maximum(a, b).view(np.uint64)
    return mix64(lo * _P + hi).view(np.int64)


def edge_reciprocity(edges, src_col: str = "src",
                     dst_col: str = "dst"):
    """Distinct directed edges annotated with ``reciprocated``:
    (src, dst, reciprocated). Duplicate directed edges collapse;
    self-loops are dropped."""

    def prep(b: pa.Table) -> pa.Table:
        s = b.column(src_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = b.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"k": pa.array(_pair_key(s, d)),
                         "src": pa.array(s), "dst": pa.array(d)})

    def mark(g: pa.Table) -> pa.Table:
        s = g.column("src").to_numpy(zero_copy_only=False)
        d = g.column("dst").to_numpy(zero_copy_only=False)
        # dedupe duplicate directed edges inside the pair group
        fwd = s < d
        both = fwd.any() and (~fwd).any()
        order = np.lexsort((d, s))
        ss, ds = s[order], d[order]
        keep = np.flatnonzero(
            np.r_[True, (ss[1:] != ss[:-1]) | (ds[1:] != ds[:-1])])
        return pa.table({
            "src": pa.array(ss[keep]), "dst": pa.array(ds[keep]),
            "reciprocated": pa.array(
                np.full(len(keep), bool(both)))})

    return edges.map_batches(prep, batch_format="pyarrow") \
        .groupby("k").map_groups(mark, batch_format="pyarrow")


def host_reciprocity(edges, src_col: str = "src",
                     dst_col: str = "dst"):
    """(host, outdeg, reciprocated, ratio) per source node over the
    distinct directed edges: ratio = reciprocated / outdeg (a single
    int/int double division — oracle-exact)."""
    from ray.data.aggregate import Count, Sum

    marked = edge_reciprocity(edges, src_col, dst_col)

    def as_int(b: pa.Table) -> pa.Table:
        if "src" not in b.schema.names or b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "r": pa.array([], pa.int64())})
        return pa.table({
            "src": b.column("src"),
            "r": pc.cast(b.column("reciprocated"), pa.int64())})

    agg = marked.map_batches(as_int, batch_format="pyarrow") \
        .groupby("src").aggregate(Count(), Sum("r"))

    def finish(b: pa.Table) -> pa.Table:
        if "src" not in b.schema.names or b.num_rows == 0:
            return pa.table({"host": pa.array([], pa.int64()),
                             "outdeg": pa.array([], pa.int64()),
                             "reciprocated": pa.array([], pa.int64()),
                             "ratio": pa.array([], pa.float64())})
        n = b.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        r = pc.fill_null(pc.cast(b.column("sum(r)"), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "host": b.column("src"),
            "outdeg": pa.array(n),
            "reciprocated": pa.array(r),
            "ratio": pa.array(r.astype(np.float64) / n)})

    return agg.map_batches(finish, batch_format="pyarrow")
