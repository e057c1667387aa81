"""TPC-H-shaped multi-join analytics pipelines (published benchmark
queries re-expressed Ray-Data-first; spec is public, TPC-H v3).

``local_supplier_volume`` is the Q5 shape: revenue per nation from
line items whose CUSTOMER and SUPPLIER share the nation, restricted
to one region and an order-date window. The join plan is sized by
cardinality, not by the textbook order:

  * region/nation are broadcast as plain dicts (a handful of rows —
    never a shuffle);
  * customer and supplier nation keys are broadcast as sorted
    (key, nationkey) arrays via ray.put (dimension side; at TPC-H
    scale these are O(SF·1e5) rows — far below the broadcast bound;
    past that, swap for Dataset.join on the same keys);
  * the single genuinely large join — lineitem ⋈ filtered orders —
    is ONE hash Dataset.join on l_orderkey, the only all-to-all in
    the plan;
  * revenue is pre-aggregated per batch (nation → cents) before one
    tiny groupby-sum.

Exactness: per-row cents = floor(extprice·(1−discount)·100 + 0.5)
is the identical IEEE chain in the SQL oracle; the nation sums are
integer (floats never hash cross-engine — CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geoflow.join.semijoin import cluster_join_partitions

__all__ = ["local_supplier_volume", "ship_priority"]


def _read(sf_dir, name, columns):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet",
                                 columns=columns)


def _collect_pairs(ds, kcol, vcol):
    ks, vs = [], []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0 or kcol not in b.schema.names:
            continue
        ks.append(b.column(kcol).to_numpy(zero_copy_only=False))
        vs.append(b.column(vcol).to_numpy(zero_copy_only=False))
    k = np.concatenate(ks).astype(np.int64)
    v = np.concatenate(vs).astype(np.int64)
    o = np.argsort(k)
    return k[o], v[o]


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_lo: str = "1996-01-01",
                          date_hi: str = "1998-01-01"):
    """(n_name, revenue_cents) — TPC-H Q5 semantics over the testdata
    schema (o_orderdate in [date_lo, date_hi), customer and supplier
    in the same nation of ``region``)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    # ---- tiny dims on the driver
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region",
                ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg[reg.r_name == region].r_regionkey.astype(int))
    nat = nat[nat.n_regionkey.isin(rkeys)]
    nation_name = dict(zip(nat.n_nationkey.astype(int), nat.n_name))
    nset = np.array(sorted(nation_name), dtype=np.int64)

    # ---- dimension broadcasts: custkey→nationkey, suppkey→nationkey
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    ck, cn = _collect_pairs(cust, "c_custkey", "c_nationkey")
    sk, sn = _collect_pairs(supp, "s_suppkey", "s_nationkey")
    dims = ray.put((ck, cn, sk, sn, nset))

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def ord_prep(b: pa.Table) -> pa.Table:
        t = (b.column("o_orderdate").to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        m = (t >= lo) & (t < hi)
        return pa.table({
            "l_orderkey": b.column("o_orderkey").filter(pa.array(m)),
            "o_custkey": b.column("o_custkey").filter(pa.array(m))})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_prep, batch_format="pyarrow")
    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount"])
    joined = line.join(orders, join_type="inner",
                       num_partitions=cluster_join_partitions(),
                       on=("l_orderkey",))

    def partial(b: pa.Table, _d=dims) -> pa.Table:
        empty = pa.table({"nationkey": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if b.num_rows == 0 or "o_custkey" not in b.schema.names:
            return empty
        ck_, cn_, sk_, sn_, nset_ = ray.get(_d)
        ckey = b.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        skey = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cp = np.minimum(np.searchsorted(ck_, ckey), len(ck_) - 1)
        sp = np.minimum(np.searchsorted(sk_, skey), len(sk_) - 1)
        m = (ck_[cp] == ckey) & (sk_[sp] == skey)  # dim-join semantics
        cnat, snat = cn_[cp], sn_[sp]
        m &= cnat == snat
        m &= np.isin(cnat, nset_)
        if not m.any():
            return empty
        ep = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m]
        dc = b.column("l_discount").to_numpy(zero_copy_only=False)[m]
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5) \
            .astype(np.int64)
        nk, inv = np.unique(cnat[m], return_inverse=True)
        return pa.table({
            "nationkey": pa.array(nk),
            "cents": pa.array(np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64))})

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("nationkey").aggregate(Sum("cents"))
    names = ray.put(nation_name)

    def fin(b: pa.Table, _n=names) -> pa.Table:
        if b.num_rows == 0 or "nationkey" not in b.schema.names:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue_cents": pa.array([], pa.int64())})
        nm = ray.get(_n)
        nk = b.column("nationkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([nm[int(k)] for k in nk], pa.string()),
            "revenue_cents": b.column("sum(cents)")})

    return agg.map_batches(fin, batch_format="pyarrow")


def ship_priority(sf_dir: str, segment: str = "BUILDING",
                  date_mid: str = "1997-06-15", k: int = 10):
    """TPC-H Q3 shape: top-``k`` open orders by revenue — customers
    in ``segment``, orders placed before ``date_mid``, line items
    shipped after it. Join plan: the o_custkey→segment test is a
    broadcast membership probe folded into the order filter (customer
    is the dimension side), so the only all-to-all is again
    lineitem ⋈ filtered orders. Output (l_orderkey, o_orderdate,
    revenue_cents), ordered (revenue DESC, orderkey ASC), k rows —
    integer cents as in local_supplier_volume."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = []
    for b in cust.iter_batches(batch_format="pyarrow",
                               batch_size=None):
        if b.num_rows == 0 or "c_custkey" not in b.schema.names:
            continue
        m = pa.compute.equal(b.column("c_mktsegment"), segment)
        keys.append(b.column("c_custkey").filter(m)
                    .to_numpy(zero_copy_only=False))
    ckeys = ray.put(np.sort(np.concatenate(keys).astype(np.int64)))

    mid = np.datetime64(date_mid, "us").astype(np.int64)

    def ord_prep(b: pa.Table, _c=ckeys) -> pa.Table:
        ck = ray.get(_c)
        t = (b.column("o_orderdate").to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        o = b.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.minimum(np.searchsorted(ck, o), len(ck) - 1)
        m = (t < mid) & (ck[pos] == o)
        return pa.table({
            "l_orderkey": b.column("o_orderkey").filter(pa.array(m)),
            "o_date": pa.array(t[m])})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_prep, batch_format="pyarrow")

    def line_prep(b: pa.Table) -> pa.Table:
        t = (b.column("l_shipdate").to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        m = t > mid
        ep = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m]
        dc = b.column("l_discount").to_numpy(zero_copy_only=False)[m]
        return pa.table({
            "l_orderkey": b.column("l_orderkey").filter(pa.array(m)),
            "cents": pa.array(np.floor(ep * (1.0 - dc) * 100.0 + 0.5)
                              .astype(np.int64))})

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_shipdate", "l_extendedprice",
                  "l_discount"]) \
        .map_batches(line_prep, batch_format="pyarrow")
    joined = line.join(orders, join_type="inner",
                       num_partitions=cluster_join_partitions(),
                       on=("l_orderkey",))

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_date" not in b.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "o_date": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        return b.select(["l_orderkey", "o_date", "cents"])

    agg = joined.map_batches(part, batch_format="pyarrow") \
        .groupby(["l_orderkey", "o_date"]).aggregate(Sum("cents"))

    rows = []
    for b in agg.iter_batches(batch_format="pyarrow",
                              batch_size=None):
        if b.num_rows == 0 or "l_orderkey" not in b.schema.names:
            continue
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        od = b.column("o_date").to_numpy(zero_copy_only=False)
        cents = b.column("sum(cents)").to_numpy(zero_copy_only=False)
        sel = np.lexsort((okey, -cents))[:k]   # per-block prune
        rows.append((okey[sel], od[sel], cents[sel]))
    if rows:
        okey = np.concatenate([r[0] for r in rows])
        od = np.concatenate([r[1] for r in rows])
        cents = np.concatenate([r[2] for r in rows])
        sel = np.lexsort((okey, -cents))[:k]
    else:
        okey = od = cents = np.empty(0, np.int64)
        sel = np.empty(0, np.int64)
    return ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array(okey[sel].astype(np.int64)),
        "o_orderdate": pa.array(od[sel].astype("datetime64[us]"),
                                pa.timestamp("us")),
        "revenue_cents": pa.array(cents[sel].astype(np.int64))}))
