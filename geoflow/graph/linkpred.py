"""Link prediction indices over an undirected graph.

Reference scope: the reference engine has no graph operators — this is
part of the training-data-pipeline layer (suggesting missing links /
related-page mining over web link graphs). Public specs: common
neighbors (Newman 2001), resource allocation (Zhou, Lü & Zhang 2009).

Exactness design: for every candidate pair (u < v) sharing >= min_cn
common neighbors,

    cn(u,v)       = |N(u) ∩ N(v)|                    (int)
    ra_units(u,v) = Σ_{w ∈ N(u)∩N(v)}  K // deg(w)   (int, K = 2^40)

Resource allocation runs in FIXED-POINT integer units (K // deg is
integer division), so the per-pair SUM is order-independent and
hash-matches a SQL oracle op-for-op — a float Σ 1/deg would never
hash across engines (CLAUDE.md oracle-parity rules). Adamic-Adar
(Σ 1/ln deg) is intentionally NOT emitted in the gated columns: ln is
libm-dependent across engines.

Scale shape: wedge enumeration per common-neighbor node via ONE
sort-based groupby(w).map_groups (deg(w) = the group length — no
degree join needed), then one hash groupby over pairs. The quadratic
blowup on mega-degree hubs is the documented skew caveat shared with
triangles.cocitation_counts — cap or sample hub neighborhoods
upstream for crawl graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RA_K = 1 << 40


def link_prediction(edges, src_col: str = "src",
                    dst_col: str = "dst", min_cn: int = 1):
    """(u, v, cn, ra_units) for unordered pairs with >= min_cn common
    neighbors in the undirected, deduplicated graph (self-loops
    dropped)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def undirect(b: pa.Table) -> pa.Table:
        s = b.column(src_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = b.column(dst_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = s != d
        a = np.minimum(s[m], d[m])
        bb = np.maximum(s[m], d[m])
        # incidence rows keyed by the COMMON-NEIGHBOR node w
        return pa.table({"w": np.concatenate([a, bb]),
                         "n": np.concatenate([bb, a])})

    inc = edges.map_batches(undirect, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        v = np.unique(g.column("n").to_numpy(zero_copy_only=False))
        deg = len(v)  # unique neighbors == degree in the dedup graph
        if deg < 2:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "cn": pa.array([], pa.int64()),
                             "ra": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(deg, k=1)
        ra = np.full(len(ii), RA_K // deg, np.int64)
        return pa.table({"u": pa.array(v[ii]), "v": pa.array(v[jj]),
                         "cn": pa.array(np.ones(len(ii), np.int64)),
                         "ra": pa.array(ra)})

    agg = inc.groupby("w").map_groups(pairs, batch_format="pyarrow") \
        .groupby(["u", "v"]).aggregate(Sum("cn"), Sum("ra"))

    def fin(bt: pa.Table) -> pa.Table:
        if "u" not in bt.schema.names or bt.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "cn": pa.array([], pa.int64()),
                             "ra_units": pa.array([], pa.int64())})
        out = pa.table({
            "u": bt.column("u"), "v": bt.column("v"),
            "cn": pc.cast(bt.column("sum(cn)"), pa.int64()),
            "ra_units": pc.cast(bt.column("sum(ra)"), pa.int64())})
        return out.filter(pc.greater_equal(out.column("cn"), min_cn))

    return agg.map_batches(fin, batch_format="pyarrow")


def link_prediction_oracle_sql(edges_sql: str,
                               min_cn: int = 1) -> str:
    """DuckDB oracle: identical undirected dedup, wedge self-join and
    integer RA units. ``edges_sql`` defines (src, dst)."""
    return f"""
WITH raw AS ({edges_sql}),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst),
nb AS (SELECT a AS w, b AS n FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS deg
        FROM nb GROUP BY w)
SELECT n1.n AS u, n2.n AS v,
       CAST(COUNT(*) AS BIGINT) AS cn,
       CAST(SUM({RA_K} // d.deg) AS BIGINT) AS ra_units
FROM nb n1
JOIN nb n2 ON n2.w = n1.w AND n1.n < n2.n
JOIN deg d ON d.w = n1.w
GROUP BY n1.n, n2.n
HAVING COUNT(*) >= {min_cn}"""
