"""Distributed PageRank over an integer-keyed link graph.

Reference scope: the reference engine has no graph operators — this is
part of the training-data-pipeline layer (link-graph quality signals
for web corpora; Page/Brin/Motwani/Winograd 1999 is the public spec).

Exactness design: the rank update runs in FIXED-POINT INTEGER units
(total mass ``mass``, damping ``num/den``), so every per-iteration
quantity is an int64 and the per-node SUM of in-edge contributions is
order-independent — bit-identical between the Ray pipeline and an
unrolled-SQL DuckDB oracle. A float PageRank would never hash-match
across engines (accumulation order differs; CLAUDE.md oracle-parity
rules). The update rule, in units:

    r0        = mass // n_nodes
    base      = (r0 * (den - num)) // den
    contrib(e=(s,v)) = r(s) // outdeg(s)
    r'(v)     = base + (num * SUM contrib) // den

Dangling nodes (outdeg 0) must not appear in ``edges`` — standard
practice is to add self-loops first; ``synth_edges_batch`` guarantees
outdeg >= 1 by construction.

Scale shape: edges are materialized ONCE (consumed ``iterations``
times; recomputing the lineage per iteration would re-read the input
each round). Two rank-state modes with the repo's usual bound +
escape hatch:

- ``broadcast`` (n_nodes <= max_broadcast_nodes): the rank vector is a
  single int64 numpy array in the object store (``ray.put`` once per
  iteration, zero-copy read in every task); each iteration is one
  map_batches pass emitting per-batch (dst, partial-sum) pairs that are
  either combined on the driver (``reduce="driver"``, O(n_nodes) rows)
  or by a hash groupby (``reduce="groupby"``).
- ``join`` (beyond the bound): ranks live in a Dataset; each iteration
  is edges JOIN ranks ON src -> contrib -> groupby(dst).sum -> nodes
  LEFT JOIN sums. Aggregate->join seams are sanitized with
  drop_schemaless_blocks (Ray 2.49 empty-block poisoning; semijoin.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MASS = 10 ** 12
DAMPING = (17, 20)  # 0.85, the published constant, as an exact ratio


# --------------------------------------------------------------------
# synthetic link graph (shared spec of the numpy kernel and the SQL
# oracle: out-degree 1 + id%3, edge j -> (id*(17+5j) + 3 + 7j) % n)
# --------------------------------------------------------------------

def synth_edges_batch(ids: np.ndarray, n_nodes: int) -> pa.Table:
    """Deterministic test/bench link graph from integer node ids:
    node i emits 1 + (i % 3) edges, edge j targeting
    ``(i*(17+5j) + 3 + 7j) % n_nodes`` (self-loops allowed). Mirrored
    exactly by ``_EDGES_SQL`` below — change both together."""
    ids = np.asarray(ids, dtype=np.int64)
    deg = 1 + (ids % 3)
    src = np.repeat(ids, deg)
    # per-edge j index: 0..deg-1 within each node's run
    ends = np.cumsum(deg)
    j = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) \
        - np.repeat(ends - deg, deg)
    dst = (src * (17 + 5 * j) + 3 + 7 * j) % n_nodes
    return pa.table({"src": src, "dst": dst,
                     "outdeg": np.repeat(deg, deg)})


_EDGES_SQL = """
edges AS (
  SELECT {id} AS src,
         (({id} * (17 + 5 * g.j) + 3 + 7 * g.j) % c.n) AS dst,
         1 + ({id} % 3) AS outdeg
  FROM {table}, c,
       LATERAL (SELECT unnest(range(1 + ({id} % 3)))) AS g(j)
)"""


def pagerank_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                        iterations: int = 4, mass: int = MASS,
                        damping: tuple[int, int] = DAMPING) -> str:
    """Unrolled-CTE DuckDB oracle for ``pagerank`` over the synthetic
    graph — generated from the same constants as the kernels so the two
    sides cannot drift. SUM(BIGINT) is HUGEINT in DuckDB: cast back
    before the damping multiply (CLAUDE.md)."""
    num, den = damping
    parts = [f"WITH c AS (SELECT COUNT(*) AS n, {mass} // COUNT(*) AS r0,"
             f" (({mass} // COUNT(*)) * {den - num}) // {den} AS base"
             f" FROM {table}),",
             _EDGES_SQL.format(table=table, id=id_col) + ",",
             f"r0 AS (SELECT {id_col} AS node, c.r0 AS rank_units"
             f" FROM {table}, c)"]
    for t in range(1, iterations + 1):
        parts.append(f""",
r{t} AS (
  SELECT nd.node,
         c.base + ({num} * COALESCE(s.s, 0)) // {den} AS rank_units
  FROM (SELECT node FROM r0) nd CROSS JOIN c
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(r.rank_units // e.outdeg) AS BIGINT) AS s
    FROM edges e JOIN r{t - 1} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = nd.node
)""")
    parts.append(f"""
SELECT node AS {id_col}, rank_units,
       CAST(rank_units AS DOUBLE) / 1e{len(str(mass)) - 1} AS rank
FROM r{iterations}""")
    return "".join(parts)


def trustrank_oracle_sql(table: str = "documents",
                         id_col: str = "doc_id",
                         iterations: int = 4, mass: int = MASS,
                         damping: tuple[int, int] = DAMPING,
                         seed_mod: int = 17, seed_res: int = 3) -> str:
    """Unrolled-CTE oracle for personalized PageRank / TrustRank over
    the synthetic graph with seed set ``{id : id % seed_mod ==
    seed_res}``: teleport mass is uniform over seeds (r0 and base are
    mass//n_seeds on seeds, 0 elsewhere) — generated from the same
    constants as the kernel."""
    num, den = damping
    seed = f"({{n}} % {seed_mod} = {seed_res})"
    parts = [f"WITH c AS (SELECT COUNT(*) AS n,"
             f" {mass} // COUNT(*) FILTER ({seed.format(n=id_col)})"
             f" AS r0,"
             f" (({mass} // COUNT(*) FILTER ({seed.format(n=id_col)}))"
             f" * {den - num}) // {den} AS base"
             f" FROM {table}),",
             _EDGES_SQL.format(table=table, id=id_col) + ",",
             f"r0 AS (SELECT {id_col} AS node,"
             f" CASE WHEN {seed.format(n=id_col)} THEN c.r0 ELSE 0 END"
             f" AS rank_units FROM {table}, c)"]
    for t in range(1, iterations + 1):
        parts.append(f""",
r{t} AS (
  SELECT nd.node,
         CASE WHEN {seed.format(n='nd.node')} THEN c.base ELSE 0 END
           + ({num} * COALESCE(s.s, 0)) // {den} AS rank_units
  FROM (SELECT node FROM r0) nd CROSS JOIN c
  LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM(r.rank_units // e.outdeg) AS BIGINT) AS s
    FROM edges e JOIN r{t - 1} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = nd.node
)""")
    parts.append(f"""
SELECT node AS {id_col}, rank_units,
       CAST(rank_units AS DOUBLE) / 1e{len(str(mass)) - 1} AS rank
FROM r{iterations}""")
    return "".join(parts)


# --------------------------------------------------------------------
# general-graph helper
# --------------------------------------------------------------------

def attach_outdegree(edges, src_col: str = "src",
                     num_partitions: int | None = None):
    """Attach per-source out-degree to a raw (src, dst) edge Dataset via
    groupby(src).count + hash join (the aggregate side is sanitized —
    hash-agg lineages carry schema-less empty blocks that poison a
    downstream join; see join/semijoin.drop_schemaless_blocks)."""
    import ray

    from geoflow.join.semijoin import drop_schemaless_blocks

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            src_col: b.column(src_col),
            "outdeg": pc_cast_i64(b.column("count()"))})

    deg = edges.groupby(src_col).count().map_batches(
        finish, batch_format="pyarrow")
    deg, keepalive = drop_schemaless_blocks(deg)
    if deg is None:
        return edges.limit(0)
    out = edges.join(deg, join_type="inner",
                     num_partitions=num_partitions, on=(src_col,))
    out._geoflow_keepalive = keepalive
    return out


def pc_cast_i64(col):
    import pyarrow.compute as pc
    return pc.cast(col, pa.int64())


# --------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------

def _batch_partials(ranks: np.ndarray, b: pa.Table, src_col: str,
                    dst_col: str, outdeg_col: str,
                    weight_col: str | None = None) -> pa.Table:
    """Per-batch combiner: int64 contribution sums per distinct dst
    (sort + reduceat — the batch's distinct-dst set is small relative
    to n_nodes, so no n_nodes-length scatter). Weighted graphs:
    contrib = rank * w // out_weight (rank <= mass, so w must stay
    below 2^63 / mass ~ 9e6 for the multiply to fit int64 — checked
    by the caller's docstring contract, not per batch)."""
    src = b.column(src_col).to_numpy(zero_copy_only=False)
    dst = b.column(dst_col).to_numpy(zero_copy_only=False)
    od = b.column(outdeg_col).to_numpy(zero_copy_only=False)
    if weight_col is not None:
        w = b.column(weight_col).to_numpy(zero_copy_only=False)
        contrib = (ranks[src] * w) // od
    else:
        contrib = ranks[src] // od
    order = np.argsort(dst, kind="stable")
    d_s, c_s = dst[order], contrib[order]
    cuts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]]) \
        if len(d_s) else np.empty(0, dtype=np.int64)
    sums = np.add.reduceat(c_s, cuts) if len(d_s) else \
        np.empty(0, dtype=np.int64)
    return pa.table({"dst": d_s[cuts] if len(d_s) else d_s,
                     "partial": sums})


def pagerank(edges, *, n_nodes: int, src_col: str = "src",
             dst_col: str = "dst", outdeg_col: str = "outdeg",
             weight_col: str | None = None,
             iterations: int = 4, mass: int = MASS,
             damping: tuple[int, int] = DAMPING, mode: str = "auto",
             reduce: str = "auto", max_broadcast_nodes: int = 4_000_000,
             num_partitions: int | None = None,
             materialize_edges: bool = True,
             seeds: np.ndarray | None = None):
    """PageRank over ``edges`` (int64 node ids in [0, n_nodes); every
    src row must carry its out-degree — ``attach_outdegree`` for raw
    graphs). Returns a Dataset with columns (node, rank_units, rank);
    ``rank = rank_units / mass`` is a single exact-power-of-ten double
    division, IEEE-identical in numpy and SQL.

    Weighted graphs: pass ``weight_col`` and put the TOTAL out-weight
    per source in ``outdeg_col``; contrib = rank * w // out_weight.
    Weights must satisfy max_weight < 2**63 / mass (~9.2e6 at the
    default mass) so the multiply stays in int64.

    Personalized PageRank / TrustRank (Gyöngyi et al. 2004): pass
    ``seeds`` (int64 node ids) — the teleport distribution becomes
    uniform over the SEED set instead of all nodes (r0 and the
    per-iteration base term are mass//len(seeds) on seeds, 0
    elsewhere). The seed set is broadcast (it is small by
    definition); both rank-state modes support it."""
    import ray
    import ray.data

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError("mode must be auto|broadcast|join")
    if reduce not in ("auto", "driver", "groupby"):
        raise ValueError("reduce must be auto|driver|groupby")
    if mode == "auto":
        mode = "broadcast" if n_nodes <= max_broadcast_nodes else "join"
    num, den = damping
    if seeds is not None:
        seeds = np.unique(np.asarray(seeds, dtype=np.int64))
        if len(seeds) == 0:
            raise ValueError("seeds must be non-empty")
        r0 = mass // len(seeds)
    else:
        r0 = mass // n_nodes
    base = (r0 * (den - num)) // den
    scale = float(mass)

    if materialize_edges:
        edges = edges.materialize()  # consumed `iterations` times

    if mode == "broadcast":
        return _pagerank_broadcast(
            edges, n_nodes=n_nodes, src_col=src_col, dst_col=dst_col,
            outdeg_col=outdeg_col, weight_col=weight_col,
            iterations=iterations, r0=r0,
            base=base, num=num, den=den, scale=scale, reduce=reduce,
            seeds=seeds)
    return _pagerank_join(
        edges, n_nodes=n_nodes, src_col=src_col, dst_col=dst_col,
        outdeg_col=outdeg_col, weight_col=weight_col,
        iterations=iterations, r0=r0, base=base,
        num=num, den=den, scale=scale, num_partitions=num_partitions,
        seeds=seeds)


def _pagerank_broadcast(edges, *, n_nodes, src_col, dst_col, outdeg_col,
                        weight_col, iterations, r0, base, num, den,
                        scale, reduce, seeds=None):
    import ray
    import ray.data

    if reduce == "auto":
        # driver combine is O(blocks * distinct-dst-per-block) rows —
        # right up to a few million nodes; hash groupby beyond.
        reduce = "driver" if n_nodes <= 4_000_000 else "groupby"
    if seeds is None:
        ranks = np.full(n_nodes, r0, dtype=np.int64)
        base_vec = None                    # scalar base everywhere
    else:
        ranks = np.zeros(n_nodes, dtype=np.int64)
        ranks[seeds] = r0
        base_vec = np.zeros(n_nodes, dtype=np.int64)
        base_vec[seeds] = base
    for _ in range(iterations):
        ref = ray.put(ranks)

        def combiner(b: pa.Table, _ref=ref) -> pa.Table:
            return _batch_partials(ray.get(_ref), b, src_col, dst_col,
                                   outdeg_col, weight_col)

        partials = edges.map_batches(combiner, batch_format="pyarrow")
        new = np.full(n_nodes, base, dtype=np.int64) \
            if base_vec is None else base_vec.copy()
        if reduce == "driver":
            acc = np.zeros(n_nodes, dtype=np.int64)
            hit = np.zeros(n_nodes, dtype=bool)
            for b in partials.iter_batches(batch_format="pyarrow"):
                if "dst" not in b.schema.names or b.num_rows == 0:
                    continue
                d = b.column("dst").to_numpy(zero_copy_only=False)
                np.add.at(acc, d, b.column("partial").to_numpy(
                    zero_copy_only=False))
                hit[d] = True
            new[hit] += (num * acc[hit]) // den
        else:
            agg = partials.groupby("dst").sum("partial")
            for b in agg.iter_batches(batch_format="pyarrow"):
                if "dst" not in b.schema.names or b.num_rows == 0:
                    continue
                d = b.column("dst").to_numpy(zero_copy_only=False)
                s = b.column("sum(partial)").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                new[d] += (num * s) // den
        ranks = new
    nodes = np.arange(n_nodes, dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "node": nodes, "rank_units": ranks,
        "rank": ranks.astype(np.float64) / scale}))


def _pagerank_join(edges, *, n_nodes, src_col, dst_col, outdeg_col,
                   weight_col, iterations, r0, base, num, den, scale,
                   num_partitions, seeds=None):
    import ray
    import ray.data

    from geoflow.join.semijoin import drop_schemaless_blocks

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))
    keepalives = []
    # the seed set is small by definition — broadcast it; every task
    # derives its per-node r0/base via sorted-array membership
    seeds_ref = ray.put(seeds) if seeds is not None else None

    def _seed_mask(ids):
        s = ray.get(seeds_ref)
        pos = np.searchsorted(s, ids)
        pos = np.minimum(pos, len(s) - 1)
        return s[pos] == ids

    def init_ranks(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy(zero_copy_only=False)
        if seeds_ref is None:
            u = np.full(len(ids), r0, dtype=np.int64)
        else:
            u = np.where(_seed_mask(ids), r0, 0).astype(np.int64)
        return pa.table({"node": ids, "rank_units": u})

    ranks = ray.data.range(n_nodes).map_batches(
        init_ranks, batch_format="pyarrow").materialize()

    def as_src(b: pa.Table) -> pa.Table:
        return pa.table({src_col: b.column("node"),
                         "__pr_units": b.column("rank_units")})

    def contrib(b: pa.Table) -> pa.Table:
        r = b.column("__pr_units").to_numpy(zero_copy_only=False)
        od = b.column(outdeg_col).to_numpy(zero_copy_only=False)
        if weight_col is not None:
            w = b.column(weight_col).to_numpy(zero_copy_only=False)
            part = (r * w) // od
        else:
            part = r // od
        return pa.table({"dst": b.column(dst_col), "partial": part})

    def _base_of(b: pa.Table):
        if seeds_ref is None:
            return base
        ids = b.column("node").to_numpy(zero_copy_only=False)
        return np.where(_seed_mask(ids), base, 0).astype(np.int64)

    def finish(b: pa.Table) -> pa.Table:
        if "__pr_sum" in b.schema.names:
            import pyarrow.compute as pc
            s = pc.fill_null(pc.cast(b.column("__pr_sum"), pa.int64()), 0)
            s = s.to_numpy(zero_copy_only=False)
        else:  # partition with no sums at all
            s = np.zeros(b.num_rows, dtype=np.int64)
        return pa.table({
            "node": b.column("node"),
            "rank_units": _base_of(b) + (num * s) // den})

    for _ in range(iterations):
        rs, ka = drop_schemaless_blocks(
            ranks.map_batches(as_src, batch_format="pyarrow"))
        keepalives.append(ka)
        j = edges.join(rs, join_type="inner",
                       num_partitions=num_partitions, on=(src_col,))
        sums = j.map_batches(contrib, batch_format="pyarrow") \
            .groupby("dst").sum("partial")

        def rename(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b.column("dst"),
                "__pr_sum": b.column("sum(partial)")})

        sums, ka2 = drop_schemaless_blocks(
            sums.map_batches(rename, batch_format="pyarrow"))
        keepalives.append(ka2)
        if sums is None:  # no edges at all: every node gets base
            nxt = ranks.map_batches(
                lambda b: pa.table({
                    "node": b.column("node"),
                    "rank_units": np.broadcast_to(
                        np.asarray(_base_of(b), dtype=np.int64),
                        (b.num_rows,)).copy()}),
                batch_format="pyarrow")
        else:
            nxt = ranks.select_columns(["node"]).join(
                sums, join_type="left_outer",
                num_partitions=num_partitions, on=("node",)) \
                .map_batches(finish, batch_format="pyarrow")
        ranks = nxt.materialize()  # bound lineage per iteration

    def attach_float(b: pa.Table) -> pa.Table:
        u = b.column("rank_units").to_numpy(zero_copy_only=False)
        return b.append_column("rank", pa.array(
            u.astype(np.float64) / scale))

    out = ranks.map_batches(attach_float, batch_format="pyarrow")
    out._geoflow_keepalive = keepalives
    return out
