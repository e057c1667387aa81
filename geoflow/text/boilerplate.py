"""Per-host boilerplate removal — the host-CONDITIONAL sibling of
text/linededup.py: a line is boilerplate iff it occurs in a large
FRACTION of its own host's documents (nav bars, footers, cookie
banners are per-site templates; a global count would either miss
small hosts or nuke legitimately common sentences). Public recipe:
CCNet/RefinedWeb-style template stripping keyed by site.

Decision rule (integer-exact, mirrored by the SQL oracle):
a (host, line) pair is dropped iff

    docs_with_line >= min_count  AND
    docs_with_line * frac_den >= host_docs * frac_num

with ``frac = (frac_num, frac_den)`` defaulting to 1/2.

Scale shape (one shuffle, no corpus re-shuffle):

- Pass 1: per batch, lines are split/trimmed/hashed vectorized
  (linededup._line_arrays + hashing.hash64); distinct (doc, line)
  pairs collapse to (host_hash, line_hash, partial_doc_count) rows,
  and each doc also emits one (host_hash, SENTINEL) row — so a SINGLE
  groupby-sum shuffle yields both per-(host,line) doc counts and
  per-host doc totals (the totals ride along as sentinel rows instead
  of paying a second hash-aggregate pass; CLAUDE.md: don't add
  "cheap" count passes).
- Only candidate rows (count >= min_count — the repeated subset) plus
  the host-total rows reach the driver; the drop set is broadcast as
  ONE sorted uint64 array of composite keys mix64(host_hash +
  line_hash) (uint64-sorted per the repo's searchsorted rule).
  Corpora whose boilerplate set exceeds broadcast capacity use the
  same exploded-rows anti-filter escape hatch as linededup
  (join/semijoin.partitioned_key_filter) — documented, not default.
- Pass 2: pure map_batches strip; reassembly is ListArray offsets +
  binary_join, no Python loop.

Identity is 64-bit hash equality (the engine-wide documented
collision exposure); the sentinel row is one hash value
(collision probability 2^-64 per host).

Semantics (shared with linededup): line = '\n' unit, identity =
whitespace-trimmed form, empty lines never counted / never dropped,
docs left with zero lines disappear.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash64, mix64
from .linededup import _drop_cache_get, _line_arrays

__all__ = ["host_boilerplate_keys", "strip_host_boilerplate",
           "host_boilerplate_dedup"]

_SENTINEL = np.int64(-(2 ** 63) + 0x5EED)


def _host_pair_partials(batch: pa.Table, text_col: str, host_col: str,
                        sep: str) -> pa.Table:
    """(hk, lh, c) rows: batch-local distinct-doc counts per
    (host_hash, line_hash) + one sentinel row per distinct host
    carrying the batch's doc count for that host."""
    trimmed, _, parent = _line_arrays(batch.column(text_col), sep)
    hk_doc = hash64(batch.column(host_col)).view(np.int64)
    lens = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
    nz = lens > 0
    d = parent[nz]
    lh = hash64(trimmed).view(np.int64)[nz]
    # distinct (doc, line) pairs
    order = np.lexsort((lh, d))
    d_s, l_s = d[order], lh[order]
    first = np.empty(len(d_s), dtype=bool)
    if len(d_s):
        first[0] = True
        first[1:] = (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])
    du, lu = d_s[first], l_s[first]
    hku = hk_doc[du]
    # count distinct docs per (hk, lh)
    o2 = np.lexsort((lu, hku))
    a, b = hku[o2], lu[o2]
    cut = np.empty(len(a), dtype=bool)
    if len(a):
        cut[0] = True
        cut[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    idx = np.flatnonzero(cut)
    cnt = np.diff(np.r_[idx, len(a)]).astype(np.int64)
    # per-host doc totals (sentinel rows)
    hu, hc = np.unique(hk_doc, return_counts=True)
    return pa.table({
        "hk": pa.array(np.concatenate([a[idx], hu])),
        "lh": pa.array(np.concatenate(
            [b[idx], np.full(len(hu), _SENTINEL)])),
        "c": pa.array(np.concatenate([cnt, hc.astype(np.int64)]))})


def host_boilerplate_keys(ds, text_col: str = "text",
                          host_col: str = "host", min_count: int = 2,
                          frac: tuple[int, int] = (1, 2),
                          sep: str = "\n"):
    """ray.ObjectRef to the SORTED uint64 composite-key array
    mix64(host_hash + line_hash) of (host, line) pairs meeting the
    boilerplate rule. One 24-byte-row shuffle; only the repeated
    subset + one row per host reach the driver."""
    import ray
    from ray.data.aggregate import Sum

    fnum, fden = frac

    def partials(batch: pa.Table) -> pa.Table:
        return _host_pair_partials(batch, text_col, host_col, sep)

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby(["hk", "lh"]).aggregate(Sum("c"))
    tot_h, tot_n = [], []
    cand = []
    for b in agg.iter_batches(batch_format="pyarrow",
                              batch_size=65536):
        if b.num_rows == 0 or "hk" not in b.schema.names:
            continue  # hash-agg empty partitions emit 0-column blocks
        hk = b.column("hk").to_numpy(zero_copy_only=False)
        lh = b.column("lh").to_numpy(zero_copy_only=False)
        c = b.column("sum(c)").to_numpy(
            zero_copy_only=False).astype(np.int64)
        is_tot = lh == _SENTINEL
        tot_h.append(hk[is_tot])
        tot_n.append(c[is_tot])
        keep = ~is_tot & (c >= min_count)
        cand.append((hk[keep], lh[keep], c[keep]))
    th = np.concatenate(tot_h) if tot_h else np.empty(0, np.int64)
    tn = np.concatenate(tot_n) if tot_n else np.empty(0, np.int64)
    o = np.argsort(th.view(np.uint64))
    th, tn = th[o], tn[o]
    drops = []
    for hk, lh, c in cand:
        if not len(hk):
            continue
        pos = np.searchsorted(th.view(np.uint64), hk.view(np.uint64))
        n = tn[pos]  # every candidate's host has a sentinel row
        hit = c * fden >= n * fnum
        drops.append(mix64(hk[hit].view(np.uint64)
                           + lh[hit].view(np.uint64)))
    allk = np.concatenate(drops) if drops else np.empty(0, np.uint64)
    return ray.put(np.sort(allk))


def strip_host_boilerplate(ds, drop_ref, text_col: str = "text",
                           host_col: str = "host",
                           out_col: str = "text_clean",
                           sep: str = "\n"):
    """map_batches strip pass: composite-key membership against the
    broadcast drop set (per-worker cache); docs with zero surviving
    lines disappear. ``out_col == text_col`` replaces in place."""

    def strip(batch: pa.Table) -> pa.Table:
        drop = _drop_cache_get(drop_ref)
        trimmed, flat, parent = _line_arrays(
            batch.column(text_col), sep)
        lens = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
        hk_doc = hash64(batch.column(host_col))
        ck = mix64(hk_doc[parent] + hash64(trimmed))
        if len(drop):
            pos = np.clip(np.searchsorted(drop, ck),
                          0, len(drop) - 1)
            hit = (drop[pos] == ck) & (lens > 0)
        else:
            hit = np.zeros(len(ck), dtype=bool)
        keep = ~hit
        kept_flat = flat.filter(pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        counts = np.bincount(parent[keep], minlength=batch.num_rows)
        offsets = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(counts)]).astype(
                np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), kept_flat)
        joined = pc.binary_join(lists, sep)
        if out_col == text_col:
            i = batch.schema.get_field_index(text_col)
            out = batch.set_column(i, text_col, joined)
        else:
            out = batch.append_column(out_col, joined)
        return out.filter(pa.array(counts > 0))

    return ds.map_batches(strip, batch_format="pyarrow")


def host_boilerplate_dedup(ds, text_col: str = "text",
                           host_col: str = "host", min_count: int = 2,
                           frac: tuple[int, int] = (1, 2),
                           out_col: str = "text_clean",
                           sep: str = "\n"):
    """Full pipeline: count shuffle -> broadcast drop set -> strip.
    ``ds`` executes twice (materialize it or pass a re-readable
    source, as with every multi-pass stage in this engine)."""
    ref = host_boilerplate_keys(ds, text_col=text_col,
                                host_col=host_col,
                                min_count=min_count, frac=frac,
                                sep=sep)
    return strip_host_boilerplate(ds, ref, text_col=text_col,
                                  host_col=host_col, out_col=out_col,
                                  sep=sep)
