"""Persisted inverted index — keyword search as a BUILD-ONCE /
SEARCH-MANY artifact (the 100-TB shape: text/search.py recomputes
term stats per query, which is right for ad-hoc scans but wrong for
a serving index). Same family as vector/pq.py's persisted PQ index.

Layout under ``index_dir``:
  postings/bucket=<B>/...parquet   (th, tf, <key>) posting rows,
                                   hash-partitioned by token bucket
                                   B = token_hash64 % n_buckets
  postings/bucket=-1/...parquet    doclen sentinel rows (th =
                                   _DL_SENTINEL, tf = doc token
                                   count) — the BM25 length
                                   statistic, in the same write
  meta.json                        n_docs, total_tokens, n_buckets

Build is ONE map_batches pass + the partitioned write — no shuffle,
no second corpus read: a document lives in one input row, so
per-batch (doc, token) counts ARE the global posting rows, and the
per-doc lengths ride along as bucket=-1 sentinel rows. Partitioned writes fan out one file per
(block, present-bucket); pick ``n_buckets`` so blocks × buckets
stays within the input-file budget (CLAUDE.md: ≤ ~800 files per
read) — the default 16 suits thousand-block corpora; a consolidating
``repartition``-by-bucket pass is the documented option when a
long-lived serving index should be compacted.

Search reads ONLY the buckets of the query's tokens (directory-level
partition pruning — the point of the artifact), filters to the exact
hashes, and aggregates per document: AND semantics (every distinct
query token present), score = total tf, deterministic (score DESC,
key ASC) top-k. Token identity: hashing.tokenize + hash64, the same
RE2 '[\\p{L}\\p{N}_]+' tokenizer the SQL oracles mirror.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash64, tokenize

__all__ = ["build_keyword_index", "search_keyword_index",
           "search_keyword_index_bm25", "read_doclens"]


# doclen sentinel rows live in the reserved partition bucket=-1
# (token buckets are always >= 0), with th = _DL_SENTINEL and
# tf = the document's token count — the single-shuffle-totals trick
# (CLAUDE.md): one map pass + one partitioned write produce postings
# AND the BM25 length statistic, no second corpus read.
_DL_SENTINEL = np.int64(-(2 ** 63) + 0x1DEC)


def _posting_rows(batch: pa.Table, text_col: str, key_col: str,
                  n_buckets: int) -> pa.Table:
    flat, parent = tokenize(batch.column(text_col))
    th = hash64(flat).view(np.int64)
    order = np.lexsort((th, parent))
    p_s, t_s = parent[order], th[order]
    first = np.empty(len(p_s), dtype=bool)
    if len(p_s):
        first[0] = True
        first[1:] = (p_s[1:] != p_s[:-1]) | (t_s[1:] != t_s[:-1])
    idx = np.flatnonzero(first)
    tf = np.diff(np.r_[idx, len(p_s)]).astype(np.int64)
    keys = pc.take(batch.column(key_col), pa.array(p_s[idx]))
    bucket = (t_s[idx].view(np.uint64)
              % np.uint64(n_buckets)).astype(np.int64)
    dl = np.bincount(parent, minlength=batch.num_rows).astype(np.int64)
    return pa.table({
        "bucket": pa.array(np.concatenate(
            [bucket, np.full(batch.num_rows, -1, dtype=np.int64)])),
        "th": pa.array(np.concatenate(
            [t_s[idx], np.full(batch.num_rows, _DL_SENTINEL)])),
        "tf": pa.array(np.concatenate([tf, dl])),
        key_col: pa.concat_arrays([
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
            else keys,
            batch.column(key_col).combine_chunks()
            if isinstance(batch.column(key_col), pa.ChunkedArray)
            else batch.column(key_col)])})


def read_doclens(index_dir: str):
    """Dataset of (key, dl) per-document token counts (the BM25
    length statistic), read from the reserved bucket=-1 partition."""
    import ray.data
    with open(os.path.join(index_dir, "meta.json")) as f:
        key_col = json.load(f)["key_col"]
    p = os.path.join(index_dir, "postings", "bucket=-1")
    files = [os.path.join(p, f) for f in sorted(os.listdir(p))
             if f.endswith(".parquet")]
    ds = ray.data.read_parquet(files, columns=["tf", key_col])
    return ds.map_batches(
        lambda b: pa.table({key_col: b.column(key_col),
                            "dl": b.column("tf")}),
        batch_format="pyarrow")


def build_keyword_index(ds, index_dir: str, text_col: str = "text",
                        key_col: str = "doc_id",
                        n_buckets: int = 16) -> dict:
    """Build the index under ``index_dir`` (created) in ONE pass over
    ``ds`` — postings and doclens share the partitioned write (see
    _DL_SENTINEL). Returns the meta dict."""
    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(
        lambda b: _posting_rows(b, text_col, key_col, n_buckets),
        batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "postings"),
        partition_cols=["bucket"])
    # meta from the small doclens partition (stats are exact; the
    # tuple is read in one pass over bucket=-1 only)
    import ray.data
    p = os.path.join(index_dir, "postings", "bucket=-1")
    files = [os.path.join(p, f) for f in sorted(os.listdir(p))
             if f.endswith(".parquet")]
    dl = ray.data.read_parquet(files, columns=["tf"])
    total = dl.sum("tf") or 0
    n_docs = dl.count()
    meta = {"n_docs": int(n_docs), "total_tokens": int(total),
            "n_buckets": int(n_buckets), "key_col": key_col}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def search_keyword_index(index_dir: str, query_tokens, k: int = 20):
    """AND-semantics keyword search over a built index: top-k
    documents containing EVERY query token, scored by total tf,
    ties by key ascending. Reads only the query tokens' bucket
    directories."""
    import ray.data

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    key_col = meta["key_col"]
    qh = np.unique(hash64(pa.array([t.lower() for t in query_tokens],
                                   pa.string())))
    nq = len(qh)
    buckets = np.unique(qh % np.uint64(meta["n_buckets"]))
    dirs = [os.path.join(index_dir, "postings", f"bucket={int(b)}")
            for b in buckets]
    # read_parquet accepts directories singly but not in a list —
    # expand to the bucket dirs' files explicitly
    paths = [os.path.join(p, f) for p in dirs if os.path.isdir(p)
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    if not paths or nq == 0:
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64())}))
    post = ray.data.read_parquet(paths, columns=["th", "tf", key_col])
    qh_i64 = np.sort(qh).view(np.int64)

    def hit(b: pa.Table) -> pa.Table:
        th = b.column("th").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(
            qh_i64.view(np.uint64), th.view(np.uint64)), 0, nq - 1)
        m = qh_i64.view(np.uint64)[pos] == th.view(np.uint64)
        return b.filter(pa.array(m))

    from ray.data.aggregate import Count, Sum
    agg = post.map_batches(hit, batch_format="pyarrow") \
        .groupby(key_col).aggregate(Count(), Sum("tf"))

    def finish(b: pa.Table) -> pa.Table:
        if key_col not in b.schema.names or b.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        n = b.column("count()").to_numpy(zero_copy_only=False)
        keep = n == nq            # AND semantics: all tokens present
        return pa.table({
            key_col: b.column(key_col).filter(pa.array(keep)),
            "tf": pc.cast(b.column("sum(tf)"),
                          pa.int64()).filter(pa.array(keep))})

    res = agg.map_batches(finish, batch_format="pyarrow")
    return res.sort(["tf", key_col],
                    descending=[True, False]).limit(k)


def search_keyword_index_bm25(index_dir: str, query_tokens,
                              k: int = 20, k1: float = 1.2,
                              b: float = 0.75):
    """Okapi BM25 over the persisted index: df comes from the query
    tokens' posting buckets (driver-combined partials — at most
    n_tokens × blocks rows, no hash-aggregate spin-up), dl from the
    bucket=-1 sentinel partition via one hash join, and the per-doc
    score sums terms in QUERY-TOKEN ORDER (left-folded Python floats
    inside map_groups — the groupby fixes per-doc row sets, the fold
    fixes association) with idf through math.log (glibc libm,
    bit-identical to DuckDB ln(); numpy's SIMD log is excluded —
    text/search.py bm25_score contract). Only documents containing at
    least one query token are ranked (index semantics — an absent doc
    scores 0 by definition); top-k by (bm25 DESC, key ASC)."""
    import math

    import ray.data

    from geoflow.join.semijoin import drop_schemaless_blocks

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    key_col = meta["key_col"]
    n_docs = meta["n_docs"]
    avgdl = float(meta["total_tokens"]) / n_docs
    toks = []
    for t in query_tokens:             # dedupe, keep first position
        tl = t.lower()
        if tl not in toks:
            toks.append(tl)
    qh = hash64(pa.array(toks, pa.string())).view(np.int64)
    nq = len(qh)
    order = np.argsort(qh.view(np.uint64))
    qh_sorted = qh[order]
    qpos_sorted = np.arange(nq)[order]

    buckets = np.unique(qh.view(np.uint64) % np.uint64(
        meta["n_buckets"]))
    dirs = [os.path.join(index_dir, "postings", f"bucket={int(x)}")
            for x in buckets]
    paths = [os.path.join(p, f) for p in dirs if os.path.isdir(p)
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    empty = pa.table({key_col: pa.array([], pa.int64()),
                      "dl": pa.array([], pa.int64()),
                      "bm25": pa.array([], pa.float64())})
    if not paths or nq == 0:
        return ray.data.from_arrow(empty)

    def hit(bt: pa.Table) -> pa.Table:
        th = bt.column("th").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(
            qh_sorted.view(np.uint64), th.view(np.uint64)), 0, nq - 1)
        m = qh_sorted[pos] == th
        out = bt.filter(pa.array(m))
        return out.append_column(
            "qpos", pa.array(qpos_sorted[pos[m]].astype(np.int64)))

    hits = ray.data.read_parquet(
        paths, columns=["th", "tf", key_col]).map_batches(
        hit, batch_format="pyarrow").materialize()

    # df: per-block partials, driver combine (<= nq rows per block)
    df = np.zeros(nq, dtype=np.int64)
    for bt in hits.map_batches(
            lambda t: pa.table(
                {"qpos": pa.array(
                    np.unique(t.column("qpos").to_numpy(
                        zero_copy_only=False),
                        return_counts=True)[0]),
                 "c": pa.array(np.unique(
                     t.column("qpos").to_numpy(zero_copy_only=False),
                     return_counts=True)[1].astype(np.int64))}),
            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if "qpos" not in bt.schema.names or bt.num_rows == 0:
            continue
        np.add.at(df, bt.column("qpos").to_numpy(zero_copy_only=False),
                  bt.column("c").to_numpy(zero_copy_only=False))
    idf = [math.log((n_docs - int(d) + 0.5) / (int(d) + 0.5))
           for d in df]

    dl_ds, ka = drop_schemaless_blocks(read_doclens(index_dir))
    hs, ka2 = drop_schemaless_blocks(
        hits.map_batches(lambda t: t.select([key_col, "tf", "qpos"]),
                         batch_format="pyarrow"))
    if hs is None:
        return ray.data.from_arrow(empty)
    cpus = 4
    try:
        import ray as _ray
        if _ray.is_initialized():
            cpus = int(_ray.cluster_resources().get("CPU", 4))
    except Exception:
        pass
    nparts = max(2, min(cpus // 4, 16))
    j = hs.join(dl_ds, join_type="inner", num_partitions=nparts,
                on=(key_col,))

    def score_group(g: pa.Table) -> pa.Table:
        qp = g.column("qpos").to_numpy(zero_copy_only=False)
        tf = g.column("tf").to_numpy(zero_copy_only=False)
        dl = int(g.column("dl")[0].as_py())
        norm = k1 * ((1.0 - b) + b * float(dl) / avgdl)
        s = 0.0
        for i in np.argsort(qp, kind="stable"):  # query-token order
            t = float(tf[i])
            s = s + idf[int(qp[i])] * t * (k1 + 1.0) / (t + norm)
        return pa.table({
            key_col: g.column(key_col).slice(0, 1),
            "dl": pa.array([dl]),
            "bm25": pa.array([s], pa.float64())})

    out = j.groupby(key_col).map_groups(score_group,
                                        batch_format="pyarrow")
    out._geoflow_keepalive = [ka, ka2]
    return out.sort(["bm25", key_col],
                    descending=[True, False]).limit(k)


def _positional_rows(batch: pa.Table, text_col: str, key_col: str,
                     n_buckets: int) -> pa.Table:
    """Per-OCCURRENCE posting rows (bucket, th, pos, key): pos is the
    token's index within its document — the phrase-query layer. No
    doclen sentinels (phrase search needs none)."""
    flat, parent = tokenize(batch.column(text_col))
    th = hash64(flat).view(np.int64)
    # position within doc: running index reset at parent change
    # (parent is nondecreasing from list_parent_indices)
    starts = np.r_[0, np.flatnonzero(np.diff(parent)) + 1]
    pos = (np.arange(len(parent), dtype=np.int64)
           - np.repeat(starts, np.diff(np.r_[starts, len(parent)])))
    bucket = (th.view(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
    keys = pc.take(batch.column(key_col), pa.array(parent))
    return pa.table({"bucket": pa.array(bucket), "th": pa.array(th),
                     "pos": pa.array(pos), key_col: keys})


def build_positional_index(ds, index_dir: str, text_col: str = "text",
                           key_col: str = "doc_id",
                           n_buckets: int = 16) -> dict:
    """Positional inverted index: ONE map pass + the hash-partitioned
    parquet write (same layout discipline as build_keyword_index;
    per-occurrence rows, so ~doc-length× larger — the standard
    phrase-index cost)."""
    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(
        lambda b: _positional_rows(b, text_col, key_col, n_buckets),
        batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "postings"),
        partition_cols=["bucket"])
    meta = {"n_buckets": int(n_buckets), "key_col": key_col,
            "positional": True}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def search_phrase_index(index_dir: str, phrase: str):
    """(key, n_hits) of documents containing the consecutive token
    sequence, from a build_positional_index artifact: reads ONLY the
    phrase tokens' bucket directories (partition pruning), filters to
    the exact hashes, then one groupby(key) intersects position sets
    (start+j ∈ positions(token_j)) — overlapping windows count, the
    exact semantics of text/phrase.phrase_counts."""
    import ray.data

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    key_col = meta["key_col"]
    ph_flat, _ = tokenize(pa.array([phrase]))
    p = hash64(ph_flat).view(np.int64)
    m = len(p)
    if m == 0:
        raise ValueError("phrase has no tokens")
    buckets = sorted({int(h % np.uint64(meta["n_buckets"]))
                      for h in p.view(np.uint64)})
    files = []
    for b in buckets:
        d = os.path.join(index_dir, "postings", f"bucket={b}")
        files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                     if f.endswith(".parquet"))
    ds = ray.data.read_parquet(files, columns=["th", "pos", key_col])

    want = np.sort(np.unique(p))

    def prune(b: pa.Table) -> pa.Table:
        th = b.column("th").to_numpy(zero_copy_only=False)
        i = np.searchsorted(want, th).clip(0, len(want) - 1)
        return b.filter(pa.array(want[i] == th))

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def hits(group: pa.Table) -> pa.Table:
        th = group.column("th").to_numpy(zero_copy_only=False)
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        start = np.sort(pos[th == p[0]])
        for j in range(1, m):
            if len(start) == 0:
                break
            pj = pos[th == p[j]]
            start = start[np.isin(start + j, pj)]
        if len(start) == 0:
            return pa.table({key_col: group.column(key_col).slice(0, 0),
                             "n_hits": pa.array([], pa.int64())})
        return pa.table({key_col: group.column(key_col).slice(0, 1),
                         "n_hits": pa.array([len(start)], pa.int64())})

    return pruned.groupby(key_col).map_groups(hits,
                                              batch_format="pyarrow")
