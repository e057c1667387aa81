"""Persisted inverted index — keyword search as a BUILD-ONCE /
SEARCH-MANY artifact (the 100-TB shape: text/search.py recomputes
term stats per query, which is right for ad-hoc scans but wrong for
a serving index). Same family as vector/pq.py's persisted PQ index.

Layout under ``index_dir``:
  postings/bucket=<B>/...parquet   (th, tf, <key>) posting rows,
                                   hash-partitioned by token bucket
                                   B = token_hash64 % n_buckets
  doclens/...parquet               (<key>, dl) per-doc token counts
                                   (the BM25 length statistic)
  meta.json                        n_docs, total_tokens, n_buckets

Build is ONE map_batches pass + the partitioned write — no shuffle:
a document lives in one input row, so per-batch (doc, token) counts
ARE the global posting rows. Partitioned writes fan out one file per
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

__all__ = ["build_keyword_index", "search_keyword_index"]


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
    return pa.table({"bucket": pa.array(bucket),
                     "th": pa.array(t_s[idx]),
                     "tf": pa.array(tf),
                     key_col: keys})


def _doclen_rows(batch: pa.Table, text_col: str,
                 key_col: str) -> pa.Table:
    _, parent = tokenize(batch.column(text_col))
    dl = np.bincount(parent, minlength=batch.num_rows).astype(np.int64)
    return pa.table({key_col: batch.column(key_col),
                     "dl": pa.array(dl)})


def build_keyword_index(ds, index_dir: str, text_col: str = "text",
                        key_col: str = "doc_id",
                        n_buckets: int = 16) -> dict:
    """Build the index under ``index_dir`` (created). ``ds`` executes
    twice (postings + doclens) — pass a re-readable source. Returns
    the meta dict."""
    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(
        lambda b: _posting_rows(b, text_col, key_col, n_buckets),
        batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "postings"),
        partition_cols=["bucket"])
    dl = ds.map_batches(
        lambda b: _doclen_rows(b, text_col, key_col),
        batch_format="pyarrow")
    dl.write_parquet(os.path.join(index_dir, "doclens"))
    import ray.data
    stats = ray.data.read_parquet(
        os.path.join(index_dir, "doclens"), columns=["dl"]).sum("dl")
    n_docs = ray.data.read_parquet(
        os.path.join(index_dir, "doclens")).count()
    meta = {"n_docs": int(n_docs), "total_tokens": int(stats),
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
