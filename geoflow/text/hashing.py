"""Vectorized deterministic string hashing over Arrow buffers.

The hot inner loop of every text stage (MinHash, SimHash, langid,
stopword ratios) is "hash each token". Round 1 did one Python
hashlib call per token per doc — at 100 TB that dominates total cost.
This module hashes an entire flat Arrow string array with numpy only:
a byte-position loop (≤ `cap` iterations, each vectorized over all
strings still active at that position) computing an FNV-style
polynomial hash, finished with a splitmix64 avalanche.

Determinism: no Python hash(), no per-process state — identical output
across Ray workers and task retries (required by the lineage/resume
design, SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_FNV = np.uint64(0x100000001B3)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 avalanche (public domain constant set)."""
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _offsets_data(arr: pa.Array):
    """(int64 start offsets, int64 lengths, uint8 data view) of a flat
    Arrow string/binary array, honoring the array's slice offset."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    odt = np.int64 if (pa.types.is_large_string(t)
                       or pa.types.is_large_binary(t)) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[arr.offset: arr.offset + len(arr) + 1]
    off = off.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    return off[:-1], off[1:] - off[:-1], data


def hash64(arr, cap: int = 64) -> np.ndarray:
    """uint64 hash per string: polynomial FNV over the first `cap` UTF-8
    bytes, length mixed in, splitmix64 finish. Nulls hash like "".

    `cap` bounds the byte-position loop for pathological megabyte
    "tokens" (garbage text); two strings sharing their first `cap` bytes
    AND length collide — irrelevant at cap=64 for natural-language
    tokens."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    starts, lens, data = _offsets_data(arr)
    h = mix64(lens.astype(np.uint64) + _GOLD)
    m = int(min(lens.max(initial=0), cap))
    for i in range(m):
        active = lens > i
        if not active.any():
            break
        idx = np.nonzero(active)[0]
        h[idx] = (h[idx] * _FNV) ^ data[starts[idx] + i]
    return mix64(h)


# token pattern: complement split of unicode word chars. RE2 (used by both
# Arrow and DuckDB) supports \p classes, so an oracle SQL tokenizer can
# reproduce this byte-for-byte.
TOKEN_SPLIT = r"[^\p{L}\p{N}_]+"
TOKEN_MATCH = r"[\p{L}\p{N}_]+"


def tokenize(texts, lower: bool = True):
    """(flat token StringArray, int64 doc index per token). Tokens are
    maximal unicode-word-char runs; empty tokens (leading/trailing
    separators) are dropped. Fully Arrow-vectorized (RE2)."""
    s = pc.cast(texts, pa.string())
    if lower:
        s = pc.utf8_lower(s)
    lists = pc.split_pattern_regex(s, pattern=TOKEN_SPLIT)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep = lens > 0
    if not keep.all():
        ki = np.nonzero(keep)[0]
        flat = flat.take(pa.array(ki, type=pa.int64()))
        parent = parent[ki]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, parent.astype(np.int64)


def filter_to_collision_buckets(buckets_ds, bucket_col="bucket",
                                materialize=True):
    """Keep only rows whose bucket holds ≥ 2 rows.

    groupby(bucket).map_groups pays one Python call per group — and LSH
    bucket tables are ~n_docs × n_bands groups, almost all singletons.
    This pre-pass counts buckets with a vectorized aggregate, collects
    ONLY the collision bucket ids (tiny: true near-dups + hash
    collisions), broadcasts them sorted, and semi-joins the bucket rows
    against them — so the expensive per-group stage runs on real
    collisions only.

    The bucket table is consumed twice (count pass + filter pass);
    materialize=True keeps the ~16-byte/row table in the object store
    instead of re-running the signature lineage. At extreme scale
    (bucket table beyond object-store capacity) pass materialize=False
    to trade a signature recompute for memory."""
    import ray

    if materialize:
        buckets_ds = buckets_ds.materialize()
    counts = buckets_ds.groupby(bucket_col).count()

    def hot(batch: pa.Table) -> pa.Table:
        c = batch.column("count()").to_numpy(zero_copy_only=False)
        return batch.select([bucket_col]).filter(pa.array(c >= 2))

    ids = []
    for b in counts.map_batches(hot, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        ids.append(b.column(bucket_col).to_numpy(zero_copy_only=False))
    hot_ids = np.sort(np.concatenate(ids)) if ids else np.empty(0, np.int64)
    ref = ray.put(hot_ids)

    def keep(batch: pa.Table) -> pa.Table:
        hb = ray.get(ref)
        bv = batch.column(bucket_col).to_numpy(zero_copy_only=False)
        if len(hb) == 0:
            return batch.slice(0, 0)
        pos = np.clip(np.searchsorted(hb, bv), 0, len(hb) - 1)
        return batch.filter(pa.array(hb[pos] == bv))

    return buckets_ds.map_batches(keep, batch_format="pyarrow")


def byte_positions(arr):
    """(doc index per byte, flat uint8 data, starts, lens) for a flat
    string array — one np.repeat, no per-row Python."""
    starts, lens, data = _offsets_data(arr)
    docpos = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # the flat byte stream of the rows, honoring slice offsets: rows are
    # contiguous in Arrow string arrays, so it's one big view
    lo = starts[0] if len(starts) else 0
    hi = (starts[-1] + lens[-1]) if len(starts) else 0
    return docpos, data[lo:hi], starts - lo, lens


def byte_ngram_hashes(arr, n: int = 3):
    """(uint64 hash per byte n-gram, int64 doc index per n-gram),
    doc-ordered. N-grams are byte windows over each string's UTF-8
    bytes (== character n-grams for ASCII); docs shorter than n bytes
    (incl. empty) contribute ONE fallback hash of their whole content.
    Vectorized: one rolling pass over the flat concatenated buffer."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), type=pa.string())
    docpos, flat, starts, lens = byte_positions(arr)
    total = len(flat)
    if total >= n:
        nw = total - n + 1
        acc = np.full(nw, _GOLD, dtype=np.uint64)
        for i in range(n):
            acc = mix64(acc + flat[i:i + nw].astype(np.uint64) * _FNV)
        valid = docpos[:nw] == docpos[n - 1:]
        h = acc[valid]
        hd = docpos[:nw][valid]
    else:
        h = np.empty(0, dtype=np.uint64)
        hd = np.empty(0, dtype=np.int64)
    short = np.nonzero(lens < n)[0]
    if len(short):
        fb = hash64(arr.take(pa.array(short, type=pa.int64())))
        h = np.concatenate([h, fb])
        hd = np.concatenate([hd, short])
        order = np.argsort(hd, kind="stable")
        h, hd = h[order], hd[order]
    return h, hd


def char_presence(arr) -> np.ndarray:
    """(n, 256) bool byte-presence matrix per string (== character sets
    for ASCII text) — the vectorized carrier for char-set Jaccard."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), type=pa.string())
    docpos, flat, _starts, _lens = byte_positions(arr)
    out = np.zeros((len(arr), 256), dtype=bool)
    out[docpos, flat] = True
    return out


def char_jaccard(arr_a, arr_b) -> np.ndarray:
    """Character-set Jaccard per row pair (byte-level; exact DuckDB
    `jaccard()` semantics for ASCII inputs). Empty∩empty → 1.0."""
    pa_ = char_presence(arr_a)
    pb_ = char_presence(arr_b)
    inter = (pa_ & pb_).sum(axis=1)
    union = (pa_ | pb_).sum(axis=1)
    out = np.ones(len(inter), dtype=np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out
