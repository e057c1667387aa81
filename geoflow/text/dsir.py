"""DSIR-style data selection with importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling").

Published recipe: estimate two bag-of-ngram distributions — a TARGET
(small, high-quality corpus) and RAW (the crawl) — and score every raw
document with the log importance weight

    w(doc) = Σ_{feature f ∈ doc} [ log p_target(f) − log p_raw(f) ]

with Laplace-smoothed probabilities p(f) = (count(f)+1) / (total+V),
then keep the top documents (threshold, top-k, or the paper's
Gumbel-top-k, which samples without replacement proportionally to the
softmax of the weights).

Scale shape (100 TB corpus):
- Count passes ship only (feature_key, partial_count) 16-byte rows
  into one groupby-sum; the text never leaves its read task. Feature
  keys are 64-bit token-hashes (``m=0``, exact vocabulary — driver
  memory ∝ distinct features) or hash-buckets modulo ``m`` (the
  paper's hashed n-gram mode — FIXED m-sized vectors, the 100-TB
  path; m=10_000 in the paper).
- The two count vectors collapse to ONE broadcast log-ratio lookup
  (8 B/feature), read through the per-worker-process cache.
- Scoring is a pure map_batches pass: tokenize → hash → searchsorted
  / modulo lookup → per-doc np.bincount weighted sum. No shuffle.
- Selection: threshold filter streams; top-k / Gumbel-top-k is a
  distributed sort+limit over (key, weight) rows only.

Determinism: FNV/splitmix hashing (hashing.py), Gumbel noise derived
from mix64(key, seed) — stable across retries and repartitioning.

Oracle note (__ray_entry__.py `dsir_filter`): weights are float sums,
so the driver gate is on the SELECTED SET (planted corpora give every
document a weight margin ≫ float error — the pq_ann margin argument),
never on weight bytes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import _FNV, hash64, mix64, tokenize

__all__ = ["feature_counts", "dsir_weights", "dsir_resample"]


def _doc_features(texts, m: int, bigrams: bool):
    """(int64 feature key per occurrence, int64 doc index). Features =
    token unigrams (+ within-doc adjacent-pair bigrams when asked),
    keyed by 64-bit hash (m=0) or hash % m bucket."""
    flat, parent = tokenize(texts)
    h = hash64(flat)
    keys, par = h, parent
    if bigrams and len(h) > 1:
        same = parent[1:] == parent[:-1]
        bh = mix64((h[:-1] * _FNV) ^ h[1:])[same]
        keys = np.concatenate([h, bh])
        par = np.concatenate([parent, parent[:-1][same]])
    if m:
        keys = (keys % np.uint64(m)).astype(np.int64)
    else:
        keys = keys.view(np.int64)
    return keys, par


def feature_counts(ds, text_col: str = "text", m: int = 0,
                   bigrams: bool = False):
    """(sorted int64 feature keys, int64 counts, total occurrences)
    for the corpus — per-batch partials into one 16-byte groupby-sum,
    repeated subset collected at the driver (bounded: distinct
    features at m=0, exactly m buckets otherwise)."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        keys, _ = _doc_features(batch.column(text_col), m, bigrams)
        u, c = np.unique(keys, return_counts=True)
        return pa.table({"fh": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("fh").aggregate(Sum("c"))
    ks, cs = [], []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0 or "fh" not in b.schema.names:
            continue  # hash-agg empty partitions emit 0-column blocks
        ks.append(b.column("fh").to_numpy(zero_copy_only=False))
        cs.append(b.column("sum(c)").to_numpy(zero_copy_only=False))
    if not ks:
        return (np.empty(0, np.int64), np.empty(0, np.int64), 0)
    k = np.concatenate(ks)
    c = np.concatenate(cs).astype(np.int64)
    order = np.argsort(k)
    return k[order], c[order], int(c.sum())


# per-worker-process broadcast cache (task-pool pattern, CLAUDE.md)
_RATIO_CACHE: dict = {}


def _ratio_cache_get(ref):
    key = ref.hex()
    v = _RATIO_CACHE.get(key)
    if v is None:
        import ray
        v = ray.get(ref)
        _RATIO_CACHE.clear()
        _RATIO_CACHE[key] = v
    return v


def dsir_weights(ds, target_ds, text_col: str = "text",
                 key_col: str = "doc_id", m: int = 0,
                 bigrams: bool = False):
    """(key_col, weight, n_feats) per raw document: the DSIR log
    importance weight under Laplace-smoothed bag-of-ngram models of
    ``target_ds`` vs ``ds``. Two count passes + one broadcast + one
    scoring pass; ``ds`` is consumed twice (pass a re-readable or
    materialized dataset)."""
    import ray

    tk, tc, T = feature_counts(target_ds, text_col, m, bigrams)
    rk, rc, R = feature_counts(ds, text_col, m, bigrams)
    union = np.union1d(tk, rk)
    V = m if m else len(union)
    ct = np.zeros(len(union), np.int64)
    ct[np.searchsorted(union, tk)] = tc
    cr = np.zeros(len(union), np.int64)
    cr[np.searchsorted(union, rk)] = rc
    ratio = (np.log(ct + 1.0) - np.log(float(T + V))
             - np.log(cr + 1.0) + np.log(float(R + V)))
    # feature unseen in BOTH models at count time (possible only when
    # scoring a different corpus): both counts 0
    ratio0 = float(-np.log(float(T + V)) + np.log(float(R + V)))
    ref = ray.put((union, ratio))

    def score(batch: pa.Table) -> pa.Table:
        uni, rat = _ratio_cache_get(ref)
        keys, parent = _doc_features(batch.column(text_col), m, bigrams)
        n = batch.num_rows
        if len(keys) and len(uni):
            pos = np.clip(np.searchsorted(uni, keys), 0, len(uni) - 1)
            hit = uni[pos] == keys
            vals = np.where(hit, rat[pos], ratio0)
            w = np.bincount(parent, weights=vals, minlength=n)
        else:
            w = np.zeros(n, np.float64)
        nf = np.bincount(parent, minlength=n).astype(np.int64)
        return pa.table({key_col: batch.column(key_col),
                         "weight": pa.array(w),
                         "n_feats": pa.array(nf)})

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_resample(ds, target_ds, text_col: str = "text",
                  key_col: str = "doc_id", m: int = 0,
                  bigrams: bool = False, threshold: float | None = None,
                  k: int | None = None, gumbel: bool = False,
                  temperature: float = 1.0, seed: int = 0):
    """DSIR selection: ``threshold`` keeps docs with weight >
    threshold (streaming filter); ``k`` keeps the global top-k by
    weight (paper's Gumbel-top-k sampling without replacement when
    ``gumbel`` — deterministic noise from mix64(key, seed)). Returns
    (key_col, weight, n_feats) rows of the selected documents."""
    scored = dsir_weights(ds, target_ds, text_col, key_col, m, bigrams)
    if threshold is not None:
        def flt(batch: pa.Table) -> pa.Table:
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(w > threshold))
        return scored.map_batches(flt, batch_format="pyarrow")
    if k is None:
        raise ValueError("pass threshold= or k=")
    if gumbel:
        def noise(batch: pa.Table) -> pa.Table:
            kv = batch.column(key_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            u = (mix64(kv.view(np.uint64)
                       + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
                 .astype(np.float64) + 0.5) / 2.0 ** 64
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            g = w / temperature - np.log(-np.log(u))
            return batch.append_column("gumbel_key", pa.array(g))
        return scored.map_batches(noise, batch_format="pyarrow") \
            .sort("gumbel_key", descending=True).limit(k) \
            .drop_columns(["gumbel_key"])
    return scored.sort(["weight", key_col], descending=[True, False]) \
        .limit(k)
