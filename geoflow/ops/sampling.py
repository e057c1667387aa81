"""Deterministic hash-based sampling / splitting over keyed datasets.

Training-data pipelines need samples and train/validation splits that
are (a) stable across task retries, resumes and repartitionings —
ruling out ``Dataset.random_sample`` (block-order- and seed-placement-
dependent) — and (b) disjoint and exhaustive for splits. Hashing the
row KEY gives both: membership is a pure function of the key, so any
subset of partitions can be recomputed independently (the lineage /
resume requirement, SURVEY.md §4.2).

Two hash routes:

- ``method="splitmix"`` (default): splitmix64 avalanche of the key
  (hashing.mix64) — full 64-bit mixing, the one to use in real
  pipelines.
- ``method="lcg32"``: two rounds of the classic 32-bit LCG
  (Marsaglia's 69069 multiplier) taking the TOP 10 bits as the slot —
  every intermediate stays < 2^63, so the exact same integer
  arithmetic is expressible in plain SQL (DuckDB BIGINT) for the
  oracle gate. High bits of an LCG are its well-mixed ones; two
  rounds decorrelate consecutive keys.

Sampling rates are expressed in 1024ths (``frac_1024``) so slot
comparison is exact integer math — no float thresholds to diverge
between engines."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["sample_slot", "hash_sample", "stratified_sample",
           "split_column", "order_key32", "order_key32_sql",
           "token_budget_sample", "hrw_shard", "rendezvous_shards"]

_M32 = np.int64(1 << 32)
_LCG_A = np.int64(69069)


def sample_slot(keys, salt: int = 0, method: str = "splitmix") -> np.ndarray:
    """int64 slot in [0, 1024) per key — the sampling universe.

    lcg32 SQL equivalent (DuckDB, BIGINT-safe — keep op-for-op; the
    salt is pre-mixed with Knuth's golden-ratio multiplier so it
    reaches the TOP bits through both 69069 rounds — adding it raw
    only perturbs bits below the extracted 10; salt must be < 2^31
    to stay BIGINT-safe):
      h0 = ((key % 4294967296 + 4294967296) + salt*2654435761 % 4294967296) % 4294967296
      h1 = (h0 * 69069 + 1) % 4294967296
      h2 = (h1 * 69069 + 1) % 4294967296
      slot = h2 // 4194304
    """
    k = np.asarray(keys).astype(np.int64)
    if method == "lcg32":
        h = np.mod(k, _M32)  # np.mod: non-negative for negative keys
        h = (h + np.int64(salt * 2654435761 % (1 << 32))) % _M32
        h = (h * _LCG_A + 1) % _M32
        h = (h * _LCG_A + 1) % _M32
        return h >> np.int64(22)
    from ..text.hashing import mix64
    h = mix64(k.view(np.uint64) + np.uint64(salt) * np.uint64(0x9E3779B97F4A7C15))
    return (h >> np.uint64(54)).view(np.int64)


def sample_slot_sql(key_expr: str, salt: int = 0) -> str:
    """The lcg32 slot as a DuckDB SQL expression over ``key_expr`` —
    bit-identical to sample_slot(method="lcg32")."""
    sm = salt * 2654435761 % (1 << 32)
    h0 = f"((({key_expr}) % 4294967296 + 4294967296) + {sm}) % 4294967296"
    h1 = f"(({h0}) * 69069 + 1) % 4294967296"
    h2 = f"(({h1}) * 69069 + 1) % 4294967296"
    return f"({h2}) // 4194304"


def hash_sample(ds, key_col: str, frac_1024: int, salt: int = 0,
                method: str = "splitmix"):
    """Keep ~frac_1024/1024 of rows, deterministically by key hash."""

    def flt(batch: pa.Table) -> pa.Table:
        slot = sample_slot(
            batch.column(key_col).to_numpy(zero_copy_only=False),
            salt=salt, method=method)
        return batch.filter(pa.array(slot < frac_1024))

    return ds.map_batches(flt, batch_format="pyarrow")


def stratified_sample(ds, key_col: str, strata_col: str,
                      fracs: dict, default_frac_1024: int = 0,
                      salt: int = 0, method: str = "splitmix"):
    """Per-stratum sampling rates (e.g. language rebalancing: keep all
    low-resource docs, 5% of English). ``fracs`` maps stratum value →
    frac_1024; unlisted strata get ``default_frac_1024``."""

    def flt(batch: pa.Table) -> pa.Table:
        slot = sample_slot(
            batch.column(key_col).to_numpy(zero_copy_only=False),
            salt=salt, method=method)
        sv = batch.column(strata_col)
        if isinstance(sv, pa.ChunkedArray):
            sv = sv.combine_chunks()
        enc = pc.dictionary_encode(sv)
        thr_by_val = np.array(
            [fracs.get(v, default_frac_1024)
             for v in enc.dictionary.to_pylist()], dtype=np.int64)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        thr = thr_by_val[idx] if len(thr_by_val) else \
            np.full(len(sv), default_frac_1024, dtype=np.int64)
        return batch.filter(pa.array(slot < thr))

    return ds.map_batches(flt, batch_format="pyarrow")


def split_column(ds, key_col: str, val_frac_1024: int = 10,
                 test_frac_1024: int = 0, salt: int = 0,
                 method: str = "splitmix", out_col: str = "split"):
    """Append a 'train' / 'val' / 'test' label — disjoint and
    exhaustive by construction (slot range partition), stable under
    resume/retry."""

    def lab(batch: pa.Table) -> pa.Table:
        slot = sample_slot(
            batch.column(key_col).to_numpy(zero_copy_only=False),
            salt=salt, method=method)
        lbl = np.where(slot < val_frac_1024, "val",
                       np.where(slot < val_frac_1024 + test_frac_1024,
                                "test", "train"))
        return batch.append_column(out_col,
                                   pa.array(lbl, type=pa.string()))

    return ds.map_batches(lab, batch_format="pyarrow")


def order_key32(keys, salt: int = 0) -> np.ndarray:
    """int64 in [0, 2^32): the full lcg32 state (the slot's h2 before
    the top-10-bit shift) — a deterministic pseudo-random ORDERING key
    reproducible in SQL (order_key32_sql). Used to give token-budget
    sampling a stable, engine-independent 'random' order."""
    k = np.asarray(keys).astype(np.int64)
    h = np.mod(k, _M32)
    h = (h + np.int64(salt * 2654435761 % (1 << 32))) % _M32
    h = (h * _LCG_A + 1) % _M32
    h = (h * _LCG_A + 1) % _M32
    return h


def order_key32_sql(key_expr: str, salt: int = 0) -> str:
    sm = salt * 2654435761 % (1 << 32)
    h0 = f"((({key_expr}) % 4294967296 + 4294967296) + {sm}) % 4294967296"
    h1 = f"(({h0}) * 69069 + 1) % 4294967296"
    return f"(({h1}) * 69069 + 1) % 4294967296"


def token_budget_sample(ds, source_col: str, ntok_col: str,
                        key_col: str, budget: int, salt: int = 0):
    """Dataset-mixing sampler: per source, keep documents in the
    deterministic lcg32 hash order until the source's token budget is
    reached (a doc is kept iff the budget was not already exhausted
    BEFORE it — so each source overshoots by at most one document, and
    every source with any data contributes at least one doc).

    Determinism: membership is a pure function of (key, salt, the
    source's doc set) — independent of Ray block order, resume-safe,
    and bit-identical to a SQL window cumsum over the same ordering.
    Scale shape: only (key, source, n_tokens) enter the groupby;
    per-group work is one argsort + cumsum (sources are bounded
    cardinality — domains, not documents); the kept-key set then
    filters the full rows via the broadcast/join machinery the caller
    prefers (here: an inner map-side filter with the kept keys
    broadcast, bounded by kept docs at 8 B/key)."""
    import ray

    proj_cols = [key_col, source_col, ntok_col]

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(proj_cols)

    def pick(group: pa.Table) -> pa.Table:
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        nt = group.column(ntok_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = order_key32(keys, salt=salt)
        order = np.lexsort((keys, ok))
        cum = np.cumsum(nt[order]) - nt[order]   # tokens BEFORE each
        keep = order[cum < budget]
        return pa.table({key_col: pa.array(keys[keep])})

    kept = ds.map_batches(project, batch_format="pyarrow") \
        .groupby(source_col).map_groups(pick, batch_format="pyarrow")

    parts = [b.column(key_col).to_numpy(zero_copy_only=False)
             for b in kept.iter_batches(batch_format="pyarrow")
             if b.num_rows and key_col in b.schema.names]
    keep_keys = np.sort(np.concatenate(parts)) if parts else \
        np.empty(0, np.int64)
    ref = np.sort(keep_keys)
    import ray as _ray
    kref = _ray.put(ref)

    def flt(batch: pa.Table) -> pa.Table:
        import ray as _r
        arr = _KEEP_CACHE.get(kref.hex())
        if arr is None:
            arr = _r.get(kref)
            _KEEP_CACHE.clear()
            _KEEP_CACHE[kref.hex()] = arr
        kv = batch.column(key_col).to_numpy(zero_copy_only=False)
        if len(arr) == 0:
            return batch.slice(0, 0)
        pos = np.clip(np.searchsorted(arr, kv), 0, len(arr) - 1)
        return batch.filter(pa.array(arr[pos] == kv))

    return ds.map_batches(flt, batch_format="pyarrow")


_KEEP_CACHE: dict = {}


_HRW_GAMMA = 0x9E3779B97F4A7C15  # splitmix64 gamma (public constant)


def hrw_shard(keys, n_shards: int, salt: int = 0) -> np.ndarray:
    """Highest-random-weight (rendezvous) shard per key (Thaler &
    Ravishankar 1998): shard = argmax_s mix64(mix64(key + salt) ^
    c_s) with c_s = (s+1)·GAMMA mod 2^64. Unlike ``key % S``,
    removing one shard reassigns ONLY the keys that lived on it —
    the resumable-output / consistent-placement property. Ties (a
    2^-64 event) break to the LOWEST shard id, mirroring the SQL
    (h DESC, s ASC) row-number order."""
    from ..text.hashing import mix64

    k = mix64(np.asarray(keys).astype(np.int64).view(np.uint64)
              + np.uint64(salt))
    best_h = np.zeros(len(k), np.uint64)
    best_s = np.zeros(len(k), np.int64)
    for s in range(n_shards):
        c = np.uint64((s + 1) * _HRW_GAMMA % (1 << 64))
        h = mix64(k ^ c)
        upd = h > best_h
        best_h[upd] = h[upd]
        best_s[upd] = s
    return best_s


def rendezvous_shards(ds, key_col: str, n_shards: int, salt: int = 0):
    """Append an HRW ``shard`` column — one stateless map pass."""
    import pyarrow as _pa

    def lab(batch):
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shard", _pa.array(hrw_shard(keys, n_shards, salt)))

    return ds.map_batches(lab, batch_format="pyarrow")
