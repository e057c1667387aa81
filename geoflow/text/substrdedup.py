"""Exact substring dedup: remove every duplicated k-token window.

The published protocol (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better", ExactSubstr): any token span of length
>= k that appears more than once in the corpus is removed from EVERY
document it appears in — including the first occurrence and including
repeats within a single document. The paper builds a corpus-wide
suffix array; a suffix array is inherently a single shared index and
does not decompose over Ray blocks, so this engine implements the
equivalent fixed-window formulation: a token position is removed iff
it is covered by at least one k-token window whose k-gram occurs >= 2
times in the corpus. For spans longer than k the two formulations
agree (every length-k subwindow of a duplicated span is duplicated);
spans shorter than k are below the dedup threshold in both. No
reference counterpart (RDF corpora — SURVEY.md §2.7); first-class
100-TB corpus-pipeline component beside exact/near/line dedup and
decontamination (text/dedup.py, linededup.py, decontaminate.py).

Scale shape (100 TB corpus):

- Pass 1 (count): rolling k-gram hashes over the flat token-hash
  array (hashing.py — no per-token Python), per-batch np.unique
  partial counts; only 16-byte (gram_hash, partial_count) rows enter
  the groupby-sum shuffle. The duplicated subset (total >= 2) is by
  construction bounded by the corpus's duplicated content — the same
  trade line_dedup documents — streamed to the driver at 8 B/gram and
  broadcast once via ray.put with the per-worker-process cache. For
  corpora whose duplicated-gram set exceeds broadcast capacity, the
  (gram, key, pos) projection can be semi-joined with
  join/semijoin.partitioned_key_filter and the hit windows re-joined
  per key — documented escape hatch, not the default.
- Pass 2 (strip): pure map_batches — re-hash windows, sorted-set
  membership, one difference-array cumsum marks covered token
  positions, surviving tokens reassembled with ListArray offsets +
  pc.binary_join. No shuffle ever touches the corpus; the text never
  leaves its read task.

Determinism: splitmix/FNV hashing only (hashing.py); window equality
is on 64-bit rolling hashes of the token-hash sequence — the
documented collision exposure every dedup stage in this engine
accepts. Output text is the surviving LOWERCASED tokens joined by
single spaces (tokenize(lower=True)), mirrored op-for-op by the SQL
oracle in __ray_entry__.py (string_agg over non-removed positions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import _GOLD, hash64, mix64, tokenize

__all__ = ["duplicated_window_hashes", "strip_dup_windows_table",
           "strip_dup_windows", "substr_dedup"]


def _tokens_and_hashes(texts, raw_tokens: bool):
    """(flat token array for OUTPUT, int64 doc index, uint64 token
    hash). raw_tokens=False: engine-standard whole-string-lowercased
    tokens (oracle-parity path — DuckDB lower(text) then split).
    raw_tokens=True: original-spelling tokens, hashed via per-token
    lowercasing — output preserves case; identical hash stream on
    ASCII, may differ from whole-string lowering only on exotic
    case-mapping edge cases (no oracle rides this path)."""
    if raw_tokens:
        flat, parent = tokenize(texts, lower=False)
        low = pc.utf8_lower(flat)
        if isinstance(low, pa.ChunkedArray):
            low = low.combine_chunks()
        return flat, parent, hash64(low)
    flat, parent = tokenize(texts)
    return flat, parent, hash64(flat)


def _window_hashes(th: np.ndarray, parent: np.ndarray, k: int):
    """(uint64 rolling k-gram hash, int64 global start index) for every
    window that stays inside one document. Same polynomial as
    decontaminate.token_ngram_hashes, but start positions are kept so
    covered token spans can be reconstructed."""
    n_tok = len(th)
    if n_tok < k:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    nw = n_tok - k + 1
    acc = np.zeros(nw, dtype=np.uint64)
    for i in range(k):
        acc = mix64(acc + th[i:i + nw] * _GOLD)
    idx = np.nonzero(parent[:nw] == parent[k - 1:])[0]
    return acc[idx], idx.astype(np.int64)


def window_hash_partials(batch: pa.Table, text_col: str, k: int,
                         raw_tokens: bool = False):
    """(uint64 distinct window hashes, int64 partial occurrence counts)
    for one table — the count-pass kernel, exposed for the resumable
    curation job's checkpointed dup-gram artifact."""
    flat, parent, th = _tokens_and_hashes(batch.column(text_col),
                                          raw_tokens)
    g, _ = _window_hashes(th, parent, k)
    uniq, cnt = np.unique(g, return_counts=True)
    return uniq, cnt.astype(np.int64)


def duplicated_window_hashes(ds, text_col: str = "text", k: int = 15,
                             min_count: int = 2,
                             raw_tokens: bool = False):
    """ray.ObjectRef to the SORTED uint64 hash array of k-token windows
    occurring >= min_count times in the corpus (occurrences, not
    distinct docs — within-doc repeats are duplicates per the
    ExactSubstr protocol). Per-batch partials -> 16-byte groupby-sum
    shuffle -> repeated subset only reaches the driver."""
    import ray
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        uniq, cnt = window_hash_partials(batch, text_col, k, raw_tokens)
        return pa.table({"gh": pa.array(uniq.view(np.int64)),
                         "c": pa.array(cnt)})

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("gh").aggregate(Sum("c"))
    parts = []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0 or "gh" not in b.schema.names:
            continue  # hash-agg empty partitions emit 0-column blocks
        tot = b.column("sum(c)").to_numpy(zero_copy_only=False)
        keep = tot >= min_count
        parts.append(b.column("gh").to_numpy(zero_copy_only=False)[keep])
    allh = (np.concatenate(parts) if parts
            else np.empty(0, np.int64)).view(np.uint64)
    return ray.put(np.sort(allh))


# per-worker-process broadcast cache (task-pool pattern, CLAUDE.md)
_DUP_CACHE: dict = {}


def _dup_cache_get(ref) -> np.ndarray:
    key = ref.hex()
    arr = _DUP_CACHE.get(key)
    if arr is None:
        import ray
        arr = ray.get(ref)
        _DUP_CACHE.clear()
        _DUP_CACHE[key] = arr
    return arr


def strip_dup_windows_table(batch: pa.Table, dup_sorted: np.ndarray,
                            text_col: str = "text",
                            key_col: str = "doc_id", k: int = 15,
                            out_col: str = "text_dedup") -> pa.Table:
    """Array-level strip kernel over one table: a token position is
    removed iff covered by a window whose hash is in the SORTED uint64
    ``dup_sorted``. Returns (key, n_tokens, n_removed, out_col) — every
    input row kept (a fully-duplicated doc yields out_col='')."""
    flat, parent = tokenize(batch.column(text_col))
    n_rows = batch.num_rows
    removed = _removed_token_mask(hash64(flat), parent, dup_sorted, k)
    keep = ~removed
    n_tokens = np.bincount(parent, minlength=n_rows).astype(np.int64)
    n_removed = (np.bincount(parent[removed], minlength=n_rows)
                 .astype(np.int64) if removed.any()
                 else np.zeros(n_rows, np.int64))
    kept_flat = flat.filter(pa.array(keep))
    if isinstance(kept_flat, pa.ChunkedArray):
        kept_flat = kept_flat.combine_chunks()
    counts = np.bincount(parent[keep], minlength=n_rows)
    offsets = np.concatenate(
        [np.zeros(1, np.int64), np.cumsum(counts)]).astype(np.int32)
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), kept_flat), " ")
    return pa.table({key_col: batch.column(key_col),
                     "n_tokens": pa.array(n_tokens),
                     "n_removed": pa.array(n_removed),
                     out_col: joined})


def _removed_token_mask(th: np.ndarray, parent: np.ndarray,
                        dup_sorted: np.ndarray, k: int) -> np.ndarray:
    """bool mask over the flat token array: position covered by a
    duplicated k-window (difference-array cumsum over window hits)."""
    n_tok = len(parent)
    removed = np.zeros(n_tok, dtype=bool)
    if n_tok >= k and len(dup_sorted):
        g, idx = _window_hashes(th, parent, k)
        if len(g):
            pos = np.clip(np.searchsorted(dup_sorted, g),
                          0, len(dup_sorted) - 1)
            hit = idx[dup_sorted[pos] == g]
            if len(hit):
                diff = np.zeros(n_tok + 1, dtype=np.int64)
                np.add.at(diff, hit, 1)
                np.add.at(diff, hit + k, -1)
                removed = np.cumsum(diff[:-1]) > 0
    return removed


def strip_dup_windows_text_table(batch: pa.Table,
                                 dup_sorted: np.ndarray,
                                 text_col: str = "text", k: int = 15,
                                 drop_empty: bool = True) -> pa.Table:
    """Pipeline-integration variant of strip_dup_windows_table:
    replaces ``text_col`` IN PLACE with the doc's surviving
    ORIGINAL-SPELLING tokens space-joined, preserving every other
    column; docs stripped to zero tokens are removed when
    ``drop_empty`` (mirroring line_dedup's zero-line rule). Window
    hashes use per-token lowercasing (_tokens_and_hashes raw path) —
    the dup set it is matched against must be built with
    ``raw_tokens=True`` for hash-stream consistency."""
    flat, parent, th = _tokens_and_hashes(batch.column(text_col), True)
    removed = _removed_token_mask(th, parent, dup_sorted, k)
    keep = ~removed
    n_rows = batch.num_rows
    kept_flat = flat.filter(pa.array(keep))
    if isinstance(kept_flat, pa.ChunkedArray):
        kept_flat = kept_flat.combine_chunks()
    counts = np.bincount(parent[keep], minlength=n_rows)
    offsets = np.concatenate(
        [np.zeros(1, np.int64), np.cumsum(counts)]).astype(np.int32)
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), kept_flat), " ")
    i = batch.schema.get_field_index(text_col)
    out = batch.set_column(i, text_col, joined)
    if drop_empty:
        out = out.filter(pa.array(counts > 0))
    return out


def strip_dup_windows(ds, dup_ref, text_col: str = "text",
                      key_col: str = "doc_id", k: int = 15,
                      out_col: str = "text_dedup"):
    """Pure map_batches strip pass against the broadcast duplicated-
    window set (see strip_dup_windows_table)."""

    def strip(batch: pa.Table) -> pa.Table:
        return strip_dup_windows_table(batch, _dup_cache_get(dup_ref),
                                       text_col=text_col,
                                       key_col=key_col, k=k,
                                       out_col=out_col)

    return ds.map_batches(strip, batch_format="pyarrow")


def substr_dedup(ds, text_col: str = "text", key_col: str = "doc_id",
                 k: int = 15, min_count: int = 2,
                 out_col: str = "text_dedup"):
    """Full ExactSubstr pipeline: count pass -> broadcast duplicated
    set -> strip pass. ``ds`` is read twice (two executions of its
    lineage); pass a materialized or re-readable dataset, as with every
    multi-pass stage in this engine."""
    ref = duplicated_window_hashes(ds, text_col=text_col, k=k,
                                   min_count=min_count)
    return strip_dup_windows(ds, ref, text_col=text_col,
                             key_col=key_col, k=k, out_col=out_col)
