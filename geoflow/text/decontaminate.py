"""Benchmark decontamination: drop corpus documents that share any
token n-gram with a held-out benchmark / evaluation set.

This is the published protocol for training-corpus decontamination
(GPT-3 appendix C "dirty" 13-gram overlap; The Pile; PaLM): a training
document is *contaminated* if any n consecutive word tokens of it also
appear as n consecutive tokens in any benchmark document. The engine
has no equivalent in the reference surface (RDF corpora have no
train/eval split — SURVEY.md §2.7); it is a first-class 100-TB
corpus-pipeline component alongside exact/near dedup (text/dedup.py).

Scale shape (100 TB corpus, MB-GB benchmark):

- The benchmark side is tiny relative to the corpus. Its distinct
  n-gram hash set is computed with per-batch ``np.unique`` map tasks
  and unioned at the driver — bounded by the benchmark's own size
  (8 B per distinct gram), NOT the corpus — then broadcast once via
  ``ray.put`` and read through a per-worker-process cache.
- The corpus pass is then a pure ``map_batches`` filter: rolling
  n-gram hashes over the flat token-hash array (no per-token Python,
  hashing.py) + sorted-array membership. NO shuffle ever touches the
  corpus, and the text payload never leaves its read task.
- For benchmark gram sets beyond broadcast capacity, ``mode="join"``
  projects the corpus to (gram, key) rows and semi-joins them against
  the benchmark grams with the key-partitioned hash join
  (join/semijoin.py), then anti-filters the corpus by the resulting
  key set — nothing driver-materialized at any scale, at the cost of
  shuffling the corpus's n-gram projection (~tokens× the key count);
  broadcast is strongly preferred whenever the benchmark fits.

Equality is on 64-bit rolling hashes of the token-hash sequence; token
text equality ⟺ token hash64 equality up to the documented hash64
collision bound (hashing.py) — the same exposure every dedup stage in
this engine accepts for determinism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import _GOLD, hash64, mix64, tokenize

__all__ = [
    "token_ngram_hashes", "benchmark_gram_refs", "decontaminate",
    "contaminated_keys",
]


def token_ngram_hashes(texts, n: int = 13):
    """(uint64 rolling n-gram hash per token window, int64 doc index).

    Tokens are the engine-standard lowercased unicode word runs
    (hashing.tokenize); windows crossing document boundaries are masked
    out. Documents with fewer than n tokens emit NO grams — a doc
    shorter than the window cannot contain a benchmark n-gram, matching
    the published protocol (unlike MinHash shingling, which wants every
    doc represented and so has a short-doc fallback)."""
    flat, parent = tokenize(texts)
    th = hash64(flat)
    n_tok = len(th)
    if n_tok < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    nw = n_tok - n + 1
    acc = np.zeros(nw, dtype=np.uint64)
    for i in range(n):
        acc = mix64(acc + th[i:i + nw] * _GOLD)
    valid = parent[:nw] == parent[n - 1:]
    return acc[valid], parent[:nw][valid]


# per-worker-process cache of the broadcast gram set (task-pool pattern:
# worker processes persist across tasks — one ray.get per worker, not
# one per batch; CLAUDE.md round-3 facts)
_GRAM_CACHE: dict = {}


def _gram_cache_get(ref) -> np.ndarray:
    key = ref.hex()
    arr = _GRAM_CACHE.get(key)
    if arr is None:
        import ray
        arr = ray.get(ref)
        _GRAM_CACHE.clear()
        _GRAM_CACHE[key] = arr
    return arr


def benchmark_gram_refs(bench_ds, text_col: str = "text", n: int = 13):
    """Broadcast handle (ray.ObjectRef) to the SORTED distinct uint64
    n-gram hash array of the benchmark set.

    Distinct-ing happens per batch on workers (np.unique); the driver
    only unions the per-batch distinct sets — memory bounded by the
    true distinct gram count (8 B each), which for any real benchmark
    suite is MBs."""
    import ray

    def grams(batch: pa.Table) -> pa.Table:
        g, _ = token_ngram_hashes(batch.column(text_col), n)
        return pa.table({"g": pa.array(np.unique(g).view(np.int64))})

    parts = [b.column("g").to_numpy(zero_copy_only=False)
             for b in bench_ds.map_batches(grams, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    allg = (np.unique(np.concatenate(parts)) if parts
            else np.empty(0, np.int64)).view(np.uint64)
    return ray.put(np.sort(allg))


def contaminated_mask(batch: pa.Table, bench_sorted: np.ndarray,
                      text_col: str = "text", n: int = 13) -> np.ndarray:
    """bool mask: row shares ≥1 token n-gram with the SORTED uint64
    benchmark gram array (array-level entry point — used directly by
    the resumable curation job on per-partition tables)."""
    bad = np.zeros(batch.num_rows, dtype=bool)
    if len(bench_sorted) == 0:
        return bad
    g, doc = token_ngram_hashes(batch.column(text_col), n)
    if len(g) == 0:
        return bad
    pos = np.clip(np.searchsorted(bench_sorted, g),
                  0, len(bench_sorted) - 1)
    bad[doc[bench_sorted[pos] == g]] = True
    return bad


def _hit_doc_mask(batch: pa.Table, gram_ref, text_col: str,
                  n: int) -> np.ndarray:
    """bool mask: row has ≥1 n-gram in the broadcast benchmark set."""
    return contaminated_mask(batch, _gram_cache_get(gram_ref),
                             text_col, n)


def decontaminate(corpus_ds, bench_ds, text_col: str = "text",
                  key_col: str = "doc_id", n: int = 13,
                  mode: str = "broadcast", invert: bool = False):
    """Filter ``corpus_ds`` down to documents sharing NO token n-gram
    with ``bench_ds`` (``invert=True`` keeps the contaminated docs
    instead, for audit). See module docstring for the two scale modes."""
    if mode == "join":
        from ..join.semijoin import partitioned_key_filter
        if invert:
            bad = contaminated_keys(corpus_ds, bench_ds, text_col=text_col,
                                    key_col=key_col, n=n, mode="join")
            return partitioned_key_filter(corpus_ds, bad, key_col,
                                          keys_unique=True)
        # anti mode is duplicate-safe (semijoin.py): feed the raw
        # (gram, key) hit rows straight in and skip the distinct-keys
        # aggregate — one fewer all-to-all over the corpus hit set
        hits = _contaminated_hits_join(corpus_ds, bench_ds, text_col,
                                       key_col, n)
        return partitioned_key_filter(corpus_ds, hits, key_col,
                                      anti=True)
    gram_ref = benchmark_gram_refs(bench_ds, text_col=text_col, n=n)

    def flt(batch: pa.Table) -> pa.Table:
        bad = _hit_doc_mask(batch, gram_ref, text_col, n)
        return batch.filter(pa.array(bad if invert else ~bad))

    return corpus_ds.map_batches(flt, batch_format="pyarrow")


def _contaminated_hits_join(corpus_ds, bench_ds, text_col, key_col, n):
    """(gram, key) rows of the corpus whose gram appears in the
    benchmark — key-partitioned hash semi-join, possibly multiple rows
    per contaminated key (one per matching gram)."""
    from ..join.semijoin import partitioned_key_filter

    def bench_grams(batch: pa.Table) -> pa.Table:
        g, _ = token_ngram_hashes(batch.column(text_col), n)
        return pa.table({"gram": pa.array(np.unique(g).view(np.int64))})

    def corpus_grams(batch: pa.Table) -> pa.Table:
        g, doc = token_ngram_hashes(batch.column(text_col), n)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        return pa.table({"gram": pa.array(g.view(np.int64)),
                         key_col: pa.array(keys[doc])})

    bg = bench_ds.map_batches(bench_grams, batch_format="pyarrow")
    cg = corpus_ds.map_batches(corpus_grams, batch_format="pyarrow")
    return partitioned_key_filter(cg, bg, "gram", keys_unique=False)


def contaminated_keys(corpus_ds, bench_ds, text_col: str = "text",
                      key_col: str = "doc_id", n: int = 13,
                      mode: str = "broadcast"):
    """Dataset of distinct corpus keys that are contaminated — the
    checkpointable drop set for a resumable curation job (the same
    shape jobs/run_curation.py persists under _state/).

    mode="broadcast": benchmark grams broadcast, corpus mapped once.
    mode="join": for benchmark gram sets beyond broadcast capacity —
    corpus (gram, key) projection semi-joined (key-partitioned hash
    join) against the distinct benchmark grams; output dedup'd by key.
    """
    if mode == "join":
        hits = _contaminated_hits_join(corpus_ds, bench_ds, text_col,
                                       key_col, n)
        # distinct keys via the tiny 8-byte groupby shuffle
        return hits.groupby(key_col).count().map_batches(
            lambda b: b.select([key_col]), batch_format="pyarrow")

    gram_ref = benchmark_gram_refs(bench_ds, text_col=text_col, n=n)

    def keys(batch: pa.Table) -> pa.Table:
        bad = _hit_doc_mask(batch, gram_ref, text_col, n)
        return batch.select([key_col]).filter(pa.array(bad))

    return corpus_ds.map_batches(keys, batch_format="pyarrow")
