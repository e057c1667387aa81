"""Sharded mutable key index — the one place this engine drops to raw
Ray actors, for the semantics the Dataset API genuinely cannot express:
a SHARED MUTABLE membership set consulted while data is still arriving
(streaming ingestion dedup: "have we EVER seen this content hash?",
across micro-batches, across jobs, before the corpus is complete —
a groupby can only dedup data that already exists).

Design:
  - N shard actors, each holding a hash → owner dict; a key routes to
    shard ``mix64(key) % N`` (deterministic, splitmix-based — uniform
    even for sequential keys). Batched ``add_if_absent`` round-trips
    once per touched shard, not per key.
  - First-seen-wins semantics: the first owner to insert a key keeps
    it; later owners get False for that key. (Batch dedup keeps the
    MIN key — text/dedup.exact_dedup; streaming keeps the EARLIEST
    ARRIVAL. With arrival ordered by key the two coincide — the
    `stream_dedup` driver query's oracle relies on exactly that.)
  - Retry idempotency: every insert records an ``owner`` tag (caller's
    batch/task id). A RETRIED insert of the same (key, owner) answers
    True again — an at-least-once task re-execution reproduces its
    original mask instead of dropping its own rows as duplicates.
    Different owner → False, as usual.

Scale notes: memory is ~40 B/distinct key per shard actor (Python dict
of int→int); shard count is chosen at creation and is the parallelism
AND memory unit — size n_shards so hot shards fit a node. All calls are
batched numpy in/out; no per-key RPCs.
"""

from __future__ import annotations

import numpy as np

from ..text.hashing import mix64


class _KeySetShard:
    """One shard: key → first owner. Plain class; wrapped by
    ray.remote in ShardedKeyIndex (keeps it unit-testable without a
    cluster)."""

    def __init__(self):
        self._owner: dict = {}

    def add_if_absent(self, keys: np.ndarray, owner: int) -> np.ndarray:
        d = self._owner
        out = np.empty(len(keys), dtype=bool)
        for i, k in enumerate(keys.tolist()):
            prev = d.get(k)
            if prev is None:
                d[k] = owner
                out[i] = True
            else:
                out[i] = prev == owner
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        d = self._owner
        return np.fromiter((k in d for k in keys.tolist()),
                           dtype=bool, count=len(keys))

    def size(self) -> int:
        return len(self._owner)


class ShardedKeyIndex:
    """Handle over N shard actors; all methods batched and
    shard-parallel (one RPC per touched shard)."""

    def __init__(self, n_shards: int = 16, num_cpus: float = 0.1):
        import ray
        self.n = n_shards
        actor = ray.remote(num_cpus=num_cpus)(_KeySetShard)
        self.shards = [actor.remote() for _ in range(n_shards)]

    def _route(self, keys: np.ndarray):
        k = np.asarray(keys).view(np.uint64) \
            if np.asarray(keys).dtype == np.int64 else \
            np.asarray(keys, dtype=np.uint64)
        sid = (mix64(k) % np.uint64(self.n)).astype(np.int64)
        order = np.argsort(sid, kind="stable")
        bounds = np.searchsorted(sid[order], np.arange(self.n + 1))
        return k, sid, order, bounds

    def _scatter_gather(self, keys, method, *args):
        import ray
        k, sid, order, bounds = self._route(keys)
        refs, spans = [], []
        for s in range(self.n):
            lo, hi = bounds[s], bounds[s + 1]
            if lo == hi:
                continue
            idx = order[lo:hi]
            refs.append(getattr(self.shards[s], method)
                        .remote(k[idx], *args))
            spans.append(idx)
        out = np.empty(len(k), dtype=bool)
        for idx, r in zip(spans, ray.get(refs)):
            out[idx] = r
        return out

    def add_if_absent(self, keys, owner: int) -> np.ndarray:
        """Boolean keep-mask: True where this (key, owner) is the
        first/owning insert. Duplicate keys WITHIN one call: the first
        occurrence wins (same order the shard receives them)."""
        return self._scatter_gather(keys, "add_if_absent", int(owner))

    def contains(self, keys) -> np.ndarray:
        return self._scatter_gather(keys, "contains")

    def size(self) -> int:
        import ray
        return int(sum(ray.get([s.size.remote() for s in self.shards])))


class StreamingDeduper:
    """Batch callable for streaming ingestion: content-hash each text,
    keep rows whose hash is globally first-seen (consulting the shared
    index). ``owner`` must be stable per batch across retries — pass
    the batch/partition id. NOTE: this mutates shared state, so drive
    it over a ONE-PASS consumption (iter_batches / a partition job),
    not inside a Dataset lineage that may re-execute."""

    def __init__(self, index: ShardedKeyIndex, text_col="text"):
        self.index = index
        self.text_col = text_col

    def __call__(self, batch, owner: int):
        import pyarrow as pa

        from ..text.dedup import content_hash64
        h = content_hash64(batch.column(self.text_col)).view(np.int64)
        # within-batch duplicates resolve locally (first occurrence);
        # only first occurrences consult the shared index — a retried
        # batch recomputes the identical mask (owner idempotency)
        _, first = np.unique(h, return_index=True)
        keep = np.zeros(len(h), dtype=bool)
        if len(first):
            keep[first] = self.index.add_if_absent(h[first], owner)
        return batch.filter(pa.array(keep))
