"""Sharded mutable key index (geoflow/state/keyset.py): first-seen-wins
masks, retry idempotency via owner tags, shard routing, and streaming
dedup equivalence with the batch engine under ordered arrival."""

import numpy as np
import pyarrow as pa
import pytest


class TestShardedKeyIndex:
    def test_first_seen_wins_and_contains(self, ray_session):
        from geoflow.state import ShardedKeyIndex
        idx = ShardedKeyIndex(n_shards=4)
        a = np.array([1, 2, 3, 4, 5], dtype=np.int64)
        assert idx.add_if_absent(a, owner=0).all()
        b = np.array([4, 5, 6, 7], dtype=np.int64)
        m = idx.add_if_absent(b, owner=1)
        assert m.tolist() == [False, False, True, True]
        assert idx.contains(np.array([1, 6, 99],
                                     dtype=np.int64)).tolist() == \
            [True, True, False]
        assert idx.size() == 7

    def test_retry_idempotent(self, ray_session):
        from geoflow.state import ShardedKeyIndex
        idx = ShardedKeyIndex(n_shards=3)
        keys = np.arange(100, dtype=np.int64)
        m1 = idx.add_if_absent(keys, owner=7)
        # the same task retries: identical mask, no self-shadowing
        m2 = idx.add_if_absent(keys, owner=7)
        assert np.array_equal(m1, m2) and m1.all()
        # a different owner is still refused
        assert not idx.add_if_absent(keys, owner=8).any()
        assert idx.size() == 100

    def test_shard_routing_covers_all_keys(self, ray_session):
        from geoflow.state import ShardedKeyIndex
        idx = ShardedKeyIndex(n_shards=5)
        keys = np.arange(0, 5000, dtype=np.int64)
        assert idx.add_if_absent(keys, owner=0).all()
        assert idx.size() == 5000
        # every shard got a nontrivial share (mix64 uniformity)
        import ray
        sizes = ray.get([s.size.remote() for s in idx.shards])
        assert min(sizes) > 500

    def test_streaming_dedup_matches_batch_dedup(self, ray_session):
        """Micro-batches arriving in doc_id order: streaming first-seen
        == batch min-key dedup."""
        import ray
        from geoflow.state import ShardedKeyIndex, StreamingDeduper
        from geoflow.text.dedup import exact_dedup
        n = 400
        t = pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"content {i % 60}" for i in range(n)])})
        idx = ShardedKeyIndex(n_shards=4)
        dedup = StreamingDeduper(idx)
        survivors = []
        for start in range(0, n, 64):        # ticks of arriving data
            b = t.slice(start, 64)
            out = dedup(b, owner=start)
            survivors.extend(out.column("doc_id").to_pylist())
        batch = sorted(r["doc_id"] for r in exact_dedup(
            ray.data.from_arrow(t), key_col="doc_id").take_all())
        assert sorted(survivors) == batch == list(range(60))

    def test_within_batch_duplicates(self, ray_session):
        from geoflow.state import ShardedKeyIndex, StreamingDeduper
        idx = ShardedKeyIndex(n_shards=2)
        t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                      "text": pa.array(["same", "same", "other"])})
        out = StreamingDeduper(idx)(t, owner=0)
        assert out.column("doc_id").to_pylist() == [0, 2]
