from .keyset import ShardedKeyIndex, StreamingDeduper

__all__ = ["ShardedKeyIndex", "StreamingDeduper"]
