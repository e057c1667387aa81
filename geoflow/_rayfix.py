"""Targeted runtime fix for a Ray 2.49 hash-shuffle schema-broadcast bug.

Bug (ray/data/_internal/execution/operators/hash_shuffle.py): the FIRST
block of each input sequence of a hash-shuffle operator (join, hash
aggregate) is dispatched with ``send_empty_blocks=True`` so that every
aggregator receives an empty typed shard and learns the sequence's
schema; the operator then sets ``_has_schemas_broadcasted[input]=True``
unconditionally. But ``_shuffle_block`` EARLY-RETURNS on
``block.num_rows == 0`` *before* the ``send_empty_blocks`` fan-out — so
when the first block to arrive is empty (normal for the output of an
upstream join/aggregate with an empty partition, a race on anything
streamed), the schema broadcast is silently swallowed and any
aggregator partition that receives no real rows on that side finalizes
against a schema-less ``pa.table({})``:

    pyarrow.lib.ArrowInvalid: No match or multiple matches for key
    field reference FieldRef.Name(<key>) on <left|right> side of join

This makes chained ``Dataset.join`` calls (pair set -> join emb_a ->
join emb_b, as in vector/ann.py and text/dedup.py) fail whenever a
candidate set is small enough to leave a join partition empty — and
flakily, since it depends on block arrival order.

Fix: wrap ``_shuffle_block`` so that an EMPTY block with a KNOWN schema
dispatched with ``send_empty_blocks=True`` fans out empty typed shards
to every aggregator (exactly what the flag asks for) instead of
returning early. Non-empty blocks and schema-less empties (no schema to
broadcast — callers must sanitize those, see
join/semijoin.py drop_schemaless_blocks) fall through to the original.

Applied from geoflow/__init__ under a version + signature guard; if Ray
internals don't match, the engine runs unpatched (operators that feed
possibly-empty small sides through chained joins sanitize with
drop_schemaless_blocks, which also removes 0-row blocks, so the
library's own pipelines stay correct either way).
"""

from __future__ import annotations

__all__ = ["apply_hash_shuffle_schema_fix"]

_APPLIED = False


def apply_hash_shuffle_schema_fix() -> bool:
    """Install the patched ``_shuffle_block``; returns True if active."""
    global _APPLIED
    if _APPLIED:
        return True
    try:
        import inspect

        import ray
        from ray.data._internal.execution.operators import (
            hash_shuffle as _hs)

        if not ray.__version__.startswith("2.49"):
            return False
        orig_remote = _hs._shuffle_block
        orig_fn = orig_remote._function
        params = inspect.signature(orig_fn).parameters
        expected = {"block", "input_index", "key_columns", "pool",
                    "block_transformer", "send_empty_blocks",
                    "override_partition_id"}
        if not expected.issubset(params):
            return False

        def _shuffle_block_fixed(block, input_index, key_columns, pool,
                                 block_transformer=None,
                                 send_empty_blocks=False,
                                 override_partition_id=None):
            from ray.data._internal.execution.operators.hash_shuffle \
                import _create_empty_table
            from ray.data._internal.table_block import TableBlockAccessor
            from ray.data.block import (BlockAccessor, BlockExecStats,
                                        BlockType)
            import ray as _r

            b = block
            if block_transformer is not None:
                b = block_transformer(b)
            b = TableBlockAccessor.try_convert_block_type(
                b, block_type=BlockType.ARROW)
            if (b.num_rows == 0 and send_empty_blocks
                    and len(b.schema) > 0):
                stats = BlockExecStats.builder()
                empty = _create_empty_table(b.schema)
                waits = []
                for pid in range(pool.num_partitions):
                    agg = pool.get_aggregator_for_partition(pid)
                    ref = _r.put(empty)
                    waits.append(agg.submit.remote(input_index, pid, ref))
                _r.get(waits)
                meta = BlockAccessor.for_block(b).get_metadata(
                    exec_stats=stats.build())
                return (meta, {})
            # transformed block forwarded; do NOT re-apply the transformer
            return orig_fn(
                b, input_index, key_columns, pool,
                block_transformer=None,
                send_empty_blocks=send_empty_blocks,
                override_partition_id=override_partition_id)

        _hs._shuffle_block = ray.remote(_shuffle_block_fixed)
        _hs._geoflow_schema_fix = True
        _APPLIED = True
        return True
    except Exception:
        return False
