"""Sequence packing: assign documents to fixed-token-length training
sequences (GPT-style concat-and-split batching).

A pretraining data loader concatenates the token streams of many
documents and slices the stream into fixed ``seq_len`` windows; the
pipeline must therefore know, per document, WHICH sequences its tokens
land in (for shard manifests, loss masking across doc boundaries, and
resumable shard writes). No reference equivalent (SURVEY.md §2.7) —
this is a first-class corpus-pipeline component like dedup and
decontamination.

Determinism contract (resume / retry / oracle safety): packing must
not depend on Ray block order. Documents are grouped into *packing
buckets* of ``bucket_docs`` consecutive keys (``bucket = key //
bucket_docs``); the token stream is concatenated in key order WITHIN
each bucket and split every ``seq_len`` tokens, with sequence ids
numbered bucket-locally and made global as ``bucket * 2^32 + local``.
Every quantity is integer arithmetic over (key, n_tokens), so the
result is bit-identical across engines, retries and partitionings —
and expressible as a plain SQL window function for the oracle gate.

Scale shape: the same salt-bucket pattern as ops/temporal.sessionize —
buckets are hashed into ``num_salt`` groups (∝ cluster size, NOT key
count), each group is lexsorted once and swept with one vectorized
segmented-cumsum pass. Only (key, n_tokens[, carried columns]) rows
enter the groupby shuffle; at 10^12 docs that is a ~16 B/row exchange,
and the 2^32 sequence-id stride bounds each bucket at 2^32·seq_len
tokens before ids would collide (unreachable for any sane
bucket_docs)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import mix64

__all__ = ["pack_sequences"]


def pack_sequences(ds, ntok_col: str = "n_tokens", key_col: str = "doc_id",
                   seq_len: int = 2048, bucket_docs: int = 1024,
                   num_salt: int = 64, keep_cols=None):
    """Rows of ``ds`` + int64 ``seq_first`` / ``seq_last`` — the global
    ids of the first and last training sequence holding any of the
    doc's tokens. Zero-token docs get seq_first == seq_last == the
    sequence at their stream offset (they occupy no tokens but keep a
    well-defined position for manifest ordering).

    ``keep_cols`` limits the columns carried through the shuffle
    (default: all — pass the manifest columns only at scale)."""

    def bucket(batch: pa.Table) -> pa.Table:
        if keep_cols is not None:
            batch = batch.select(list(dict.fromkeys(
                [key_col, ntok_col, *keep_cols])))
        key = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bk = key // np.int64(bucket_docs)
        salt = mix64(bk.view(np.uint64)) % np.uint64(num_salt)
        batch = batch.append_column("_pack_bucket", pa.array(bk))
        return batch.append_column("_pack_salt",
                                   pa.array(salt.view(np.int64)))

    def pack(group: pa.Table) -> pa.Table:
        n = group.num_rows
        key = group.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bk = group.column("_pack_bucket").to_numpy(zero_copy_only=False)
        nt = group.column(ntok_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((key, bk))
        bk_s, nt_s = bk[order], nt[order]
        new_b = np.empty(n, dtype=bool)
        new_b[0] = True
        new_b[1:] = bk_s[1:] != bk_s[:-1]
        cum = np.cumsum(nt_s)
        start = cum - nt_s
        first = np.nonzero(new_b)[0]
        runs = np.diff(np.append(first, n))
        start -= np.repeat(start[first], runs)  # within-bucket offsets
        end = start + nt_s
        sf = start // seq_len
        sl = np.where(nt_s == 0, sf, (end - 1) // seq_len)
        base = bk_s * np.int64(1 << 32)
        out = group.take(pa.array(order, type=pa.int64()))
        out = out.drop_columns(["_pack_bucket", "_pack_salt"])
        out = out.append_column("seq_first", pa.array(base + sf))
        return out.append_column("seq_last", pa.array(base + sl))

    return ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_pack_salt").map_groups(pack, batch_format="pyarrow")
