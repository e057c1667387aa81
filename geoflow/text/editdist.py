"""Vectorized Levenshtein edit distance — the fuzzy-dedup verifier:
after MinHash/SimHash candidate generation, the byte-level edit
distance is the exactness check that kills false-positive pairs
before they reach a drop set.

Semantics: distance over UTF-8 BYTES (insert/delete/substitute, unit
costs) — exactly DuckDB's ``levenshtein`` (measured: 'héllo'→'hello'
is 2, é is two bytes), so results value-gate directly.

Vectorization: the classic row DP has an in-row dependency
dp[j] = min(t[j], dp[j-1]+1); unrolling gives
dp[j] = min_{k<=j} (t[k] + j - k), i.e. one np.minimum.accumulate of
(t - j) per row — O(max_len) numpy passes over an (n_pairs, max_len)
matrix, no Python inner loop. Padded cells are computed but never
read: each pair's answer is harvested at its own (len_a, len_b) cell
the round its row index is reached."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pad_bytes(strs) -> tuple[np.ndarray, np.ndarray]:
    """list[bytes] → (n, max_len) uint8 matrix (0-padded) + lengths."""
    ln = np.array([len(s) for s in strs], np.int64)
    mx = int(ln.max()) if len(ln) else 0
    buf = np.frombuffer(b"".join(strs), np.uint8)
    starts = np.concatenate([[0], np.cumsum(ln)[:-1]]) if len(ln) \
        else np.empty(0, np.int64)
    idx = starts[:, None] + np.arange(max(mx, 1))[None, :]
    valid = np.arange(max(mx, 1))[None, :] < ln[:, None]
    mat = np.where(valid,
                   buf[np.minimum(idx, max(len(buf) - 1, 0))]
                   if len(buf) else 0, 0).astype(np.uint8)
    return mat[:, :mx] if mx else mat[:, :0], ln


def levenshtein_batch(a_strs, b_strs) -> np.ndarray:
    """Pairwise byte Levenshtein distance: a_strs[i] vs b_strs[i].
    Accepts str or bytes sequences (str encodes UTF-8)."""
    a = [s.encode() if isinstance(s, str) else bytes(s) for s in a_strs]
    b = [s.encode() if isinstance(s, str) else bytes(s) for s in b_strs]
    n = len(a)
    if n == 0:
        return np.empty(0, np.int64)
    A, la = _pad_bytes(a)
    B, lb = _pad_bytes(b)
    L1, L2 = A.shape[1], B.shape[1]
    pos = np.arange(L2 + 1, dtype=np.int64)
    dp = np.broadcast_to(pos, (n, L2 + 1)).copy()
    res = np.where(la == 0, lb, -1)
    seq = np.empty((n, L2 + 1), np.int64)
    for i in range(1, L1 + 1):
        cost = (A[:, i - 1][:, None] != B).astype(np.int64)
        seq[:, 0] = i
        np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost, out=seq[:, 1:])
        dp = pos + np.minimum.accumulate(seq - pos, axis=1)
        done = la == i
        if done.any():
            res[done] = dp[done, lb[done]]
    return res


def pair_edit_distances(docs, id_col: str = "doc_id",
                        text_col: str = "text", offset: int = 1,
                        prefix_chars: int = 200,
                        num_partitions: int = 8):
    """(id, lev) for each consecutive-id pair (k, k+offset): the
    byte Levenshtein distance of the two texts' first
    ``prefix_chars`` CHARACTERS (char slice == SQL substr; the
    distance itself is bytes). One hash join co-locates the pair
    sides; the DP runs vectorized per batch."""
    import pyarrow.compute as pc

    def left(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b.column(id_col),
            "text_a": pc.utf8_slice_codeunits(
                pc.cast(b.column(text_col), pa.string()),
                0, prefix_chars)})

    def right(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        return pa.table({
            "k": pc2.subtract(pc2.cast(b.column(id_col), pa.int64()),
                              pa.scalar(offset, pa.int64())),
            "text_b": pc2.utf8_slice_codeunits(
                pc2.cast(b.column(text_col), pa.string()),
                0, prefix_chars)})

    joined = docs.map_batches(left, batch_format="pyarrow").join(
        docs.map_batches(right, batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("k",), right_on=("k",))

    def dist(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "text_a" not in b.schema.names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "lev": pa.array([], pa.int64())})
        av = b.column("text_a").to_pylist()
        bv = b.column("text_b").to_pylist()
        return pa.table({
            id_col: pa.array(b.column("k").to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "lev": pa.array(levenshtein_batch(av, bv))})

    return joined.map_batches(dist, batch_format="pyarrow")


def damerau_batch(a_strs, b_strs, chunk: int = 256) -> np.ndarray:
    """Pairwise UNRESTRICTED Damerau-Levenshtein distance (Lowrance &
    Wagner 1975 — transposed substrings may be edited further, so
    'ca'→'abc' is 2, not OSA's 3) over UTF-8 BYTES — exactly DuckDB's
    ``damerau_levenshtein`` (fuzzed 300 random cases, 0 mismatches).

    Vectorization: the full (L1+2)×(L2+2) H matrix is kept per pair
    (the transposition term reaches back to arbitrary (k,l)), with the
    i/j loops scalar and every cell update a length-n vector op — plus
    an (n,256) last-occurrence table indexed by byte. O(L1·L2) numpy
    passes; pairs processed in ``chunk`` slices to bound the H
    allocation (chunk·L²·4 bytes, int32)."""
    a = [s.encode() if isinstance(s, str) else bytes(s) for s in a_strs]
    b = [s.encode() if isinstance(s, str) else bytes(s) for s in b_strs]
    out = np.empty(len(a), np.int64)
    for st in range(0, len(a), chunk):
        out[st:st + chunk] = _damerau_chunk(a[st:st + chunk],
                                            b[st:st + chunk])
    return out


def _damerau_chunk(a: list, b: list) -> np.ndarray:
    n = len(a)
    if n == 0:
        return np.empty(0, np.int64)
    A, la = _pad_bytes(a)
    B, lb = _pad_bytes(b)
    L1, L2 = A.shape[1], B.shape[1]
    INF = np.int32(L1 + L2 + 1)
    rows = np.arange(n)
    H = np.empty((n, L1 + 2, L2 + 2), np.int32)
    H[:, 0, :] = INF
    H[:, :, 0] = INF
    H[:, 1, 1:] = np.arange(L2 + 1, dtype=np.int32)
    H[:, 1:, 1] = np.arange(L1 + 1, dtype=np.int32)
    da = np.zeros((n, 256), np.int32)
    for i in range(1, L1 + 1):
        ai = A[:, i - 1]
        db = np.zeros(n, np.int32)
        for j in range(1, L2 + 1):
            bj = B[:, j - 1]
            k = da[rows, bj]
            l_ = db
            cost = (ai != bj).astype(np.int32)
            trans = (H[rows, k, l_]
                     + (np.int32(i) - k - 1) + 1 + (np.int32(j) - l_ - 1))
            cell = np.minimum(H[:, i, j] + cost,
                              np.minimum(H[:, i + 1, j] + 1,
                                         H[:, i, j + 1] + 1))
            H[:, i + 1, j + 1] = np.minimum(cell, trans)
            db = np.where(cost == 0, np.int32(j), db)
        da[rows, ai] = i
    return H[rows, la + 1, lb + 1].astype(np.int64)


def pair_damerau_distances(docs, id_col: str = "doc_id",
                           text_col: str = "text", offset: int = 1,
                           prefix_chars: int = 32,
                           num_partitions: int = 8):
    """(id, dl) for each consecutive-id pair (k, k+offset): the
    unrestricted Damerau-Levenshtein distance of the two texts'
    first ``prefix_chars`` CHARACTERS (char slice == SQL substr;
    the distance itself is bytes). Same one-hash-join shape as
    ``pair_edit_distances``."""
    import pyarrow.compute as pc

    def left(bt: pa.Table) -> pa.Table:
        return pa.table({
            "k": bt.column(id_col),
            "text_a": pc.utf8_slice_codeunits(
                pc.cast(bt.column(text_col), pa.string()),
                0, prefix_chars)})

    def right(bt: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.subtract(pc.cast(bt.column(id_col), pa.int64()),
                             pa.scalar(offset, pa.int64())),
            "text_b": pc.utf8_slice_codeunits(
                pc.cast(bt.column(text_col), pa.string()),
                0, prefix_chars)})

    joined = docs.map_batches(left, batch_format="pyarrow").join(
        docs.map_batches(right, batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("k",), right_on=("k",))

    def dist(bt: pa.Table) -> pa.Table:
        if bt.num_rows == 0 or "text_a" not in bt.schema.names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64())})
        av = bt.column("text_a").to_pylist()
        bv = bt.column("text_b").to_pylist()
        return pa.table({
            id_col: pa.array(bt.column("k").to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "dl": pa.array(damerau_batch(av, bv))})

    return joined.map_batches(dist, batch_format="pyarrow")
