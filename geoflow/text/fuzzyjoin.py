"""Fuzzy self-join within Levenshtein distance 1 via deletion-
neighborhood blocking (the SymSpell shape, Garbe 2012; the classic
spelling-correction / record-linkage candidate generator).

Why blocking: a naive fuzzy join is O(V²) string comparisons. Every
pair within edit distance 1 shares a DELETION KEY — for equal-length
(substitution) pairs, deleting the differing position from both gives
the same string; for length±1 (indel) pairs, deleting the inserted
char from the longer gives the shorter (its identity key). So
emitting each token's identity + all single-char deletions as keys
and co-locating by key finds EVERY true pair while touching only
O(V·L) rows. Shared keys are NOT sufficient (del_i(a)=del_j(b) with
i≠j can pair distance-2 tokens, e.g. abcd/acdx over "acd"), so a
vectorized verify pass rejects false candidates — the verify is
semantically load-bearing, not defensive.

Distributed shape: token distinct (groupby), deletion-key flat
emission (map_batches, padded-codepoint gathers — no per-token
Python), groupby(dk).map_groups pair emission (bucket sizes are
alphabet-bounded), pair distinct (groupby on the packed pair), one
vectorized verify map. All shuffles carry (key, token) rows only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["deletion_key_pairs"]

_MAXLEN = 24


def _codepoint_matrix(toks: np.ndarray, width: int):
    """(n, width) uint32 codepoint matrix (0-padded) + int64 lengths
    for a numpy unicode array."""
    lens = np.char.str_len(toks).astype(np.int64)
    m = toks.astype(f"<U{width}").view(np.uint32).reshape(len(toks),
                                                          width)
    return m, lens


def _matrix_to_str(m: np.ndarray) -> np.ndarray:
    """Rows of a 0-padded uint32 matrix back to a unicode array
    (NUL-truncated — the session-4 UTF-32 convention)."""
    w = m.shape[1] if m.ndim == 2 else 1
    return np.ascontiguousarray(m).view(f"<U{w}").reshape(-1)


def _is_lev1(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Levenshtein(a_i, b_i) == 1 for unicode arrays whose
    length difference is 0 or 1 (the blocking guarantee)."""
    n = len(a)
    if n == 0:
        return np.zeros(0, bool)
    w = _MAXLEN
    ma, la = _codepoint_matrix(a, w)
    mb, lb = _codepoint_matrix(b, w)
    out = np.zeros(n, bool)
    same = la == lb
    if same.any():
        out[same] = (ma[same] != mb[same]).sum(axis=1) == 1
    diff = ~same
    if diff.any():
        # orient: s = shorter row, l = longer row
        swap = la > lb
        ms = np.where(swap[:, None], mb, ma)
        ml = np.where(swap[:, None], ma, mb)
        ls = np.where(swap, lb, la)
        ok = np.zeros(n, bool)
        # delete position i of the longer, compare to the shorter:
        # prefix [0,i) equal AND suffix l[i+1:] == s[i:] — evaluated
        # as column-shifted equality with 0-padding alignment
        del_eq = np.zeros(n, bool)
        pref_eq = np.ones(n, bool)   # l[:i] == s[:i] so far
        for i in range(w - 1):
            # suffix check for deletion at i: l[i+1+j] == s[i+j] for
            # all j while i+j < ls (0-padding makes tails equal too)
            suf = (ml[:, i + 1:] == ms[:, i:w - 1]).all(axis=1)
            # the final longer column must be padding-compatible:
            # ml[:, w-1] corresponds to s position w-2 shifted — the
            # slice above already covers it for tokens < w-1 long
            del_eq |= pref_eq & suf & (i <= ls)
            pref_eq &= ml[:, i] == ms[:, i]
        ok = del_eq
        out[diff] = ok[diff]
    return out


def deletion_key_pairs(tokens_ds, tok_col: str = "tok",
                       max_len: int = _MAXLEN - 2):
    """Dataset (tok1, tok2, len_delta): all DISTINCT unordered pairs
    of distinct input tokens at Levenshtein distance exactly 1
    (tok1 < tok2 lexicographically), via deletion-key blocking.
    Tokens longer than ``max_len`` are dropped (documented cap; the
    fixed-width codepoint kernels need a bound)."""
    import ray.data
    from ray.data.aggregate import Count

    from ..join.semijoin import drop_schemaless_blocks

    def distinct_prep(b: pa.Table) -> pa.Table:
        t = b.column(tok_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        arr = np.unique(np.asarray(t, dtype=str))
        if len(arr):
            arr = arr[np.char.str_len(arr) <= max_len]
        return pa.table({"tok": pa.array(arr, pa.string())})

    toks = tokens_ds.map_batches(distinct_prep, batch_format="pyarrow") \
        .groupby("tok").aggregate(Count())

    def emit_keys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "tok" not in b.schema.names:
            return pa.table({"dk": pa.array([], pa.string()),
                             "tok": pa.array([], pa.string())})
        t = np.asarray(b.column("tok"), dtype=str)
        w = _MAXLEN
        m, lens = _codepoint_matrix(t, w)
        dks = [t]                       # identity key
        owners = [t]
        for i in range(int(lens.max()) if len(lens) else 0):
            has = lens > i
            if not has.any():
                break
            sub = m[has]
            d = np.concatenate([sub[:, :i], sub[:, i + 1:],
                                np.zeros((len(sub), 1), np.uint32)],
                               axis=1)
            dks.append(_matrix_to_str(d))
            owners.append(t[has])
        return pa.table({"dk": pa.array(np.concatenate(dks)),
                         "tok": pa.array(np.concatenate(owners))})

    keyed = toks.map_batches(emit_keys, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        t = np.unique(np.asarray(g.column("tok"), dtype=str))
        n = len(t)
        if n < 2:
            return pa.table({"tok1": pa.array([], pa.string()),
                             "tok2": pa.array([], pa.string())})
        iu, ju = np.triu_indices(n, k=1)
        return pa.table({"tok1": pa.array(t[iu]),
                         "tok2": pa.array(t[ju])})

    pairs = keyed.groupby("dk").map_groups(bucket_pairs,
                                           batch_format="pyarrow")
    pairs, _keep = drop_schemaless_blocks(pairs)
    if pairs is None:
        return ray.data.from_arrow(pa.table({
            "tok1": pa.array([], pa.string()),
            "tok2": pa.array([], pa.string()),
            "len_delta": pa.array([], pa.int64())}))
    dedup = pairs.groupby(["tok1", "tok2"]).aggregate(Count())

    def verify(b: pa.Table) -> pa.Table:
        empty = pa.table({"tok1": pa.array([], pa.string()),
                          "tok2": pa.array([], pa.string()),
                          "len_delta": pa.array([], pa.int64())})
        if b.num_rows == 0 or "tok1" not in b.schema.names:
            return empty
        a = np.asarray(b.column("tok1"), dtype=str)
        c = np.asarray(b.column("tok2"), dtype=str)
        la = np.char.str_len(a).astype(np.int64)
        lc = np.char.str_len(c).astype(np.int64)
        near = np.abs(la - lc) <= 1
        ok = np.zeros(len(a), bool)
        ok[near] = _is_lev1(a[near], c[near])
        return pa.table({"tok1": pa.array(a[ok]),
                         "tok2": pa.array(c[ok]),
                         "len_delta": pa.array(np.abs(la - lc)[ok])})

    return dedup.map_batches(verify, batch_format="pyarrow")
