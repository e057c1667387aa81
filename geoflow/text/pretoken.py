"""Vectorized BPE pre-tokenization (numpy codepoint-class machine).

Replaces the per-doc Python ``re.findall`` loop in the BPE histogram /
encode hot pass (the single hottest text loop in tokenizer training —
round-3 verdict) with an exact, vectorized reimplementation of the
GPT-2-style split pattern

    '(?:s|t|re|ve|m|ll|d)| ?[^\\W\\d_]+| ?\\d+| ?(?:[^\\s\\w']|_)+|\\s+

over the batch's flat codepoint array.  Python-level work drops to the
DISTINCT-word rate (Zipf-amortized): only first occurrences of unique
pre-tokens are materialized as strings.

Exactness argument (each rule mirrors one regex alternative, in
alternation order; tests/test_pretoken.py fuzzes parity vs re.findall):

* Per-codepoint classes are built by running THE SAME ``re`` engine
  over every codepoint once per process (``[^\\W\\d_]`` → LET, ``\\d``
  → DIG, ``\\s`` → SPC, ``'`` → APOS, rest → OTH), so class membership
  is parity-by-construction, not a re-derivation of Unicode tables.
  ``_`` lands in OTH, matching ``(?:[^\\s\\w']|_)`` exactly (other-run
  chars = complement of SPC∪LET∪DIG∪{'}).
* A token is a maximal same-class run; the apostrophe is its own class
  so no run ever crosses one, and ``'`` is never consumed by a
  preceding token — every APOS position is reachable by the scan.
* Contractions: at each ``'``, length-2 if the next codepoint is one
  of ``stmd``, else length-3 for ``re|ve|ll`` (first chars disjoint, so
  the regex's left-to-right alternative order reduces to this).  The
  following letter run loses its consumed prefix; lone apostrophes
  produce no token (lossy by design, same as the regex).
* Space-steal (`` ?``): a whitespace run joins the NEXT token iff it
  has length EXACTLY 1, is literal U+0020, and the next run is
  LET/DIG/OTH — because at a longer run the `` ?X+`` alternatives fail
  on the second whitespace char and greedy ``\\s+`` then eats the
  whole run including the trailing space (the committed pattern is
  lookahead-free; GPT-2's ``\\s+(?!\\S)`` variant would differ here).
* Doc boundaries: texts join on NUL, whose positions get a BOUND class
  that can extend no run.  If a document itself contains NUL (checked
  by separator count), the caller must fall back to the re path.

Token identity is EXACT: a 64-bit segment polynomial hash (prefix sums
+ modular-inverse power normalization, powers via two 65536-entry
lookup tables instead of an O(n) cumprod) groups candidate duplicates,
then every token is content-compared against its group representative
with two flat gathers — a hash collision (probability ~2^-64 per
batch-pair) is DETECTED and the batch falls back to the re path, so
the result is always the true multiset of pre-tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pretokenize", "token_spans", "Pretok"]

OTH, LET, DIG, SPC, APOS, BOUND = 0, 1, 2, 3, 4, 5

_CLASS_TAB: np.ndarray | None = None


def _class_table() -> np.ndarray:
    global _CLASS_TAB
    if _CLASS_TAB is None:
        import re
        tab = np.zeros(0x110000, np.uint8)  # default OTH
        all_chars = "".join(map(chr, range(0x110000)))
        for cid, pat in ((LET, r"[^\W\d_]"), (DIG, r"\d"), (SPC, r"\s")):
            rx = re.compile(pat)
            idx = np.fromiter((ord(c) for c in rx.findall(all_chars)),
                              np.int64)
            tab[idx] = cid
        tab[0x27] = APOS
        _CLASS_TAB = tab
    return _CLASS_TAB


def token_spans(texts: list[str]):
    """Exact GPT-2-pattern pre-tokenization of ``texts``.

    Returns ``None`` if any text contains NUL (caller falls back to the
    Python ``re`` path), else ``(joined, cp, ts, te, doc_of)`` where
    ``joined[ts[i]:te[i]]`` is token ``i`` (codepoint indices; Python
    str indexing is codepoint-based) in scan order, ``doc_of[i]`` its
    document, ``cp`` the uint32 codepoint array of ``joined``."""
    joined = "\x00".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    n = len(cp)
    seps = np.flatnonzero(cp == 0)
    if len(seps) != len(texts) - 1:
        return None  # a document contains NUL — fast path invalid
    empty = np.empty(0, np.int64)
    if n == 0:
        return joined, cp, empty, empty, empty
    cls = _class_table()[cp]
    if len(seps):
        cls[seps] = BOUND

    # maximal same-class runs
    rs = np.flatnonzero(np.concatenate(([True], cls[1:] != cls[:-1])))
    ends = np.append(rs[1:], n).astype(np.int64)
    starts = rs.astype(np.int64).copy()
    kind = cls[rs]
    dead = np.zeros(len(rs), bool)

    # contractions: value-compare the next 1-2 codepoints (a separator
    # or array end reads as 0, which matches no suffix letter)
    ap = np.flatnonzero(cls == APOS)
    capos = empty
    clens = empty
    if len(ap):
        c1 = np.where(ap + 1 < n, cp[np.minimum(ap + 1, n - 1)], 0)
        c2 = np.where(ap + 2 < n, cp[np.minimum(ap + 2, n - 1)], 0)
        l2 = ((c1 == 0x73) | (c1 == 0x74) | (c1 == 0x6D)
              | (c1 == 0x64))                       # s t m d
        l3 = (~l2) & (((c1 == 0x72) & (c2 == 0x65))   # re
                      | ((c1 == 0x76) & (c2 == 0x65))  # ve
                      | ((c1 == 0x6C) & (c2 == 0x6C)))  # ll
        clen = np.where(l2, 2, np.where(l3, 3, 0)).astype(np.int64)
        hit = clen > 0
        capos, clens = ap[hit].astype(np.int64), clen[hit]
        if len(capos):
            # the LET run starting at '+1 loses the consumed prefix
            ri = np.searchsorted(rs, capos + 1)
            starts[ri] = capos + clens
            dead[ri] |= starts[ri] >= ends[ri]

    # space-steal: single-U+0020 whitespace run + following LET/DIG/OTH
    spc = np.flatnonzero((kind == SPC) & ~dead)
    if len(spc):
        nx = spc + 1
        valid = nx < len(rs)
        nxi = np.where(valid, nx, 0)
        cond = (valid & (ends[spc] - starts[spc] == 1)
                & (cp[starts[spc]] == 0x20)
                & np.isin(kind[nxi], (LET, DIG, OTH))
                & ~dead[nxi] & (starts[nxi] == ends[spc]))
        steal = spc[cond]
        if len(steal):
            starts[steal + 1] -= 1
            dead[steal] = True

    keep = ~dead & np.isin(kind, (LET, DIG, OTH, SPC))
    ts = np.concatenate([starts[keep], capos])
    te = np.concatenate([ends[keep], capos + clens])
    order = np.argsort(ts, kind="stable")
    ts, te = ts[order], te[order]
    doc_of = (np.searchsorted(seps, ts).astype(np.int64)
              if len(seps) else np.zeros(len(ts), np.int64))
    return joined, cp, ts, te, doc_of


_R1 = np.uint64(0x9E3779B97F4A7C15)   # odd → invertible mod 2^64

_POW_TABS: dict = {}


def _inv_u64(r: np.uint64) -> np.uint64:
    x = int(r)
    for _ in range(6):  # Newton: doubles correct low bits each step
        x = (x * (2 - int(r) * x)) % (1 << 64)
    return np.uint64(x)


def _pow_tables(r: np.uint64):
    """(T0, T1) with r^i = T0[i & 0xFFFF] · T1[i >> 16] for i < 2^32 —
    two gathers replace an O(n) sequential cumprod per batch."""
    tabs = _POW_TABS.get(int(r))
    if tabs is None:
        t0 = np.full(1 << 16, r, np.uint64)
        t0[0] = 1
        np.cumprod(t0, out=t0)
        r16 = t0[-1] * r  # r^65536
        t1 = np.full(1 << 16, r16, np.uint64)
        t1[0] = 1
        np.cumprod(t1, out=t1)
        tabs = (t0, t1)
        _POW_TABS[int(r)] = tabs
    return tabs


def _powers(r: np.uint64, idx: np.ndarray) -> np.ndarray:
    t0, t1 = _pow_tables(r)
    return t0[idx & 0xFFFF] * t1[idx >> 16]


def _token_groups(cp: np.ndarray, ts: np.ndarray, te: np.ndarray):
    """Group identical spans of ``cp``: returns (first, inv, counts)
    over distinct tokens, or None on a (detected) 64-bit hash
    collision.  h(a,b) = (S[b]-S[a])·r^{-a} with S prefix sums of
    cp[i]·r^i groups candidates; exact content comparison against each
    group representative then PROVES the grouping."""
    n = len(cp)
    c64 = cp.astype(np.uint64)
    with np.errstate(over="ignore"):
        pw = _powers(_R1, np.arange(n, dtype=np.int64))
        s = np.zeros(n + 1, np.uint64)
        np.cumsum(c64 * pw, out=s[1:])
        ipw = _powers(_inv_u64(_R1), ts.astype(np.int64))
        ln = (te - ts).astype(np.uint64)
        h = ((s[te] - s[ts]) * ipw) ^ (ln * _R1)
    uniq, first, inv, counts = np.unique(
        h, return_index=True, return_inverse=True, return_counts=True)
    # exact verification: every token == its group representative
    ll = (te - ts).astype(np.int64)
    rep = first[inv]
    if not np.array_equal(ll, ll[rep]):
        return None
    tot = int(ll.sum())
    cum = np.zeros(len(ll), np.int64)
    np.cumsum(ll[:-1], out=cum[1:])
    within = np.arange(tot, dtype=np.int64) - np.repeat(cum, ll)
    if not np.array_equal(cp[np.repeat(ts, ll) + within],
                          cp[np.repeat(ts[rep], ll) + within]):
        return None
    return first, inv, counts


class Pretok:
    """Distinct-rate view of one batch's pre-tokens.

    words:  distinct pre-token strings (first-occurrence extraction —
            the ONLY Python-level per-item work, at the distinct rate)
    counts: int64 occurrences per distinct word
    inv:    int64[n_tokens] token → distinct index, in scan order
    doc_of: int64[n_tokens] token → document index
    n_docs: number of documents in the batch
    """

    __slots__ = ("words", "counts", "inv", "doc_of", "n_docs")

    def __init__(self, words, counts, inv, doc_of, n_docs):
        self.words = words
        self.counts = counts
        self.inv = inv
        self.doc_of = doc_of
        self.n_docs = n_docs


def _pretok_re(texts: list[str]) -> Pretok:
    """Python ``re`` fallback (NUL-containing documents)."""
    import re
    from .bpetrain import BPE_SPLIT_PATTERN_PY
    rx = re.compile(BPE_SPLIT_PATTERN_PY)
    words: list[str] = []
    index: dict[str, int] = {}
    inv: list[int] = []
    doc_of: list[int] = []
    for di, s in enumerate(texts):
        for w in rx.findall(s or ""):
            j = index.setdefault(w, len(words))
            if j == len(words):
                words.append(w)
            inv.append(j)
            doc_of.append(di)
    counts = np.bincount(np.asarray(inv, np.int64), minlength=len(words)) \
        .astype(np.int64) if words else np.empty(0, np.int64)
    return Pretok(words, counts,
                  np.asarray(inv, np.int64), np.asarray(doc_of, np.int64),
                  len(texts))


def pretokenize(col) -> Pretok:
    """Arrow string array/chunked array → Pretok for the batch."""
    s = pc.fill_null(pc.cast(col, pa.string()), "")
    texts = s.to_pylist()
    spans = token_spans(texts)
    if spans is None:
        return _pretok_re(texts)
    joined, cp, ts, te, doc_of = spans
    if len(ts) == 0:
        return Pretok([], np.empty(0, np.int64), np.empty(0, np.int64),
                      doc_of, len(texts))
    groups = _token_groups(cp, ts, te)
    if groups is None:  # detected 64-bit collision (~2^-64/pair): exact path
        return _pretok_re(texts)
    first, inv, counts = groups
    words = [joined[a:b] for a, b in zip(ts[first], te[first])]
    return Pretok(words, counts.astype(np.int64), inv.astype(np.int64),
                  doc_of, len(texts))
