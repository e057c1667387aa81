"""Gopher §A1.2 within-document repetition signals (Rae et al. 2021,
Table A1 — public corpus-filtering heuristics; the reference engine has
no equivalent, this is part of the training-data-pipeline layer).

Per document:
- duplicate line / paragraph fraction: repeated-occurrence mass
  ``(n - n_distinct) / n`` over non-empty fragments (lines split on
  ``\\n``, paragraphs on the RE2 pattern ``\\n\\n+``).
- duplicate line / paragraph CHARACTER fraction: characters in
  occurrences beyond each fragment's first, over all fragment chars.
- top n-gram character fraction (n = 2, 3, 4): chars covered by the
  most frequent word n-gram, ``count * gram_len / total_chars`` where
  ``gram_len`` = token lengths + single joining spaces (== the length
  of the space-joined gram string). Ties on count take the longest
  gram (deterministic in both engines).
- duplicate n-gram character fraction (n = 5..10): ``sum over grams
  with count > 1 of count * gram_len / total_chars``. Overlapping
  occurrences are each counted (the published definition de-overlaps;
  this over-counting approximation is monotone in repetition and can
  exceed 1 — documented, and mirrored exactly by the SQL oracle).

Tokens are maximal ``[\\p{L}\\p{N}_]+`` runs of the lowercased text
(hashing.tokenize — RE2, reproducible in DuckDB). ``total_chars`` =
character length of the raw text.

``repetition_keep`` applies the published Gopher discard thresholds
(0.30/0.30 line/para frac, 0.20/0.20 char frac, 0.20/0.18/0.16 top
2/3/4-gram, 0.15..0.10 dup 5..10-gram) as INTEGER cross-multiplied
comparisons — no float threshold literals, bit-identical in SQL.

Fragment/gram identity is 64-bit hashed (hashing.hash64); tokens carry
no spaces so the space-joined gram string the oracle groups by is
injective w.r.t. the token tuple — hash collisions are the only
divergence source (~2^-64 per doc-pair, accepted repo-wide).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash64, mix64, tokenize

_FNV = np.uint64(0x100000001B3)

# (n, numerator multiplier, denominator multiplier): frac <= mult_d/mult_n
TOP_NGRAM_THRESHOLDS = [(2, 5, 1), (3, 50, 9), (4, 25, 4)]
DUP_NGRAM_THRESHOLDS = [(5, 20, 3), (6, 50, 7), (7, 100, 13),
                        (8, 25, 3), (9, 100, 11), (10, 10, 1)]


def _np(arr) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False)


def _frag_stats(lists, n_docs: int):
    """(n, n_distinct, chars, chars_distinct) int64 per doc for a
    list<string> fragment column; empty fragments dropped."""
    flat = pc.list_flatten(lists)
    parent = _np(pc.list_parent_indices(lists)).astype(np.int64)
    lens = _np(pc.utf8_length(flat)).astype(np.int64)
    keep = lens > 0
    parent, lens = parent[keep], lens[keep]
    zeros = np.zeros(n_docs, dtype=np.int64)
    if not len(parent):
        return zeros, zeros.copy(), zeros.copy(), zeros.copy()
    if not keep.all():
        flat = flat.take(pa.array(np.nonzero(keep)[0], type=pa.int64()))
    h = hash64(flat).view(np.int64)
    n = np.bincount(parent, minlength=n_docs)
    chars = np.bincount(parent, weights=lens,
                        minlength=n_docs).astype(np.int64)
    order = np.lexsort((h, parent))
    ps, hs, ls = parent[order], h[order], lens[order]
    new_run = np.ones(len(hs), dtype=bool)
    new_run[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
    nd = np.bincount(ps[new_run], minlength=n_docs)
    chars_d = np.bincount(ps[new_run], weights=ls[new_run],
                          minlength=n_docs).astype(np.int64)
    return n, nd, chars, chars_d


def _ngram_runs(h: np.ndarray, parent: np.ndarray, cum_len: np.ndarray,
                n: int):
    """Per-(doc, n-gram) runs: (run_doc, count, gram_char_len) with
    gram_char_len = token lengths + (n-1) joining spaces."""
    m = len(h) - (n - 1)
    if m <= 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    valid = parent[:m] == parent[n - 1:]
    g = h[:m].copy()
    for k in range(1, n):
        g = mix64((g * _FNV) ^ h[k:m + k])
    glen = cum_len[n:] - cum_len[:-n] + (n - 1)
    gp = parent[:m][valid]
    gh = g[valid].view(np.int64)
    gl = glen[valid]
    if not len(gp):
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    order = np.lexsort((gh, gp))
    ps, hs, ls = gp[order], gh[order], gl[order]
    new_run = np.ones(len(hs), dtype=bool)
    new_run[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
    starts = np.nonzero(new_run)[0]
    counts = np.diff(np.append(starts, len(hs)))
    return ps[new_run], counts.astype(np.int64), ls[new_run]


def gopher_repetition_batch(batch: pa.Table, text_col="text") -> pa.Table:
    texts = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
    nd_ = batch.num_rows
    total = np.maximum(_np(pc.utf8_length(texts)).astype(np.int64), 0)

    ln, lnd, lch, lchd = _frag_stats(pc.split_pattern(texts, "\n"), nd_)
    pn, pnd, pch, pchd = _frag_stats(
        pc.split_pattern_regex(texts, "\n\n+"), nd_)

    flat, parent = tokenize(texts)
    tl = _np(pc.utf8_length(flat)).astype(np.int64)
    th = hash64(flat)
    cum = np.concatenate([[0], np.cumsum(tl)])

    top_num = {}   # n -> count_top * len_top per doc
    dup_num = {}   # n -> sum count*len over count>1 runs per doc
    for n, _, _ in TOP_NGRAM_THRESHOLDS:
        rd, rc, rl = _ngram_runs(th, parent, cum, n)
        num = np.zeros(nd_, dtype=np.int64)
        if len(rd):
            docs = np.unique(rd)
            starts = np.searchsorted(rd, docs)
            ct = np.maximum.reduceat(rc, starts)
            ct_full = np.zeros(nd_, dtype=np.int64)
            ct_full[docs] = ct
            lt_cand = np.where(rc == ct_full[rd], rl, -1)
            lt = np.maximum.reduceat(lt_cand, starts)
            num[docs] = ct * lt
        top_num[n] = num
    for n, _, _ in DUP_NGRAM_THRESHOLDS:
        rd, rc, rl = _ngram_runs(th, parent, cum, n)
        contrib = np.where(rc > 1, rc * rl, 0)
        dup_num[n] = (np.bincount(rd, weights=contrib, minlength=nd_)
                      .astype(np.int64) if len(rd)
                      else np.zeros(nd_, dtype=np.int64))

    def frac(num, den):
        return num.astype(np.float64) / np.maximum(den, 1)

    tot1 = np.maximum(total, 1)
    keep = np.ones(nd_, dtype=bool)
    keep &= (ln - lnd) * 10 <= 3 * ln
    keep &= (pn - pnd) * 10 <= 3 * pn
    keep &= (lch - lchd) * 5 <= lch
    keep &= (pch - pchd) * 5 <= pch
    for n, mn, md in TOP_NGRAM_THRESHOLDS:
        keep &= top_num[n] * mn <= md * tot1
    for n, mn, md in DUP_NGRAM_THRESHOLDS:
        keep &= dup_num[n] * mn <= md * tot1

    out = batch
    cols = [
        ("n_lines", pa.array(ln)),
        ("dup_line_frac", pa.array(frac(ln - lnd, ln))),
        ("dup_line_char_frac", pa.array(frac(lch - lchd, lch))),
        ("n_paras", pa.array(pn)),
        ("dup_para_frac", pa.array(frac(pn - pnd, pn))),
        ("dup_para_char_frac", pa.array(frac(pch - pchd, pch))),
    ]
    for n, _, _ in TOP_NGRAM_THRESHOLDS:
        cols.append((f"top_{n}gram_char_frac",
                     pa.array(frac(top_num[n], tot1))))
    for n, _, _ in DUP_NGRAM_THRESHOLDS:
        cols.append((f"dup_{n}gram_char_frac",
                     pa.array(frac(dup_num[n], tot1))))
    cols.append(("repetition_keep",
                 pa.array(keep.astype(np.int64))))
    for name, arr in cols:
        out = out.append_column(name, arr)
    return out


def gopher_repetition_filter(ds, text_col="text"):
    """Dataset-level filter: keep rows passing every §A1.2 threshold."""
    def fn(b: pa.Table) -> pa.Table:
        g = gopher_repetition_batch(b, text_col=text_col)
        return b.filter(pc.equal(g.column("repetition_keep"), 1))
    return ds.map_batches(fn, batch_format="pyarrow")
