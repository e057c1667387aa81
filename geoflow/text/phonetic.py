"""American Soundex phonetic keys (NARA standard, the record-linkage
blocking key of Odell & Russell 1918 / Knuth TAOCP vol. 3 §6):

  code map  b f p v→1   c g j k q s x z→2   d t→3   l→4   m n→5   r→6
  h and w are TRANSPARENT (a letter following h/w collapses with the
  letter before them when codes match); vowels a e i o u y SEPARATE
  (same codes around a vowel are both kept) and are then dropped;
  the key is the first letter (uppercased) + the first 3 surviving
  digits, zero-padded.

Kernel shape: fixed-width codepoint matrix + a column-wise scan
(≤ max_len vectorized passes across all rows — no per-string
Python), the same UTF-32 flat-array convention as text/pretoken.
Only ASCII a-z/A-Z participate; other characters are ignored
(dropped), the documented convention for the planted-name gates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["soundex", "soundex_batch"]

# 26-entry code table for 'a'..'z'; 0 = vowel separator, 7 = h/w
# transparent (internal sentinel, never emitted)
_CODES = np.zeros(26, np.int64)
for _letters, _c in (("bfpv", 1), ("cgjkqsxz", 2), ("dt", 3),
                     ("l", 4), ("mn", 5), ("r", 6), ("hw", 7)):
    for _ch in _letters:
        _CODES[ord(_ch) - 97] = _c


def soundex(names: np.ndarray, width: int = 24) -> np.ndarray:
    """Vectorized Soundex over a numpy unicode array → U4 array.
    Empty / no-letter inputs map to the empty string."""
    names = np.asarray(names, dtype=str)
    n = len(names)
    if n == 0:
        return np.empty(0, "<U4")
    m = names.astype(f"<U{width}").view(np.uint32).reshape(n, width)
    # lowercase ASCII letters only; everything else -> sentinel 255
    low = np.where((m >= 65) & (m <= 90), m + 32, m)
    letter = (low >= 97) & (low <= 122)
    idx = np.where(letter, low - 97, 0)
    code = np.where(letter, _CODES[idx], -1)     # -1 = drop entirely
    # first letter per row (first column with a letter)
    has = letter.any(axis=1)
    firstpos = np.argmax(letter, axis=1)
    rows = np.arange(n)
    first_cp = np.where(has, low[rows, firstpos] - 32, 0)  # uppercase
    # column scan: prev = last non-transparent, non-dropped code seen
    # (vowels write 0 into prev — the separator rule); h/w (7) leave
    # prev untouched; digits are kept when code!=prev
    out = np.zeros((n, 3), np.uint32)
    cnt = np.zeros(n, np.int64)
    prev = np.full(n, -1, np.int64)
    started = np.zeros(n, bool)
    for j in range(width):
        c = code[:, j]
        isfirst = letter[:, j] & ~started
        # digits collected only AFTER the first letter; the first
        # letter seeds prev with its own code (h/w seeds 7 -> treated
        # as no-code: transparent first letters cannot swallow)
        keep = started & (c >= 1) & (c <= 6) & (c != prev) & (cnt < 3)
        if keep.any():
            out[keep, cnt[keep]] = (48 + c[keep]).astype(np.uint32)
            cnt[keep] += 1
        upd = (c >= 0) & (c != 7) & (letter[:, j]) & started
        prev = np.where(upd, c, prev)
        prev = np.where(isfirst, np.where(c == 7, -1, c), prev)
        started |= isfirst
    # pad digits with '0'
    pad = out == 0
    out[pad] = 48
    full = np.concatenate([first_cp[:, None].astype(np.uint32), out],
                          axis=1)
    full[~has] = 0
    return np.ascontiguousarray(full).view("<U4").reshape(-1)


def soundex_batch(batch: pa.Table, col: str = "name",
                  out_col: str = "sndx") -> pa.Table:
    """map_batches kernel: append the Soundex key column."""
    t = batch.column(col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    keys = soundex(np.asarray(t, dtype=str))
    return batch.append_column(out_col, pa.array(keys, pa.string()))
