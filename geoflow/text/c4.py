"""C4-style heuristic page cleaning (Raffel et al. 2020, §2.2).

The published "Colossal Clean Crawled Corpus" rules, as one fully
vectorized map_batches pass (no shuffle — every rule is doc-local, so
this stage streams at any corpus size):

Line rules (a line is kept iff ALL hold):
  1. ends in a terminal punctuation mark (. ! ? or closing quote),
  2. has at least ``min_words`` whitespace-delimited words (C4: 5),
  3. does not mention "javascript" (case-insensitive).

Page rules (a page is dropped iff ANY holds, evaluated on the RAW
page text, per the paper):
  4. fewer than ``min_kept_lines`` surviving lines (the paper's
     "fewer than 3 sentences", with kept lines as the sentence proxy
     — each kept line ends in terminal punctuation),
  5. contains the phrase "lorem ipsum" (case-insensitive),
  6. contains a curly bracket '{',
  7. contains any blocklisted word (word-boundary match on the
     lowercased text; C4 uses the public "List of Dirty, Naughty,
     Obscene..." list — pass the full list via ``badwords``; the
     default here is a tiny stand-in).

The corpus-level "deduplicate three-sentence spans" rule from the
same paper is the ExactSubstr/line-dedup family — text/substrdedup.py
and text/linededup.py implement those as separate stages.

Every rule is an RE2 regex or substring test shared verbatim by the
SQL oracle (DuckDB regexp_* is RE2 — CLAUDE.md), so the driver gate
checks the cleaned text byte-for-byte. No reference counterpart (RDF
corpora have no page structure — SURVEY.md §2.7); first-class
web-corpus component beside quality scoring and line dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["c4_clean", "c4_clean_table", "TERMINAL_PUNCT_RE",
           "WORD_RE", "DEFAULT_BADWORDS"]

# RE2, shared verbatim with the SQL oracle
TERMINAL_PUNCT_RE = '[.!?"]$'
WORD_RE = r"\S+"
JAVASCRIPT_RE = "(?i)javascript"
LOREM_RE = "(?i)lorem ipsum"
DEFAULT_BADWORDS = ("bukkake", "shitload", "dickhead")


def badword_regex(badwords) -> str:
    return r"\b(" + "|".join(badwords) + r")\b"


def _combine(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
        else arr


def c4_clean_table(batch: pa.Table, text_col: str = "text",
                   out_col: str | None = "text_clean",
                   min_words: int = 5, min_kept_lines: int = 3,
                   badwords=DEFAULT_BADWORDS) -> pa.Table:
    """One-table C4 cleaning kernel: returns the surviving rows with
    ``out_col`` = kept lines '\\n'-rejoined (``out_col=None`` replaces
    ``text_col`` in place). All Arrow kernels, no Python row loop."""
    text = pc.cast(batch.column(text_col), pa.string())
    lists = pc.split_pattern(text, pattern="\n")
    flat = _combine(pc.list_flatten(lists))
    parent = pc.list_parent_indices(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    trimmed = _combine(pc.utf8_trim_whitespace(flat))

    term = pc.match_substring_regex(trimmed, TERMINAL_PUNCT_RE) \
        .to_numpy(zero_copy_only=False)
    words = pc.count_substring_regex(trimmed, WORD_RE).to_numpy(
        zero_copy_only=False)
    js = pc.match_substring_regex(trimmed, JAVASCRIPT_RE).to_numpy(
        zero_copy_only=False)
    keep_line = term & (words >= min_words) & ~js

    n_rows = batch.num_rows
    kept_counts = np.bincount(parent[keep_line], minlength=n_rows)

    lorem = pc.match_substring_regex(text, LOREM_RE).to_numpy(
        zero_copy_only=False)
    curly = pc.match_substring(text, "{").to_numpy(zero_copy_only=False)
    bad = pc.match_substring_regex(
        pc.utf8_lower(text), badword_regex(badwords)).to_numpy(
        zero_copy_only=False)
    keep_page = (kept_counts >= min_kept_lines) & ~lorem & ~curly & ~bad

    kept_flat = _combine(flat.filter(pa.array(keep_line)))
    offsets = np.concatenate(
        [np.zeros(1, np.int64), np.cumsum(kept_counts)]).astype(np.int32)
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), kept_flat), "\n")
    if out_col is None:
        i = batch.schema.get_field_index(text_col)
        out = batch.set_column(i, text_col, joined)
    else:
        out = batch.append_column(out_col, joined)
    return out.filter(pa.array(keep_page))


def c4_clean(ds, text_col: str = "text", out_col: str = "text_clean",
             min_words: int = 5, min_kept_lines: int = 3,
             badwords=DEFAULT_BADWORDS):
    """C4 cleaning over a Dataset — one streaming map_batches stage."""

    def clean(batch: pa.Table) -> pa.Table:
        return c4_clean_table(batch, text_col=text_col, out_col=out_col,
                              min_words=min_words,
                              min_kept_lines=min_kept_lines,
                              badwords=badwords)

    return ds.map_batches(clean, batch_format="pyarrow")
