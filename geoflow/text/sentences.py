"""Sentence segmentation: one row per sentence fragment.

The pre-chunking step for sentence-level dedup / packing pipelines.
Splitting is a single RE2 rule — terminator run [.!?]+ followed by
whitespace — applied identically by Arrow's split_pattern_regex and
DuckDB's regexp_split_to_array, so fragments are byte-identical
across engines (the `sentence_split` driver gate runs it over the
real documents.text). Deliberately NOT a linguistic segmenter
(abbreviations, "U.S." etc. split — documented scope; the rule is
the same one C4-class pipelines use for cheap sentence counting).

Fragments are emitted RAW (no trim — Arrow and SQL whitespace sets
differ at the Unicode fringe); only zero-length fragments (trailing
terminator) are dropped, identically on both sides. One map_batches
pass, no shuffle; lineage via list_parent_indices + run-start
ordinals (no Python per-row loop)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SENT_SPLIT = r"[.!?]+\s+"


def split_sentences_batch(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """(doc_id, sent_idx, sentence) per non-empty fragment."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    s = pc.cast(batch.column(text_col), pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    lists = pc.split_pattern_regex(pc.fill_null(s, ""),
                                   pattern=SENT_SPLIT)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if len(parent) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "sent_idx": pa.array([], pa.int64()),
                         "sentence": pa.array([], pa.string())})
    starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
    ordinal = np.arange(len(parent), dtype=np.int64) \
        - np.repeat(starts, np.diff(np.r_[starts, len(parent)]))
    nz = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False).astype(bool)
    ki = np.flatnonzero(nz)
    return pa.table({
        "doc_id": pa.array(ids[parent[ki]]),
        "sent_idx": pa.array(ordinal[ki]),
        "sentence": flat.take(pa.array(ki, pa.int64()))})


def split_sentences(ds, text_col: str = "text",
                    id_col: str = "doc_id"):
    return ds.map_batches(
        lambda b: split_sentences_batch(b, text_col, id_col),
        batch_format="pyarrow")
