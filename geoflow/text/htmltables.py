"""HTML table extraction: <table>/<tr>/<td|th> → one row per cell.

The structured-data mining step of a web-corpus pipeline (WebTables /
relation-extraction class): every cell lands as
(doc, table_idx, row_idx, col_idx, is_header, cell_text) so
downstream ops (schema detection, entity matching) are plain
columnar work.

Vectorization: the whole extraction is Arrow kernel chains — three
nested case-insensitive split_pattern_regex levels (table, tr, td/th)
with list_parent_indices lineage, ordinals recovered by run-start
subtraction (numpy), tag stripping + minimal entity decode (&amp;
&lt; &gt; &quot; &#39; &nbsp;) via replace/trim kernels. Header cells
are detected WITHOUT lookahead (RE2 has none): <th...> opens are
rewritten to <td...> with a \\x01 sentinel prepended to the body
before the cell split, so the flag survives as a testable first
character. No Python per-row loop anywhere.

Scope (documented): tags are matched syntactically (RE2), not by a
DOM — nested tables inside a cell start a NEW table fragment at this
level, colspan/rowspan attributes are NOT expanded into grid
positions (col_idx counts cells as written), comments/CDATA are not
excluded, and a literal \\x01 control char inside a cell would
misread as a header flag (absent from real text). This matches the
repo's other RE2-extraction ops (htmlmeta, links) — crawl-scale
throughput over DOM fidelity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]
_HDR = "\x01"


def _split_level(content: pa.Array, open_re: str, close_re: str):
    """Split each string on ``open_re``; fragments AFTER the first are
    element bodies, each truncated at ``close_re``. Returns
    (bodies, parent_index, ordinal_within_parent)."""
    lists = pc.split_pattern_regex(content, pattern=open_re)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    # drop fragment 0 of every parent (text before the first open tag)
    starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
    keep = np.ones(len(parent), dtype=bool)
    keep[starts] = False
    ki = np.flatnonzero(keep)
    flat = flat.take(pa.array(ki, pa.int64()))
    parent = parent[ki]
    # ordinal of each body within its parent
    pstarts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
    ordinal = np.arange(len(parent), dtype=np.int64) \
        - np.repeat(pstarts, np.diff(np.r_[pstarts, len(parent)]))
    # truncate at the close tag: first piece of a close-split
    closed = pc.list_element(
        pc.split_pattern_regex(flat, pattern=close_re, max_splits=1), 0)
    if isinstance(closed, pa.ChunkedArray):
        closed = closed.combine_chunks()
    return closed, parent, ordinal


def extract_tables_batch(batch: pa.Table, html_col: str = "html",
                         id_col: str = "doc_id") -> pa.Table:
    """map_batches UDF: (doc_id, table_idx, row_idx, col_idx,
    is_header, cell_text) for every table cell in the batch."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    html = pc.cast(batch.column(html_col), pa.string())
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    html = pc.fill_null(html, "")

    tables, t_parent, t_idx = _split_level(
        html, r"(?i)<table[^>]*>", r"(?i)</table\s*>")
    rows, r_parent, r_idx = _split_level(
        tables, r"(?i)<tr[^>]*>", r"(?i)</tr\s*>")
    # mark header cells before the kind-erasing cell split
    rows = pc.replace_substring_regex(
        rows, pattern=r"(?i)<th([^>]*)>", replacement=rf"<td\1>{_HDR}")
    cells, c_parent, c_idx = _split_level(
        rows, r"(?i)<td[^>]*>", r"(?i)</t[dh]\s*>")

    is_header = np.asarray(
        pc.starts_with(cells, pattern=_HDR), dtype=bool)
    text = pc.replace_substring_regex(
        cells, pattern="^" + _HDR, replacement="")
    text = pc.replace_substring_regex(text, pattern=r"<[^>]*>",
                                      replacement="")
    for ent, ch in _ENTITIES:
        text = pc.replace_substring(text, pattern=ent, replacement=ch)
    text = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(text, pattern=r"\s+",
                                   replacement=" "))

    return pa.table({
        "doc_id": pa.array(ids[t_parent[r_parent[c_parent]]]),
        "table_idx": pa.array(t_idx[r_parent[c_parent]]),
        "row_idx": pa.array(r_idx[c_parent]),
        "col_idx": pa.array(c_idx),
        "is_header": pa.array(is_header.astype(np.int64)),
        "cell_text": text})


def extract_tables(ds, html_col: str = "html", id_col: str = "doc_id"):
    """One map_batches pass; no shuffle."""
    return ds.map_batches(
        lambda b: extract_tables_batch(b, html_col, id_col),
        batch_format="pyarrow")
