"""Line-level dedup: strip lines that repeat across many documents.

The published web-corpus recipe (RefinedWeb line-wise filtering;
Gopher repetition rules operate within-doc — text/analysis.py
repetition_batch covers those): boilerplate lines ("Subscribe to our
newsletter", cookie banners, nav menus) appear verbatim in thousands
of pages; remove every line whose trimmed form occurs in >= min_docs
DISTINCT documents, keeping the document's remaining lines in order.
No reference counterpart (RDF corpora have no line structure —
SURVEY.md §2.7); first-class corpus-pipeline component beside
exact/near dedup and decontamination.

Scale shape (100 TB corpus):

- Pass 1 (count): lines are split/trimmed/hashed fully vectorized
  (Arrow split + utf8_trim_whitespace + hashing.hash64); per batch,
  (line_hash, doc) pairs are deduped with one lexsort — each doc's
  lines live in its own row, so per-batch pair dedup IS global pair
  dedup — then collapsed to (line_hash, partial_doc_count) rows. Only
  those 16-byte partials enter the groupby-sum shuffle; the text never
  leaves its read task.
- The drop set (hashes with total >= min_docs) is by construction the
  REPEATED subset — a tiny fraction of distinct lines. It is streamed
  to the driver (8 B/hash) and broadcast once via ray.put with the
  per-worker-process cache; for corpora whose boilerplate set exceeds
  broadcast capacity, the same (line_hash, doc_id, line_idx)
  projection can be anti-filtered with join/semijoin.py
  partitioned_key_filter and reassembled per doc — documented escape
  hatch, not the default.
- Pass 2 (strip): a pure map_batches pass — re-split, hash, sorted-set
  membership, rebuild each doc's kept lines with ListArray offsets +
  pc.binary_join. No shuffle ever touches the corpus.

Determinism: blake-free splitmix/FNV hashing only (hashing.py);
equality is on 64-bit line hashes — the documented collision exposure
every dedup stage in this engine accepts.

Semantics (mirrored op-for-op by the SQL oracle in __ray_entry__.py):
lines are '\n'-separated; a line's identity is its whitespace-trimmed
form; empty (all-whitespace) lines are never counted and never
dropped; a document whose every line is dropped disappears from the
output (matching SQL string_agg-over-empty-group).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash64

__all__ = ["common_line_hashes", "strip_common_lines", "line_dedup",
           "strip_lines_table"]


def _line_arrays(texts, sep: str = "\n"):
    """(flat trimmed-line StringArray, flat original-line StringArray,
    int64 doc index per line). Units = ``sep`` split ('\n' for lines,
    '\n\n' for PARAGRAPHS — the RefinedWeb recipe runs at both
    granularities), every position kept (empty units included) so
    reassembly preserves structure."""
    s = pc.cast(texts, pa.string())
    lists = pc.split_pattern(s, pattern=sep)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    trimmed = pc.utf8_trim_whitespace(flat)
    if isinstance(trimmed, pa.ChunkedArray):
        trimmed = trimmed.combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return trimmed, flat, parent.astype(np.int64)


def _pair_partials(batch: pa.Table, text_col: str, sep: str = "\n"):
    """(uint64 line_hash, int64 distinct-doc partial count) for the
    batch — one lexsort pass; empty (trimmed) lines excluded."""
    trimmed, _, parent = _line_arrays(batch.column(text_col), sep)
    lens = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
    nz = lens > 0
    if not nz.any():
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    h = hash64(trimmed)[nz]
    d = parent[nz]
    order = np.lexsort((d, h))
    hs, ds = h[order], d[order]
    first_pair = np.empty(len(hs), dtype=bool)
    first_pair[0] = True
    first_pair[1:] = (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])
    hu = hs[first_pair]
    # distinct (hash, doc) pairs are sorted by hash: run-length = the
    # batch-local distinct-doc count per hash
    uniq, cnt = np.unique(hu, return_counts=True)
    return uniq, cnt.astype(np.int64)


def common_line_hashes(ds, text_col: str = "text", min_docs: int = 2,
                       sep: str = "\n"):
    """ray.ObjectRef to the SORTED uint64 hash array of lines occurring
    in >= min_docs distinct documents. Per-batch partial counts feed a
    16-byte groupby-sum shuffle; only the repeated subset (8 B/line)
    reaches the driver."""
    import ray
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        h, c = _pair_partials(batch, text_col, sep)
        return pa.table({"lh": pa.array(h.view(np.int64)),
                         "c": pa.array(c)})

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("lh").aggregate(Sum("c"))
    parts = []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0 or "lh" not in b.schema.names:
            continue  # hash-agg empty partitions emit 0-column blocks
        tot = b.column("sum(c)").to_numpy(zero_copy_only=False)
        keep = tot >= min_docs
        parts.append(
            b.column("lh").to_numpy(zero_copy_only=False)[keep])
    allh = (np.concatenate(parts) if parts
            else np.empty(0, np.int64)).view(np.uint64)
    return ray.put(np.sort(allh))


# per-worker-process broadcast cache (task-pool pattern, CLAUDE.md)
_DROP_CACHE: dict = {}


def _drop_cache_get(ref) -> np.ndarray:
    key = ref.hex()
    arr = _DROP_CACHE.get(key)
    if arr is None:
        import ray
        arr = ray.get(ref)
        _DROP_CACHE.clear()
        _DROP_CACHE[key] = arr
    return arr


def strip_lines_table(batch: pa.Table, drop_sorted: np.ndarray,
                      text_col: str = "text",
                      out_col: str | None = None,
                      sep: str = "\n") -> pa.Table:
    """Array-level strip kernel over one table (used directly by the
    resumable curation job): remove lines whose trimmed-form hash is
    in the SORTED uint64 ``drop_sorted``; rows left with zero lines
    are removed. ``out_col=None`` replaces ``text_col`` in place."""
    trimmed, flat, parent = _line_arrays(batch.column(text_col), sep)
    lens = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
    h = hash64(trimmed)
    if len(drop_sorted):
        pos = np.clip(np.searchsorted(drop_sorted, h),
                      0, len(drop_sorted) - 1)
        hit = (drop_sorted[pos] == h) & (lens > 0)
    else:
        hit = np.zeros(len(h), dtype=bool)
    keep = ~hit
    kept_flat = flat.filter(pa.array(keep))
    counts = np.bincount(parent[keep], minlength=batch.num_rows)
    offsets = np.concatenate(
        [np.zeros(1, np.int64), np.cumsum(counts)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets),
                                     kept_flat.combine_chunks()
                                     if isinstance(kept_flat,
                                                   pa.ChunkedArray)
                                     else kept_flat)
    joined = pc.binary_join(lists, sep)
    if out_col is None:
        i = batch.schema.get_field_index(text_col)
        out = batch.set_column(i, text_col, joined)
    else:
        out = batch.append_column(out_col, joined)
    return out.filter(pa.array(counts > 0))


def strip_common_lines(ds, drop_ref, text_col: str = "text",
                       out_col: str = "text_clean", sep: str = "\n"):
    """Rows of ``ds`` with ``out_col`` = the document minus its dropped
    lines ('\n'-rejoined, original spelling, order preserved). Documents
    with zero surviving lines are removed. Pure map_batches — the
    reassembly is ListArray offsets + pc.binary_join, no Python loop."""

    def strip(batch: pa.Table) -> pa.Table:
        return strip_lines_table(batch, _drop_cache_get(drop_ref),
                                 text_col=text_col, out_col=out_col,
                                 sep=sep)

    return ds.map_batches(strip, batch_format="pyarrow")


def line_dedup(ds, text_col: str = "text", min_docs: int = 2,
               out_col: str = "text_clean", sep: str = "\n"):
    """Full pipeline: count pass -> broadcast drop set -> strip pass.
    ``ds`` is read twice (two executions of its lineage); pass a
    materialized or re-readable dataset, as with every multi-pass stage
    in this engine."""
    ref = common_line_hashes(ds, text_col=text_col, min_docs=min_docs,
                             sep=sep)
    return strip_common_lines(ds, ref, text_col=text_col,
                              out_col=out_col, sep=sep)
