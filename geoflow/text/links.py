"""Hyperlink (anchor) extraction from HTML — the crawl-graph
constructor of a web-corpus pipeline: html → (src, href, anchor_text)
edge rows, feeding the graph layer (graph/pagerank.py, components.py)
and anchor-text aggregation. The reference engine has no equivalent
(it consumes already-structured geometry literals); the public analog
is the Common Crawl host-graph build.

Fully vectorized: one `split_pattern_regex` on ``<a`` word boundaries
plus one RE2 `extract_regex` over the flattened fragments — no
per-row Python anywhere.

Contract (documented, deliberately regex-level — this is the bulk
crawl-graph pass, not a DOM parser):
  * well-formed, NON-NESTED ``<a ... href="...">text</a>`` anchors are
    extracted exactly (case-insensitive tag/attr, any attribute order
    around href, multi-line anchor text);
  * anchors without an href, or without a closing ``</a>`` before the
    next ``<a``, are skipped;
  * a nested ``<a`` inside an anchor's text diverges from a
    whole-document non-overlapping regex scan (the inner anchor IS
    extracted here, would be consumed by the outer match there) —
    acceptable for crawl-graph purposes, invalid HTML anyway.

DuckDB mirror (RE2 on both engines — used by tests; the driver
queries gate against formula-derived ground truth instead):
  ``unnest(regexp_extract_all(html, LINK_RE_SQL, 1|2))``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["LINK_RE_SQL", "extract_links_batch", "href_host"]

# Fragment-anchored form (applied after splitting on '(?i)<a\b'):
_FRAG_RE = (r'(?is)^(?P<pre>[^>]*?)\shref="(?P<href>[^"]*)"[^>]*>'
            r'(?P<anchor>.*?)</a\s*>')

# Whole-document form for SQL `regexp_extract_all(html, ..., group)`
# (group 1 = href, group 2 = anchor). Equivalent to the fragment scan
# for non-nested anchors — see module contract.
LINK_RE_SQL = r'(?is)<a\b[^>]*?\shref="([^"]*)"[^>]*>(.*?)</a\s*>'

# scheme://host[:port]/... — host stops at /, :, ?, #
_HOST_RE = r'(?is)^[a-z][a-z0-9+.-]*://(?P<host>[^/:?#]+)'


def extract_links_batch(batch: pa.Table, html_col: str = "html",
                        key_cols=("doc_id",)) -> pa.Table:
    """(keys..., html) batch → (keys..., href, anchor) edge rows, one
    per extracted anchor; rows with no anchors vanish. Zero-copy
    Arrow throughout; key columns are gathered by parent index."""
    html = pc.cast(batch.column(html_col), pa.string())
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    frags = pc.split_pattern_regex(html, pattern=r"(?i)<a\b")
    flat = pc.list_flatten(frags)
    parents = pc.list_parent_indices(frags)
    # drop each document's pre-first-anchor prefix (position 0)
    off = np.asarray(frags.offsets)
    par = np.asarray(parents)
    keep = (np.arange(len(flat)) - off[par]) > 0
    flat = flat.filter(pa.array(keep))
    par = pa.array(par[keep])
    st = pc.extract_regex(flat, pattern=_FRAG_RE)
    ok = pc.is_valid(st)
    src = par.filter(ok)
    cols = {k: pc.take(batch.column(k), src) for k in key_cols}
    cols["href"] = pc.struct_field(st, "href").filter(ok)
    cols["anchor"] = pc.struct_field(st, "anchor").filter(ok)
    return pa.table(cols)


def href_host(href) -> pa.Array:
    """href column → host (null for relative/script/mailto-style
    hrefs without a ``scheme://host`` head). Case preserved — URL
    canonicalization lives in text/urls.py."""
    s = pc.cast(href, pa.string())
    st = pc.extract_regex(s, pattern=_HOST_RE)
    return pc.struct_field(st, "host")
