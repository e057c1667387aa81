"""Sitemap protocol parsing (sitemaps.org XML) — the discovery side
of the crawl-admission layer (text/robots.py is the permission side).
A document is either a ``<urlset>`` (page entries with optional
lastmod / changefreq / priority) or a ``<sitemapindex>`` (child
sitemap locs); both flatten to edge rows here.

Same vectorized shape as text/links.py: one ``split_pattern_regex``
on the entry boundary + per-field RE2 ``extract_regex`` over the
flattened fragments — no per-row Python, no DOM. Scope (documented):
well-formed non-nested entries; the first ``<loc>`` after an entry
open tag is that entry's loc; the five predefined XML entities are
decoded in text values; CDATA is out of scope (rare in sitemaps).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parse_sitemap_batch"]

_FIELD_RES = {
    "loc": r"(?is)<loc>\s*(?P<v>.*?)\s*</loc>",
    "lastmod": r"(?is)<lastmod>\s*(?P<v>.*?)\s*</lastmod>",
    "priority": r"(?is)<priority>\s*(?P<v>.*?)\s*</priority>",
    "changefreq": r"(?is)<changefreq>\s*(?P<v>.*?)\s*</changefreq>",
}

# decode order matters: &amp; LAST would corrupt doubly-escaped
# text; the spec decodes it last going the other way — here we decode
# the four specific entities first, then &amp;
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&apos;", "'"), ("&amp;", "&")]


def _decode_entities(arr):
    for src, dst in _ENTITIES:
        arr = pc.replace_substring(arr, pattern=src, replacement=dst)
    return arr


def _entries(xml, open_tag: str, close_tag: str):
    """Split each doc on the entry open tag; drop the pre-first
    prefix; each fragment runs up to (and past) its close tag —
    fields extract with non-greedy first-match, so trailing content
    is inert. Returns (fragments, parent doc index)."""
    frags = pc.split_pattern_regex(xml, pattern=open_tag)
    flat = pc.list_flatten(frags)
    par = np.asarray(pc.list_parent_indices(frags))
    off = np.asarray(frags.offsets)
    keep = (np.arange(len(flat)) - off[par]) > 0
    # entries must still contain their close tag (guards truncated
    # tails and split matches inside the closing root element)
    has_close = np.asarray(pc.match_substring_regex(
        flat, pattern=close_tag))
    keep &= has_close
    return flat.filter(pa.array(keep)), par[keep]


def parse_sitemap_batch(batch: pa.Table, xml_col: str = "xml",
                        key_cols=("doc_id",)) -> pa.Table:
    """(keys..., xml) batch → one row per sitemap entry:
    (keys..., kind 'url'|'sitemap', loc, lastmod, changefreq,
    priority). ``<urlset>`` docs yield kind='url' rows with the
    optional fields (null when absent; priority parsed to double);
    ``<sitemapindex>`` docs yield kind='sitemap' rows with loc only.
    Docs with neither root vanish."""
    xml = pc.cast(batch.column(xml_col), pa.string())
    if isinstance(xml, pa.ChunkedArray):
        xml = xml.combine_chunks()

    out = []
    for kind, open_tag, close_tag in (
            ("url", r"(?i)<url>", r"(?is)</url\s*>"),
            ("sitemap", r"(?i)<sitemap>", r"(?is)</sitemap\s*>")):
        flat, par = _entries(xml, open_tag, close_tag)
        if len(par) == 0:
            continue
        loc_st = pc.extract_regex(flat, pattern=_FIELD_RES["loc"])
        ok = np.asarray(pc.is_valid(loc_st))
        if not ok.any():
            continue
        okm = pa.array(ok)
        par = par[ok]
        cols = {k: pc.take(batch.column(k), pa.array(par))
                for k in key_cols}
        cols["kind"] = pa.array(np.full(len(par), kind, dtype=object),
                                pa.string())
        cols["loc"] = _decode_entities(
            pc.struct_field(loc_st, "v").filter(okm))
        for f in ("lastmod", "changefreq", "priority"):
            if kind == "sitemap":
                cols[f] = pa.nulls(len(par), pa.string())
            else:
                st = pc.extract_regex(flat.filter(okm),
                                      pattern=_FIELD_RES[f])
                cols[f] = pc.struct_field(st, "v")
        cols["priority"] = pc.cast(cols["priority"], pa.float64())
        out.append(pa.table(cols))
    if not out:
        empty = {k: batch.column(k).slice(0, 0) for k in key_cols}
        empty.update({"kind": pa.array([], pa.string()),
                      "loc": pa.array([], pa.string()),
                      "lastmod": pa.array([], pa.string()),
                      "changefreq": pa.array([], pa.string()),
                      "priority": pa.array([], pa.float64())})
        return pa.table(empty)
    return pa.concat_tables(out)
