"""RSS 2.0 / Atom feed parsing — the third discovery source of a
crawl frontier beside links (text/links.py) and sitemaps
(text/sitemap.py). Both dialects flatten to (kind, link, title,
updated) entry rows: RSS ``<item>`` children ``<link>text</link>``,
``<title>``, ``<pubDate>``; Atom ``<entry>`` children
``<link href="..."/>``, ``<title>``, ``<updated>``.

Same vectorized contract as text/sitemap.py: split on the entry open
tag, per-field RE2 extracts over the fragments, first match wins,
five predefined entities decoded in titles; CDATA out of scope."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sitemap import _decode_entities, _entries

__all__ = ["parse_feed_batch"]

_F = {
    "rss_link": r"(?is)<link>\s*(?P<v>.*?)\s*</link\s*>",
    "atom_link": r'(?is)<link\b[^>]*?href\s*=\s*"(?P<v>[^"]*)"',
    "title": r"(?is)<title[^>]*>\s*(?P<v>.*?)\s*</title\s*>",
    "rss_date": r"(?is)<pubdate>\s*(?P<v>.*?)\s*</pubdate\s*>",
    "atom_date": r"(?is)<updated>\s*(?P<v>.*?)\s*</updated\s*>",
}


def _field(flat, name):
    return pc.struct_field(
        pc.extract_regex(flat, pattern=_F[name]), "v")


def parse_feed_batch(batch: pa.Table, xml_col: str = "xml",
                     key_cols=("doc_id",)) -> pa.Table:
    """(keys..., xml) → one row per feed entry:
    (keys..., kind 'rss'|'atom', link, title, updated). Docs that are
    neither dialect vanish; entries without a link are skipped."""
    xml = pc.cast(batch.column(xml_col), pa.string())
    if isinstance(xml, pa.ChunkedArray):
        xml = xml.combine_chunks()
    out = []
    for kind, open_tag, close_tag, link_f, date_f in (
            ("rss", r"(?i)<item>", r"(?is)</item\s*>",
             "rss_link", "rss_date"),
            ("atom", r"(?i)<entry>", r"(?is)</entry\s*>",
             "atom_link", "atom_date")):
        flat, par = _entries(xml, open_tag, close_tag)
        if len(par) == 0:
            continue
        link = _field(flat, link_f)
        ok = np.asarray(pc.is_valid(link))
        if not ok.any():
            continue
        okm = pa.array(ok)
        par = par[ok]
        kept = flat.filter(okm)
        cols = {k: pc.take(batch.column(k), pa.array(par))
                for k in key_cols}
        cols["kind"] = pa.array(
            np.full(len(par), kind, dtype=object), pa.string())
        cols["link"] = _decode_entities(link.filter(okm))
        cols["title"] = _decode_entities(_field(kept, "title"))
        cols["updated"] = _field(kept, date_f)
        out.append(pa.table(cols))
    if not out:
        empty = {k: batch.column(k).slice(0, 0) for k in key_cols}
        empty.update({"kind": pa.array([], pa.string()),
                      "link": pa.array([], pa.string()),
                      "title": pa.array([], pa.string()),
                      "updated": pa.array([], pa.string())})
        return pa.table(empty)
    return pa.concat_tables(out)
