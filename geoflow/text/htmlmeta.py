"""HTML head-metadata extraction — the indexing-layer fields every
web-corpus pipeline wants beside the body text (text/htmltext.py):
<title>, meta description, canonical link, and the robots meta
directives (noindex / nofollow). Same regex-level contract as
text/links.py: one RE2 ``extract_regex`` per field over the raw
document, first match wins (valid HTML has one head), attribute
order handled by a two-order alternation (RE2 has no lookahead, so
name-before-content and content-before-name are two branches merged
with if_else). The five predefined XML/HTML entities are decoded in
title/description (numeric character references are out of scope —
documented; they are rare in head metadata).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .sitemap import _decode_entities

__all__ = ["extract_meta_batch"]

_TITLE_RE = r"(?is)<title[^>]*>\s*(?P<v>.*?)\s*</title\s*>"

# meta/link attribute pairs in either order
def _pair_res(tag: str, k1: str, v1: str, k2: str):
    head = rf'(?is)<{tag}\b'
    a = (head + rf'[^>]*?{k1}\s*=\s*"{v1}"'
         rf'[^>]*?{k2}\s*=\s*"(?P<v>[^"]*)"')
    b = (head + rf'[^>]*?{k2}\s*=\s*"(?P<v>[^"]*)"'
         rf'[^>]*?{k1}\s*=\s*"{v1}"')
    return a, b


_DESC_RES = _pair_res("meta", "name", "description", "content")
_CANON_RES = _pair_res("link", "rel", "canonical", "href")
_ROBOTS_RES = _pair_res("meta", "name", "robots", "content")


def _extract_pair(html, res):
    """First-match extraction across the two attribute orders; the
    earlier match in the DOCUMENT wins when both orders appear (we
    take order-a unless it is null — one head tag per document is
    the practical contract)."""
    va = pc.struct_field(pc.extract_regex(html, pattern=res[0]), "v")
    vb = pc.struct_field(pc.extract_regex(html, pattern=res[1]), "v")
    return pc.if_else(pc.is_valid(va), va, vb)


def extract_meta_batch(batch: pa.Table, html_col: str = "html",
                       key_cols=("doc_id",)) -> pa.Table:
    """(keys..., html) → (keys..., title, description, canonical,
    robots_meta, noindex, nofollow). Absent fields are null;
    noindex/nofollow are false when no robots meta is present
    (the protocol default)."""
    html = pc.cast(batch.column(html_col), pa.string())
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    title = pc.struct_field(
        pc.extract_regex(html, pattern=_TITLE_RE), "v")
    desc = _extract_pair(html, _DESC_RES)
    canon = _extract_pair(html, _CANON_RES)
    robots = _extract_pair(html, _ROBOTS_RES)
    low = pc.utf8_lower(pc.fill_null(robots, ""))
    noindex = pc.match_substring_regex(low, pattern=r"\bnoindex\b")
    nofollow = pc.match_substring_regex(low, pattern=r"\bnofollow\b")
    cols = {k: batch.column(k) for k in key_cols}
    cols["title"] = _decode_entities(title)
    cols["description"] = _decode_entities(desc)
    cols["canonical"] = canon
    cols["robots_meta"] = robots
    cols["noindex"] = noindex
    cols["nofollow"] = nofollow
    return pa.table(cols)
