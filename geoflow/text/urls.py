"""URL canonicalization + URL-level dedup.

A web crawl stores the same page under many URL spellings — mixed-case
scheme/host, tracking parameters (utm_*, fbclid, gclid), fragments,
explicit default ports, a bare trailing '?'. Canonicalizing before
URL-keyed dedup / per-source caps collapses those families (the
published crawl-pipeline step in CommonCrawl/C4/RefinedWeb-style
curation; complements the host extraction in analysis.url_host_batch).
No reference counterpart (SURVEY.md §2.7).

Every rewrite below is a single RE2 regular-expression pass that Arrow
(`replace_substring_regex`, global) and DuckDB (`regexp_replace ...
'g'`) execute identically — the canonical form is bit-exactly
reproducible in plain SQL for the oracle gate, and there is no
per-row Python anywhere.

Canonical form (applied in this order; order is part of the contract):
  1. lowercase the scheme://authority prefix (path/query untouched)
  2. drop the #fragment
  3. drop tracking query parameters (utm_[a-z0-9]*, fbclid, gclid)
     wherever they appear in the query string
  4. drop a now-empty '?' / trailing '&'
  5. drop explicit default ports (http://h:80, https://h:443)

Deliberately NOT done (they change semantics): trailing-slash
normalization, percent-decoding, query-parameter reordering.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["CANON_STEPS", "canon_url_batch", "url_dedup",
           "url_template", "url_template_counts"]

_TRACK = r"utm_[a-z0-9]*|fbclid|gclid"

# (pattern, replacement) pairs in application order — replacements use
# RE2 rewrite groups (\1, \2), identical syntax in Arrow and DuckDB.
CANON_STEPS: tuple = (
    # 2. fragment
    (r"#.*$", ""),
    # 3a. '&track=v' anywhere after another param
    (rf"&(?:{_TRACK})=[^&#]*", ""),
    # 3b. '?track=v&rest' -> '?rest'
    (rf"\?(?:{_TRACK})=[^&#]*&", "?"),
    # 3c. '?track=v' alone at the end
    (rf"\?(?:{_TRACK})=[^&#]*$", ""),
    # 4. empty query leftovers
    (r"\?$", ""),
    (r"&$", ""),
    # 5. explicit default ports (RE2 has no lookahead: capture the
    #    boundary character — or end — and re-emit it)
    (r"^(http://[^/:?#]*):80([/?#]|$)", r"\1\2"),
    (r"^(https://[^/:?#]*):443([/?#]|$)", r"\1\2"),
)

# step 1 (prefix lowercasing) is an extract + lower + re-concat, not a
# replace; its RE2 pattern is shared with the SQL oracle
SCHEME_AUTHORITY = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def canonicalize_urls(col) -> pa.Array:
    """Canonical URL per input string (vectorized; non-URLs pass
    through steps 2-5 unchanged — there is no scheme prefix to
    lowercase and tracking-param rewrites still apply to querylike
    tails, which is harmless for non-URL text)."""
    s = pc.cast(col, pa.string())
    ex = pc.extract_regex(s, f"(?P<pfx>{SCHEME_AUTHORITY})")
    pfx = pc.fill_null(pc.struct_field(ex, "pfx"), "")
    # anchored pattern -> at most one match; removing it leaves the
    # path+query tail (non-URLs: no match, tail == whole string, pfx '')
    rest = pc.replace_substring_regex(s, pattern=SCHEME_AUTHORITY,
                                      replacement="")
    s = pc.binary_join_element_wise(pc.utf8_lower(pfx), rest, "")
    for pat, rep in CANON_STEPS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    return s


def canon_url_batch(batch: pa.Table, url_col: str = "url",
                    out_col: str = "canon_url") -> pa.Table:
    return batch.append_column(out_col,
                               canonicalize_urls(batch.column(url_col)))


def url_dedup(ds, url_col: str = "url", key_col: str = "doc_id",
              winner_mode: str = "broadcast"):
    """Keep the smallest-keyed row per canonical URL — exact dedup keyed
    on the canonical form. Composes canon_url_batch with
    text/dedup.exact_dedup, which shuffles only (hash64, key) 16-byte
    rows; the URL strings and the row payload never enter a shuffle."""
    from .dedup import exact_dedup

    canon = ds.map_batches(
        lambda b: canon_url_batch(b, url_col=url_col),
        batch_format="pyarrow")
    return exact_dedup(canon, text_col="canon_url", key_col=key_col,
                       winner_mode=winner_mode)


# URL template mining — crawler-trap / faceted-navigation detection:
# mask variable path segments so '/item/123' and '/item/456' collapse
# to one template whose per-host count exposes infinite spaces
# (calendars, session ids, facets). Mask order matters: long hex ids
# first (a digit mask would shred them), then digit runs.
_TEMPLATE_MASKS = (
    (r"[0-9a-f]{16,}", "H"),      # long hex ids / hashes
    (r"\d+", "N"),                # any digit run
)


def url_template(col) -> pa.Array:
    """Path-template mask of a path/url column (RE2, identical in
    DuckDB regexp_replace(..., 'g') — both masks are applied in
    order)."""
    s = pc.cast(col, pa.string())
    for pat, rep in _TEMPLATE_MASKS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    return s


def url_template_counts(ds, path_col: str = "path",
                        host_col: str = "host"):
    """(host, template, n) — distributed count of masked templates
    per host: the mask runs where the rows live; only compact
    (host, template, partial) rows enter the groupby shuffle."""
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        t = url_template(b.column(path_col))
        tb = pa.table({host_col: b.column(host_col), "template": t})
        # per-batch combine: value_counts over (host, template)
        import numpy as np
        h = np.asarray(tb.column(host_col), dtype=object)
        tp = np.asarray(tb.column("template"), dtype=object)
        order = np.lexsort((tp, h))
        hs, ts = h[order], tp[order]
        first = np.empty(len(hs), dtype=bool)
        if len(hs):
            first[0] = True
            first[1:] = (hs[1:] != hs[:-1]) | (ts[1:] != ts[:-1])
        idx = np.flatnonzero(first)
        cnt = np.diff(np.r_[idx, len(hs)]).astype(np.int64)
        return pa.table({host_col: pa.array(hs[idx].astype(str)),
                         "template": pa.array(ts[idx].astype(str)),
                         "c": pa.array(cnt)})

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby([host_col, "template"]).aggregate(Sum("c"))

    def finish(b: pa.Table) -> pa.Table:
        if "template" not in b.schema.names or b.num_rows == 0:
            return pa.table({host_col: pa.array([], pa.string()),
                             "template": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({host_col: b.column(host_col),
                         "template": b.column("template"),
                         "n": pc.cast(b.column("sum(c)"), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def surt_keys(url_col) -> pa.Array:
    """SURT (Sort-friendly URI Reordering Transform, the Heritrix /
    web-archive canonical key): lowercase host labels REVERSED and
    comma-joined, then ')' + path — 'http://www.example.com/p/1' →
    'com,example,www)/p/1'. Strings without a scheme+host prefix map
    to '' (not archivable). Fully vectorized: the label reversal is
    an offsets-arithmetic permutation over the flattened split
    (no per-URL Python)."""
    import numpy as np

    s = pc.cast(url_col, pa.string())
    ex = pc.extract_regex(s, r"^https?://(?P<host>[^/?#]+)")
    host = pc.fill_null(pc.struct_field(ex, "host"), "")
    host = pc.utf8_lower(host)
    path = pc.replace_substring_regex(s, r"^https?://[^/?#]*", "")
    lists = pc.split_pattern(host, ".")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(
        zero_copy_only=False)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    starts = np.cumsum(lens) - lens
    if len(parent):
        pos = np.arange(len(parent), dtype=np.int64) - starts[parent]
        perm = starts[parent] + (lens[parent] - 1) - pos
        flat = flat.take(pa.array(perm, pa.int64()))
    offsets = pa.array(np.r_[np.int32(0),
                             np.cumsum(lens).astype(np.int32)])
    rev = pa.ListArray.from_arrays(offsets, flat.combine_chunks()
                                   if isinstance(flat, pa.ChunkedArray)
                                   else flat)
    joined = pc.binary_join(rev, ",")
    out = pc.binary_join_element_wise(joined, path, ")")
    out = pc.if_else(pc.equal(host, ""), pa.scalar("", pa.string()),
                     out)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) \
        else out
