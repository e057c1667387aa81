"""HTML → text extraction: the first transform of every web-corpus
pipeline (WARC response body → visible text).

Implemented as an ORDERED chain of RE2 global substitutions shared
verbatim with the SQL oracle (the tuple below is the single source;
__ray_entry__ generates the DuckDB expression from it) — fully
vectorized in Arrow, no per-row Python, bit-identical across engines.

Contract (deliberately simple and documented — this is the
deterministic bulk-strip step, not a DOM parser):
  1. <script>/<style> blocks and <!-- comments --> removed bodily
     (non-greedy, case-insensitive, dot-matches-newline);
  2. block-level tags become newlines, every other tag disappears;
  3. the common named entities decode (&lt; &gt; &quot; &#39; &nbsp;
     then &amp; LAST so freshly produced '&' is never re-interpreted);
     numeric entities are left as-is (documented limit);
  4. horizontal whitespace collapses to single spaces, blank-ish line
     runs collapse to single newlines, the result is trimmed.
Malformed HTML degrades gracefully: an UNCLOSED <script> block does
not match the non-greedy block pattern, so only its tag is stripped
and the (visible, if junky) tail survives — identically in the SQL
mirror, so parity holds either way.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["HTML_STEPS", "html_to_text", "html_to_text_batch"]

# (pattern, replacement) in application order — RE2 on both engines.
HTML_STEPS: tuple = (
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody"
     r"|section|article|header|footer|blockquote|pre|form)\b[^>]*>",
     "\n"),
    (r"<[^>]*>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    (r"^\s+|\s+$", ""),
)


def html_to_text(col) -> pa.Array:
    s = pc.cast(col, pa.string())
    for pat, rep in HTML_STEPS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    return s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s


def html_to_text_batch(batch: pa.Table, html_col: str = "html",
                       out_col: str = "text") -> pa.Table:
    return batch.append_column(out_col,
                               html_to_text(batch.column(html_col)))
