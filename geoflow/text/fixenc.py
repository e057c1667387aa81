"""Mojibake detection and repair (UTF-8 bytes mis-decoded as
Latin-1 / Windows-1252 — the ftfy-class "Ã©"/"â€™" corruption that
litters crawled web text; public spec: the UTF-8 coding rules
themselves, RFC 3629).

Detection = constructive proof: a string is flagged iff re-encoding
it through the suspect single-byte codec yields bytes that decode as
STRICT UTF-8 to a DIFFERENT string. Codecs are tried in order
``latin-1`` then ``cp1252`` (cp1252 maps the C1 range 0x80–0x9F to
printable punctuation — curly quotes, the euro sign — so
cp1252-mojibake contains characters latin-1 cannot encode).
ASCII-only text round-trips to itself (not flagged); genuine
accented text ("naïve") re-encodes to bytes that are not valid UTF-8
(not flagged). The inherent ambiguity — text that legitimately IS
"Ã©" — is undecidable by construction and documented.

Scale shape: one vectorized RE2 prefilter (any character a
single-byte mis-decode could produce: U+0080–U+00FF plus the cp1252
C1 images) gates a per-candidate Python repair loop — candidates are
rare in healthy corpora, so the hot path stays Arrow-vectorized.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# every char a latin-1 / cp1252 mis-decode can produce beyond ASCII
_C1_IMAGES = "".join(
    bytes([b]).decode("cp1252") for b in range(0x80, 0x100)
    if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D))
_CAND_RE = "[" + re.escape(""
                           + _C1_IMAGES) + "]"


def _try_fix(s: str) -> tuple[str, str]:
    """(repaired, codec) or (s, '') if no strict repair applies."""
    for codec in ("latin-1", "cp1252"):
        try:
            b = s.encode(codec)
        except UnicodeEncodeError:
            continue
        try:
            r = b.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if r != s:
            return r, codec
    return s, ""


def fix_mojibake_batch(batch: pa.Table, text_col: str = "text",
                       out_col: str = "text_fixed") -> pa.Table:
    """map_batches UDF: appends ``out_col`` (repaired text),
    ``fixed`` (0/1) and ``enc`` (codec used, '' when untouched)."""
    s = pc.cast(batch.column(text_col), pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    n = len(s)
    cand = np.asarray(pc.match_substring_regex(
        pc.fill_null(s, ""), pattern=_CAND_RE), dtype=bool)
    fixed = np.zeros(n, dtype=np.int64)
    encs = np.full(n, "", dtype=object)
    if cand.any():
        # Python objects only for the (rare) candidate rows
        idx = np.flatnonzero(cand)
        cvals = s.take(pa.array(idx, pa.int64())).to_pylist()
        repl: dict[int, str] = {}
        for i, v in zip(idx.tolist(), cvals):
            if v is None:
                continue
            r, codec = _try_fix(v)
            if codec:
                repl[i] = r
                fixed[i] = 1
                encs[i] = codec
        if repl:
            out = s.to_pylist()
            for i, r in repl.items():
                out[i] = r
            text_out = pa.array(out, pa.string())
        else:
            text_out = s
    else:
        text_out = s
    res = batch.append_column(out_col, text_out)
    res = res.append_column("fixed", pa.array(fixed))
    return res.append_column("enc", pa.array(encs, pa.string()))


def fix_mojibake(ds, text_col: str = "text",
                 out_col: str = "text_fixed"):
    """One map_batches pass; no shuffle."""
    return ds.map_batches(
        lambda b: fix_mojibake_batch(b, text_col, out_col),
        batch_format="pyarrow")
