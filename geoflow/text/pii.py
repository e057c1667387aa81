"""PII scrubbing: redact emails, IPv4 addresses and phone numbers.

The standard pre-release curation step for web corpora (the published
pipelines redact or drop PII spans before training). Every pattern and
replacement below is one RE2 global substitution that Arrow
(`replace_substring_regex`) and DuckDB (`regexp_replace ... 'g'`)
execute identically — the scrubbed text is bit-exactly reproducible in
plain SQL for the oracle gate, with no per-row Python.

Application ORDER is part of the contract (emails first, so the phone
pattern can never eat the digits of an address already redacted; then
IPv4; then phone runs). Counts are taken BEFORE any replacement, each
against the original text.

Scope/limits (documented, deliberate): IPv4 only (no IPv6), phone =
international-style digit runs of >= 9 digits/separators starting and
ending with a digit (short in-text numbers like years survive), no
checksum validation — this is corpus redaction, not PII detection
research."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["PII_STEPS", "pii_scrub_batch", "scrub_pii"]

# (name, RE2 pattern, replacement) in application order — the SQL
# oracle is generated from this same tuple (__ray_entry__._pii_sql).
PII_STEPS: tuple = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
)


def pii_scrub_batch(batch: pa.Table, text_col: str = "text",
                    out_col: str = "text_scrubbed") -> pa.Table:
    """Appends ``out_col`` (redacted text) and one ``n_<kind>`` int64
    count column per PII_STEPS entry (match counts in the ORIGINAL
    text)."""
    s = pc.cast(batch.column(text_col), pa.string())
    out = batch
    for name, pat, _ in PII_STEPS:
        n = pc.count_substring_regex(s, pat)
        out = out.append_column(f"n_{name}", pc.cast(n, pa.int64()))
    red = s
    for _, pat, rep in PII_STEPS:
        red = pc.replace_substring_regex(red, pattern=pat,
                                         replacement=rep)
    return out.append_column(out_col, red)


def scrub_pii(ds, text_col: str = "text", out_col: str = "text_scrubbed"):
    return ds.map_batches(
        lambda b: pii_scrub_batch(b, text_col=text_col, out_col=out_col),
        batch_format="pyarrow")
