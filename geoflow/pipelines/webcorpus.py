"""End-to-end web-corpus ingestion pipeline: crawl archives in,
curated text out.

    .warc(.gz) files
      → WARC records            (io/warc.read_warc — file-parallel)
      → HTTP responses          (io/warc.warc_responses)
      → 2xx bodies as text      (io/warc.responses_to_docs)
      → visible text            (text/htmltext.html_to_text)
      → curation                (pipelines/curation.curate: language /
                                 quality / line-strip / decontaminate /
                                 dedup / blocklist / per-source cap)

Every stage is a lazy map_batches over one streaming Dataset except
the dedup/decontaminate key exchanges, which ship hashes only — the
standard engine shapes. The document key is the canonicalized URL's
64-bit content hash by default (crawls have no integer ids); pass
``key_from_url=False`` to keep rows keyed by position-free url string.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["run_webcorpus"]


def run_webcorpus(warc_paths, html_col_out: str = "text",
                  key_from_url: bool = True, **curate_kwargs):
    """Curated documents Dataset from WARC path(s). ``curate_kwargs``
    pass through to pipelines.curation.curate (language set, quality
    threshold, near-dup toggle, blocklist, caps...)."""
    from ..io.warc import read_warc, responses_to_docs, warc_responses
    from ..text.htmltext import html_to_text
    from ..text.urls import canonicalize_urls
    from .curation import curate

    docs = responses_to_docs(warc_responses(read_warc(warc_paths)))

    def extract(batch: pa.Table) -> pa.Table:
        text = html_to_text(batch.column("text"))
        canon = canonicalize_urls(batch.column("url"))
        cols = {"url": canon, "warc_date": batch.column("warc_date"),
                html_col_out: text}
        if key_from_url:
            # key = hash(canonical url + capture date): unique per
            # CAPTURE (same page fetched twice gets two keys and the
            # content dedup collapses them), deterministic across
            # retries/resumes
            from ..text.hashing import hash64
            keyed = pc.binary_join_element_wise(
                canon, pc.cast(batch.column("warc_date"), pa.string()),
                "\x00")
            cols["doc_id"] = pa.array(hash64(keyed).view(np.int64))
        return pa.table(cols)

    ds = docs.map_batches(extract, batch_format="pyarrow")
    return curate(ds, key_col="doc_id" if key_from_url else "url",
                  text_col=html_col_out, **curate_kwargs)
