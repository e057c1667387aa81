"""WARC (ISO 28500 / WARC/1.0-1.1) source — the native web-crawl
archive format (CommonCrawl et al.).

A 100-TB crawl arrives as ~1-GB ``.warc(.gz)`` files; the natural Ray
shape is FILE-granularity parallelism: ``ray.data.read_binary_files``
ships one file per task, the task decompresses (Python gzip reads
multi-member files — the standard record-per-member WARC gzip layout —
in one pass) and walks records by Content-Length framing. No regex
ever touches payload bytes; header blocks are parsed with one split.
100k files at crawl scale gives far more tasks than cores, so
per-file granularity loses no parallelism while keeping the reader
trivially resumable (file = unit of work, as jobs/run_pipeline.py
partitions by file group).

Output row per record: warc_type, record_id, target_uri, warc_date,
content_type, content_length, payload (binary). ``warc_responses``
additionally splits the HTTP response head from the body and emits
(url, warc_date, http_status, http_content_type, body) — the ingest
row a text-curation pipeline starts from (body decode to text is a
separate explicit step, utf-8 with replacement).

Writer (``write_warc``) emits spec-framed response records —
round-trip tested; useful for producing test corpora and for
re-sharding a curated subset back into the archive format.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["parse_warc_bytes", "read_warc", "warc_responses",
           "responses_to_docs", "make_warc_bytes"]

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict:
    """WARC named fields (case-insensitive names per spec)."""
    out = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().lower().decode("ascii", "replace")] = \
                v.strip().decode("utf-8", "replace")
    return out


def parse_warc_bytes(data: bytes, path: str = "<mem>"):
    """One WARC file's bytes → list of record dicts. Content-Length
    framing only (mandatory field); tolerates trailing garbage after
    the final record by stopping at the first non-record bytes."""
    recs = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break  # trailing junk — records are framed, stop cleanly
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            raise ValueError(f"{path}: truncated WARC header block")
        head = data[pos:hdr_end]
        fields = _parse_headers(head.split(b"\r\n", 1)[1]
                                if b"\r\n" in head else b"")
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            raise ValueError(f"{path}: missing/bad Content-Length "
                             f"at offset {pos}")
        body_start = hdr_end + 4
        payload = data[body_start:body_start + clen]
        if len(payload) != clen:
            raise ValueError(f"{path}: truncated record payload")
        recs.append({
            "warc_type": fields.get("warc-type", ""),
            "record_id": fields.get("warc-record-id", ""),
            "target_uri": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "content_type": fields.get("content-type", ""),
            "content_length": clen,
            "payload": payload,
        })
        pos = body_start + clen
    return recs


def _records_table(recs) -> pa.Table:
    cols = {
        "warc_type": pa.array([r["warc_type"] for r in recs],
                              type=pa.string()),
        "record_id": pa.array([r["record_id"] for r in recs],
                              type=pa.string()),
        "target_uri": pa.array([r["target_uri"] for r in recs],
                               type=pa.string()),
        "warc_date": pa.array([r["warc_date"] for r in recs],
                              type=pa.string()),
        "content_type": pa.array([r["content_type"] for r in recs],
                                 type=pa.string()),
        "content_length": pa.array([r["content_length"] for r in recs],
                                   type=pa.int64()),
        "payload": pa.array([r["payload"] for r in recs],
                            type=pa.binary()),
    }
    return pa.table(cols)


def read_warc(paths, **read_kwargs):
    """Dataset of WARC records from .warc / .warc.gz files (one file
    per read task; gzip multi-member decompressed in-task)."""
    import ray

    files = ray.data.read_binary_files(paths, include_paths=True,
                                       **read_kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        import gzip
        out = []
        paths_col = batch.column("path").to_pylist()
        bytes_col = batch.column("bytes").to_pylist()
        for p, b in zip(paths_col, bytes_col):
            # magic-byte check, not extension: Ray's binary reader
            # already auto-decompresses recognized .gz paths
            if b[:2] == b"\x1f\x8b":
                b = gzip.decompress(b)
            out.extend(parse_warc_bytes(b, path=p))
        return _records_table(out)

    return files.map_batches(parse, batch_format="pyarrow")


def warc_responses(records_ds):
    """response records → (url, warc_date, http_status,
    http_content_type, body). The HTTP head is split from the payload
    at the first CRLFCRLF; status from the status line; header lookup
    is case-insensitive."""

    def split(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("url", "warc_date", "http_status",
                                "http_content_type", "body")}
        wt = batch.column("warc_type").to_pylist()
        uri = batch.column("target_uri").to_pylist()
        dt = batch.column("warc_date").to_pylist()
        pl = batch.column("payload").to_pylist()
        for i in range(batch.num_rows):
            if wt[i] != "response":
                continue
            p = pl[i]
            cut = p.find(_CRLF2)
            head, body = (p[:cut], p[cut + 4:]) if cut >= 0 else (p, b"")
            lines = head.split(b"\r\n")
            status = 0
            if lines and lines[0].startswith(b"HTTP/"):
                parts = lines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
            hdrs = _parse_headers(b"\r\n".join(lines[1:]))
            rows["url"].append(uri[i])
            rows["warc_date"].append(dt[i])
            rows["http_status"].append(status)
            rows["http_content_type"].append(
                hdrs.get("content-type", ""))
            rows["body"].append(body)
        return pa.table({
            "url": pa.array(rows["url"], type=pa.string()),
            "warc_date": pa.array(rows["warc_date"], type=pa.string()),
            "http_status": pa.array(rows["http_status"],
                                    type=pa.int64()),
            "http_content_type": pa.array(rows["http_content_type"],
                                          type=pa.string()),
            "body": pa.array(rows["body"], type=pa.binary()),
        })

    return records_ds.map_batches(split, batch_format="pyarrow")


def responses_to_docs(responses_ds, min_status: int = 200,
                      max_status: int = 299):
    """(url, warc_date, text) for 2xx responses — utf-8 with
    replacement (vectorized Arrow cast after the binary filter)."""
    import pyarrow.compute as pc

    def decode(batch: pa.Table) -> pa.Table:
        st = batch.column("http_status")
        keep = pc.and_(pc.greater_equal(st, min_status),
                       pc.less_equal(st, max_status))
        sel = batch.filter(keep)
        body = sel.column("body").to_pylist()
        text = pa.array([b.decode("utf-8", "replace") for b in body],
                        type=pa.string())
        return pa.table({"url": sel.column("url"),
                         "warc_date": sel.column("warc_date"),
                         "text": text})

    return responses_ds.map_batches(decode, batch_format="pyarrow")


def make_warc_bytes(rows, warcinfo: bool = True) -> bytes:
    """Spec-framed WARC/1.0 bytes for (url, date, status, ctype, body)
    tuples — response records with an HTTP head; deterministic record
    ids derived from the url. Test-fixture/writer helper."""
    import hashlib
    out = []
    if warcinfo:
        info = b"software: geoflow-warc-writer\r\n"
        out.append(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                   b"WARC-Record-ID: <urn:uuid:geoflow-warcinfo>\r\n"
                   b"Content-Type: application/warc-fields\r\n"
                   b"Content-Length: " + str(len(info)).encode()
                   + b"\r\n\r\n" + info + b"\r\n\r\n")
    for url, date, status, ctype, body in rows:
        if isinstance(body, str):
            body = body.encode("utf-8")
        http = (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
                ).encode("ascii") + body
        rid = hashlib.blake2b(url.encode(), digest_size=8).hexdigest()
        hdr = (f"WARC/1.0\r\nWARC-Type: response\r\n"
               f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
               f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
               f"Content-Type: application/http;msgtype=response\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode("ascii")
        out.append(hdr + http + b"\r\n\r\n")
    return b"".join(out)
