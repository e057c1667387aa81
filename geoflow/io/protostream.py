"""Protocol-Buffers wire-format codec for varint-delimited record
streams, pure stdlib + numpy.

Implements the protobuf wire format (https://protobuf.dev/
programming-guides/encoding/) for flat messages over the column
types a table engine needs, framed as the standard varint
length-delimited stream (each record: unsigned-varint byte length +
message bytes — the framing of `writeDelimitedTo`):

- wire types: 0 = varint, 1 = 64-bit LE, 2 = length-delimited
- int64 / timestamp-micros columns -> ``sint64`` (ZigZag varint —
  shares the Avro varint kernels, io/avroio.py)
- float64 -> ``double`` (wire type 1), bool -> varint 0/1
- string/bytes -> wire type 2 with unsigned-varint length
- nulls follow proto3 *optional* field-presence semantics: a null is
  an OMITTED field, a present value (default or not) is serialized;
  decode maps absent -> null. Unknown field numbers are skipped by
  wire type, per spec.

The field schema (number -> name/type) rides in a ``schema.json``
sidecar written once per directory (idempotent). Encode is
vectorized (tag/varint byte matrices + cumsum scatter); decode is
the per-record scalar walk shared with the other pure-stdlib codecs.
Files are written one per Ray block (content-hash names, tmp+rename)
and read via ``read_binary_files`` + a decode stage.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

from .avroio import _intra, _scatter, _varint_matrix, _zigzag64

_WT_VARINT, _WT_I64, _WT_LEN = 0, 1, 2


def _uvarint_matrix(u: np.ndarray):
    """Unsigned base-128 varints (no zigzag) for a uint64 array."""
    return _varint_matrix(u)


def _enc_uvarint_scalar(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_uvarint(buf, off: int):
    shift = 0
    u = 0
    while True:
        b = buf[off]
        off += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, off
        shift += 7


def _pb_schema(schema: pa.Schema) -> list[dict]:
    """Ordered field specs: {num, name, kind}; numbers 1..n (all
    single-byte tags require n <= 15, enforced)."""
    if len(schema) > 15:
        raise NotImplementedError("more than 15 fields needs "
                                  "multi-byte tags")
    out = []
    for i, f in enumerate(schema):
        t = f.type
        if pa.types.is_timestamp(t):
            kind = "timestamp"
        elif pa.types.is_integer(t):
            kind = "sint64"
        elif pa.types.is_floating(t):
            kind = "double"
        elif pa.types.is_boolean(t):
            kind = "bool"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            kind = "string"
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            kind = "bytes"
        else:
            raise NotImplementedError(f"protobuf kind for {t}")
        out.append({"num": i + 1, "name": f.name, "kind": kind})
    return out


_KIND_WT = {"sint64": _WT_VARINT, "timestamp": _WT_VARINT,
            "bool": _WT_VARINT, "double": _WT_I64,
            "string": _WT_LEN, "bytes": _WT_LEN}


def _encode_field(arr: pa.Array, spec: dict):
    """(flat bytes incl. tag, per-row lengths); null rows length 0."""
    n = len(arr)
    kind = spec["kind"]
    tag = np.uint8((spec["num"] << 3) | _KIND_WT[kind])
    valid = np.ones(n, bool)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
    if kind in ("sint64", "timestamp"):
        a = arr.cast(pa.timestamp("us")).cast(pa.int64()) \
            if kind == "timestamp" else arr.cast(pa.int64())
        vals = np.asarray(a.fill_null(0), np.int64)
        body, blens = _varint_matrix(_zigzag64(vals))
    elif kind == "double":
        vals = np.asarray(arr.cast(pa.float64()).fill_null(0.0),
                          np.float64)
        body = vals.astype("<f8").view(np.uint8)
        blens = np.full(n, 8, np.int64)
    elif kind == "bool":
        body = np.asarray(arr.fill_null(False)).astype(np.uint8)
        blens = np.ones(n, np.int64)
    else:  # string / bytes
        a = arr
        if pa.types.is_string(a.type):
            a = a.cast(pa.large_string())
        elif pa.types.is_binary(a.type):
            a = a.cast(pa.large_binary())
        a = a.fill_null("" if kind == "string" else b"")
        bufs = a.buffers()
        offs = np.frombuffer(bufs[1], np.int64, count=len(a) + 1,
                             offset=a.offset * 8)
        data = np.frombuffer(bufs[2], np.uint8) \
            if bufs[2] is not None else np.empty(0, np.uint8)
        slens = offs[1:] - offs[:-1]
        lb, lblens = _uvarint_matrix(slens.astype(np.uint64))
        blens = lblens + slens
        body = np.empty(int(blens.sum()), np.uint8)
        dst = np.concatenate(([0], np.cumsum(blens)[:-1]))
        _scatter(body, dst, lb, lblens)
        _scatter(body, dst + lblens,
                 data[offs[0]:offs[-1]] if len(data) else data,
                 slens, src_starts=offs[:-1] - offs[0])
    out_lens = np.where(valid, blens + 1, 0)
    out = np.empty(int(out_lens.sum()), np.uint8)
    starts = np.concatenate(([0], np.cumsum(out_lens)[:-1]))
    out[starts[valid]] = tag
    # compact the valid rows' bodies contiguously against the tags
    body_starts = np.concatenate(([0], np.cumsum(blens)[:-1]))
    _scatter(out, starts[valid] + 1, body,
             blens[valid], src_starts=body_starts[valid])
    return out, out_lens


def encode_records(table: pa.Table) -> bytes:
    """Arrow table -> varint-delimited protobuf record stream."""
    n = table.num_rows
    if n == 0:
        return b""
    specs = _pb_schema(table.schema)
    parts = []
    for i, spec in enumerate(specs):
        col = table.column(i).combine_chunks()
        parts.append(_encode_field(col, spec))
    msg_lens = np.zeros(n, np.int64)
    for _b, lens in parts:
        msg_lens += lens
    frame, flens = _uvarint_matrix(msg_lens.astype(np.uint64))
    row_lens = flens + msg_lens
    out = np.empty(int(row_lens.sum()), np.uint8)
    row_starts = np.concatenate(([0], np.cumsum(row_lens)[:-1]))
    fstarts = np.concatenate(([0], np.cumsum(flens)[:-1]))
    _scatter(out, row_starts, frame, flens, src_starts=fstarts)
    cursor = row_starts + flens
    for body, lens in parts:
        _scatter(out, cursor, body, lens)
        cursor = cursor + lens
    return out.tobytes()


def decode_records(data: bytes, specs: list[dict]) -> pa.Table:
    """Varint-delimited stream -> Arrow table (absent fields null;
    unknown field numbers skipped by wire type)."""
    by_num = {s["num"]: s for s in specs}
    cols: dict[str, list] = {s["name"]: [] for s in specs}
    unpack = struct.unpack_from
    off = 0
    total = len(data)
    while off < total:
        mlen, off = _dec_uvarint(data, off)
        end = off + mlen
        row = {}
        while off < end:
            key, off = _dec_uvarint(data, off)
            num, wt = key >> 3, key & 7
            if wt == _WT_VARINT:
                u, off = _dec_uvarint(data, off)
                v = (u >> 1) ^ -(u & 1)  # sint64 zigzag
            elif wt == _WT_I64:
                v = unpack("<d", data, off)[0]
                off += 8
            elif wt == _WT_LEN:
                ln, off = _dec_uvarint(data, off)
                v = data[off:off + ln]
                off += ln
            elif wt == 5:  # 32-bit, skippable unknown
                v = unpack("<f", data, off)[0]
                off += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            spec = by_num.get(num)
            if spec is None:
                continue  # unknown field: skipped
            kind = spec["kind"]
            if kind == "bool":
                v = bool(v)
            elif kind == "string":
                v = v.decode()
            elif kind == "double" and wt != _WT_I64:
                raise ValueError("wire type mismatch for double")
            row[num] = v
        if off != end:
            raise ValueError("record overran its length prefix")
        for s in specs:
            cols[s["name"]].append(row.get(s["num"]))
    arrays = {}
    for s in specs:
        kind = s["kind"]
        t = {"sint64": pa.int64(), "double": pa.float64(),
             "bool": pa.bool_(), "string": pa.string(),
             "bytes": pa.binary(),
             "timestamp": pa.timestamp("us")}[kind]
        vals = cols[s["name"]]
        if kind == "timestamp":
            arrays[s["name"]] = pa.array(vals, pa.int64()).cast(t)
        else:
            arrays[s["name"]] = pa.array(vals, t)
    return pa.table(arrays)


# ---------------------------------------------------------------- Ray IO

def write_protostream(ds, path: str):
    """One varint-delimited .pb file per block + a schema.json
    sidecar (written once; content-hash filenames, tmp+rename)."""
    import hashlib
    import os

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        specs = _pb_schema(batch.schema)
        sp = os.path.join(path, "schema.json")
        if not os.path.exists(sp):
            tmp = sp + f".tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(specs, f)
            os.replace(tmp, sp)
        data = encode_records(batch)
        h = hashlib.blake2b(data, digest_size=12).hexdigest()
        fp = os.path.join(path, f"part-{h}.pb")
        if not os.path.exists(fp):
            tmp = fp + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, fp)
        return pa.table({"path": pa.array([fp]),
                         "rows": pa.array([batch.num_rows],
                                          pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None)


def read_protostream(path: str):
    """Dataset over the .pb files under ``path`` (schema from the
    sidecar, one decode task per file)."""
    import os

    import ray.data

    with open(os.path.join(path, "schema.json")) as f:
        specs = json.load(f)

    files = ray.data.read_binary_files(path, file_extensions=["pb"])

    def decode(batch: pa.Table) -> pa.Table:
        tables = [decode_records(b.as_py(), specs)
                  for b in batch.column("bytes")]
        return pa.concat_tables(tables)

    return files.map_batches(decode, batch_format="pyarrow")
