"""Apache Avro object-container-file codec, pure stdlib + numpy.

Implements the Avro 1.11 specification (https://avro.apache.org/docs/
1.11.1/specification/) subset that a columnar engine needs:

- Object container files: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, data
  blocks of (row count, byte size, payload, sync).
- Codecs ``null`` and ``deflate`` (RFC 1951 RAW deflate — no zlib
  header/checksum, per the spec).
- Types: long (int64), double (float64), string, bytes, boolean,
  and ``timestamp-micros`` logical longs (timestamp[us]); every
  record field is written as the nullable union ``["null", T]`` so
  Arrow null semantics round-trip exactly.
- Integers are zigzag varints: ``zigzag(v) = (v << 1) ^ (v >> 63)``,
  little-endian base-128 with the high bit as continuation.

ENCODE is fully vectorized: per-column numpy varint matrices +
cumsum-scatter row assembly (no per-row Python). DECODE is a per-row
scalar walk over the block payload — the same documented scope as
the repo's other pure-stdlib entropy codecs (JPEG/GIF LZW): a
variable-length record stream has no row boundaries to vectorize
over until it is parsed. Files are written one per Ray block inside
``map_batches`` (content-hash names, tmp+rename — idempotent,
resume-friendly, matching io/geojson_sink.py), and read back via
``ray.data.read_binary_files`` + a decode ``map_batches`` stage.

The sync marker is derived deterministically from the schema and
payload hash (kernels must be RNG/wall-clock free — CLAUDE.md
determinism rules); the spec only requires per-file consistency.
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np
import pyarrow as pa

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- varints

def _zigzag64(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).view(np.uint64)


def _varint_matrix(u: np.ndarray):
    """uint64 array -> (flat little-endian base-128 bytes, per-value
    lengths). Vectorized: 10-column byte matrix + row-major masked
    flatten (each value's bytes stay contiguous)."""
    n = len(u)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    # number of 7-bit groups: ceil(bitlen/7), min 1
    nbits = np.int64(64) - _clz64_arr(u | np.uint64(1))
    lens = (nbits + 6) // 7
    cols = int(lens.max())
    mat = np.zeros((n, cols), np.uint8)
    for i in range(cols):
        b = ((u >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        cont = i < (lens - 1)
        mat[:, i] = b | (cont.astype(np.uint8) << 7)
    mask = np.arange(cols)[None, :] < lens[:, None]
    return mat[mask], lens


def _clz64_arr(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 (x > 0)."""
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    use_hi = hi != 0
    top = np.where(use_hi, hi, lo).astype(np.float64)
    # bit length via float exponent is unsafe above 2^53? no: uint32
    # fits float64 exactly, log2 floor via frexp
    _m, e = np.frexp(top)
    bl = e.astype(np.int64)  # bit length of the 32-bit half
    return np.where(use_hi, np.int64(32) - bl, np.int64(64) - bl)


def _enc_varint_scalar(v: int) -> bytes:
    u = ((v << 1) ^ (v >> 63)) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf, off: int):
    shift = 0
    u = 0
    while True:
        b = buf[off]
        off += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), off


# ---------------------------------------------------------------- schema

def _avro_schema(schema: pa.Schema, name: str = "row") -> dict:
    fields = []
    for f in schema:
        t = f.type
        if pa.types.is_int64(t) or pa.types.is_int32(t):
            at = "long"
        elif pa.types.is_float64(t) or pa.types.is_float32(t):
            at = "double"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            at = "string"
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            at = "bytes"
        elif pa.types.is_boolean(t):
            at = "boolean"
        elif pa.types.is_timestamp(t):
            at = {"type": "long", "logicalType": "timestamp-micros"}
        else:
            raise NotImplementedError(f"avro type for {t}")
        fields.append({"name": f.name, "type": ["null", at]})
    return {"type": "record", "name": name, "fields": fields}


# ---------------------------------------------------------------- encode

def _encode_column(col: pa.ChunkedArray | pa.Array):
    """Column -> (flat value bytes incl. the union-branch varint,
    per-row lengths). Null rows encode as the 1-byte branch 0."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    t = arr.type
    valid = np.ones(n, bool)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
    if pa.types.is_timestamp(t):
        vals = arr.cast(pa.timestamp("us")).cast(pa.int64())
        vals = np.asarray(vals.fill_null(0), np.int64)
        body, blens = _varint_matrix(_zigzag64(vals))
        body, blens = _mask_rows(body, blens, valid)
    elif pa.types.is_integer(t):
        vals = np.asarray(arr.cast(pa.int64()).fill_null(0), np.int64)
        body, blens = _varint_matrix(_zigzag64(vals))
        body, blens = _mask_rows(body, blens, valid)
    elif pa.types.is_floating(t):
        vals = np.asarray(arr.cast(pa.float64()).fill_null(0.0),
                          np.float64)
        body = vals.astype("<f8").view(np.uint8).reshape(n, 8)
        blens = np.full(n, 8, np.int64)
        body, blens = _mask_rows(body.reshape(-1), blens, valid)
    elif pa.types.is_boolean(t):
        vals = np.asarray(arr.fill_null(False)).astype(np.uint8)
        blens = np.ones(n, np.int64)
        body, blens = _mask_rows(vals, blens, valid)
    elif (pa.types.is_string(t) or pa.types.is_large_string(t)
          or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        if pa.types.is_string(t) or pa.types.is_binary(t):
            arr2 = arr.cast(pa.large_binary()
                            if pa.types.is_binary(t)
                            else pa.large_string())
        else:
            arr2 = arr
        arr2 = arr2.fill_null("" if pa.types.is_string(t)
                              or pa.types.is_large_string(t) else b"")
        buffers = arr2.buffers()
        offs = np.frombuffer(buffers[1], np.int64,
                             count=len(arr2) + 1,
                             offset=arr2.offset * 8)
        data = np.frombuffer(buffers[2], np.uint8) \
            if buffers[2] is not None else np.empty(0, np.uint8)
        slens = offs[1:] - offs[:-1]
        lb, lblens = _varint_matrix(_zigzag64(slens))
        # interleave per row: varint(len) + payload
        blens = lblens + slens
        body = np.empty(int(blens.sum()), np.uint8)
        dst = np.concatenate(([0], np.cumsum(blens)[:-1]))
        _scatter(body, dst, lb, lblens)
        _scatter(body, dst + lblens, data[offs[0]:offs[-1]]
                 if len(data) else data,
                 slens, src_starts=offs[:-1] - offs[0])
        body, blens = _mask_rows(body, blens, valid)
    else:
        raise NotImplementedError(f"avro encode for {t}")
    # prepend the union branch varint: 0 (null) or 2 (value)
    branch = np.where(valid, np.uint8(2), np.uint8(0))
    out_lens = np.where(valid, blens + 1, 1)
    out = np.empty(int(out_lens.sum()), np.uint8)
    starts = np.concatenate(([0], np.cumsum(out_lens)[:-1]))
    out[starts] = branch
    _scatter(out, starts + 1, body, np.where(valid, blens, 0))
    return out, out_lens


def _mask_rows(flat: np.ndarray, lens: np.ndarray, valid: np.ndarray):
    """Drop the byte ranges of invalid rows from a flat buffer."""
    if valid.all():
        return flat, lens
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    keep = np.zeros(len(flat), bool)
    _mark(keep, starts[valid], lens[valid])
    return flat[keep], np.where(valid, lens, 0)


def _mark(mask: np.ndarray, starts: np.ndarray, lens: np.ndarray):
    nz = lens > 0
    starts, lens = starts[nz], lens[nz]
    if len(starts) == 0:
        return
    idx = np.repeat(starts, lens) + _intra(lens)
    mask[idx] = True


def _intra(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... intra-range offsets."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    reps = np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    return np.arange(total, dtype=np.int64) - reps


def _scatter(dst_buf: np.ndarray, dst_starts: np.ndarray,
             src: np.ndarray, lens: np.ndarray,
             src_starts: np.ndarray | None = None):
    """dst_buf[dst_starts[i] : +lens[i]] = src[src_starts[i] : +lens[i]]
    (contiguous src when src_starts is None), vectorized."""
    nz = lens > 0
    d, ln = dst_starts[nz], lens[nz]
    if len(d) == 0:
        return
    intra = _intra(ln)
    didx = np.repeat(d, ln) + intra
    if src_starts is None:
        s = np.concatenate(([0], np.cumsum(ln)[:-1]))
        sidx = np.repeat(s, ln) + intra
    else:
        sidx = np.repeat(src_starts[nz], ln) + intra
    dst_buf[didx] = src[sidx]


def write_avro_bytes(table: pa.Table, codec: str = "deflate",
                     name: str = "row") -> bytes:
    """Serialize an Arrow table as one Avro object container file
    (single data block; callers control block size via Ray block
    size). Vectorized column encode + cumsum-scatter row assembly."""
    import hashlib

    schema_json = json.dumps(_avro_schema(table.schema, name),
                             separators=(",", ":"))
    n = table.num_rows
    parts = [_encode_column(table.column(i))
             for i in range(table.num_columns)]
    row_lens = np.zeros(n, np.int64)
    for _b, lens in parts:
        row_lens += lens
    total = int(row_lens.sum())
    payload = np.empty(total, np.uint8)
    row_starts = np.concatenate(([0], np.cumsum(row_lens)[:-1]))
    cursor = row_starts.copy()
    for body, lens in parts:
        _scatter(payload, cursor, body, lens)
        cursor = cursor + lens
    raw = payload.tobytes()
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        data = co.compress(raw) + co.flush()
    elif codec == "null":
        data = raw
    else:
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = hashlib.blake2b(schema_json.encode() + raw[:4096],
                           digest_size=16).digest()
    out = bytearray()
    out += _MAGIC
    # file metadata map: one block of 2 entries, then end marker 0
    out += _enc_varint_scalar(2)
    for k, v in (("avro.schema", schema_json.encode()),
                 ("avro.codec", codec.encode())):
        kb = k.encode()
        out += _enc_varint_scalar(len(kb)) + kb
        out += _enc_varint_scalar(len(v)) + v
    out += _enc_varint_scalar(0)
    out += sync
    if n:
        out += _enc_varint_scalar(n)
        out += _enc_varint_scalar(len(data))
        out += data
        out += sync
    return bytes(out)


# ---------------------------------------------------------------- decode

def read_avro_bytes(data: bytes) -> pa.Table:
    """Parse one Avro object container file -> Arrow table."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    off = 4
    meta = {}
    while True:
        cnt, off = _dec_varint(data, off)
        if cnt == 0:
            break
        if cnt < 0:  # block with byte size prefix
            cnt = -cnt
            _sz, off = _dec_varint(data, off)
        for _ in range(cnt):
            klen, off = _dec_varint(data, off)
            k = data[off:off + klen].decode()
            off += klen
            vlen, off = _dec_varint(data, off)
            v = data[off:off + vlen]
            off += vlen
            meta[k] = v
    sync = data[off:off + 16]
    off += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise NotImplementedError("only record schemas supported")
    fields = schema["fields"]
    cols: dict[str, list] = {f["name"]: [] for f in fields}
    while off < len(data):
        cnt, off = _dec_varint(data, off)
        bsz, off = _dec_varint(data, off)
        block = data[off:off + bsz]
        off += bsz
        if data[off:off + 16] != sync:
            raise ValueError("sync marker mismatch")
        off += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        _decode_block(block, cnt, fields, cols)
    return pa.table({f["name"]: _to_arrow(f, cols[f["name"]])
                     for f in fields})


def _field_kind(ftype) -> str:
    """Resolve a field type (possibly a nullable union / logical
    annotation) to a primitive kind tag."""
    if isinstance(ftype, list):
        non_null = [t for t in ftype if t != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"union {ftype}")
        return _field_kind(non_null[0])
    if isinstance(ftype, dict):
        if ftype.get("logicalType") == "timestamp-micros":
            return "timestamp"
        return _field_kind(ftype["type"])
    if ftype in ("long", "int"):
        return "long"
    if ftype in ("double", "float"):
        return "double"
    return {"string": "string", "bytes": "bytes",
            "boolean": "boolean"}[ftype]


def _decode_block(buf: bytes, n_rows: int, fields, cols):
    """Per-row scalar walk (documented pure-stdlib codec scope)."""
    kinds = [( f["name"], _field_kind(f["type"]),
               isinstance(f["type"], list) and "null" in f["type"])
             for f in fields]
    unpack_d = struct.unpack_from
    off = 0
    for _ in range(n_rows):
        for name, kind, nullable in kinds:
            if nullable:
                branch, off = _dec_varint(buf, off)
                if branch == 0:
                    cols[name].append(None)
                    continue
            if kind in ("long", "timestamp"):
                v, off = _dec_varint(buf, off)
            elif kind == "double":
                v = unpack_d("<d", buf, off)[0]
                off += 8
            elif kind == "boolean":
                v = buf[off] != 0
                off += 1
            else:  # string / bytes
                ln, off = _dec_varint(buf, off)
                raw = buf[off:off + ln]
                off += ln
                v = raw.decode() if kind == "string" else raw
            cols[name].append(v)
    if off != len(buf):
        raise ValueError("trailing bytes in avro data block")


def _to_arrow(field, values: list) -> pa.Array:
    kind = _field_kind(field["type"])
    t = {"long": pa.int64(), "double": pa.float64(),
         "string": pa.string(), "bytes": pa.binary(),
         "boolean": pa.bool_(),
         "timestamp": pa.timestamp("us")}[kind]
    if kind == "timestamp":
        return pa.array(values, pa.int64()).cast(t)
    return pa.array(values, t)


# ---------------------------------------------------------------- Ray IO

def write_avro(ds, path: str, codec: str = "deflate"):
    """Write a Dataset as one .avro container file per block inside
    the map tasks (distributed; content-hash filenames, tmp+rename —
    idempotent re-runs skip finished files, io/geojson_sink.py
    convention). Returns per-file (path, rows) rows."""
    import hashlib
    import os

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        data = write_avro_bytes(batch, codec=codec)
        h = hashlib.blake2b(data, digest_size=12).hexdigest()
        fp = os.path.join(path, f"part-{h}.avro")
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


def read_avro(path: str):
    """Dataset over the .avro files under ``path`` (one decode task
    per file via read_binary_files — gzip magic sniffing is not
    needed: container files are recognized by their own magic)."""
    import ray.data

    files = ray.data.read_binary_files(path, file_extensions=["avro"])

    def decode(batch: pa.Table) -> pa.Table:
        tables = [read_avro_bytes(b.as_py())
                  for b in batch.column("bytes")]
        return pa.concat_tables(tables)

    return files.map_batches(decode, batch_format="pyarrow")
