"""Protobuf varint-delimited stream codec (geoflow/io/protostream.py):
wire-format golden bytes, proto3-optional null semantics, unknown-
field skipping, typed fuzz roundtrip, and the Ray sink/source cycle."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geoflow.io.protostream import (_pb_schema, decode_records,
                                    encode_records)


def test_wire_golden_bytes():
    t = pa.table({"a": pa.array([-2], pa.int64()),
                  "s": pa.array(["testing"], pa.string())})
    data = encode_records(t)
    assert data[0] == len(data) - 1
    # sint64 -2 -> zigzag 3: tag 0x08 value 0x03; string field 2:
    # tag 0x12, len 7, bytes (protobuf encoding-guide examples)
    assert data[1:] == b"\x08\x03\x12\x07testing"
    assert decode_records(data, _pb_schema(t.schema)).equals(t)


def test_unknown_field_skipped_and_absent_is_null():
    t = pa.table({"a": pa.array([0], pa.int64()),
                  "s": pa.array([""], pa.string())})
    specs = _pb_schema(t.schema)
    # field 3 (unknown varint) interleaved; field 1 absent -> null
    raw = b"\x18\x05\x12\x03abc"
    framed = bytes([len(raw)]) + raw
    out = decode_records(framed, specs)
    assert out.column("a").to_pylist() == [None]
    assert out.column("s").to_pylist() == ["abc"]


def test_null_vs_default_roundtrip():
    # proto3 optional presence: explicit 0 / "" / False survive,
    # nulls come back as nulls
    t = pa.table({
        "a": pa.array([0, None, -1], pa.int64()),
        "s": pa.array(["", None, "x"], pa.string()),
        "f": pa.array([False, None, True], pa.bool_())})
    back = decode_records(encode_records(t), _pb_schema(t.schema))
    assert back.equals(t)


def test_fuzz_roundtrip():
    rng = np.random.default_rng(13)
    n = 4000
    t = pa.table({
        "id": pa.array(rng.integers(-2**60, 2**60, n), pa.int64()),
        "v": pa.array(rng.random(n), pa.float64()),
        "s": pa.array(["q" * int(k) + "é"
                       for k in rng.integers(0, 25, n)], pa.string()),
        "raw": pa.array([bytes([int(k)] * (int(k) % 5))
                         for k in rng.integers(0, 256, n)],
                        pa.binary()),
        "f": pa.array(rng.random(n) < 0.5, pa.bool_()),
        "ts": pa.array(rng.integers(0, 2**40, n), pa.int64())
            .cast(pa.timestamp("us"))})
    mask = pa.array(rng.random(n) < 0.12)
    t = pa.table({c: pc.if_else(mask, pa.nulls(n, t.column(c).type),
                                t.column(c)) for c in t.column_names})
    back = decode_records(encode_records(t), _pb_schema(t.schema))
    assert back.equals(t)


def test_ray_write_read_roundtrip(tmp_path):
    import ray.data

    from geoflow.io.protostream import (read_protostream,
                                        write_protostream)

    t = pa.table({"doc_id": pa.array(np.arange(1500), pa.int64()),
                  "txt": pa.array([f"r{i}" for i in range(1500)],
                                  pa.string())})
    ds = ray.data.from_arrow(t).repartition(3)
    out = str(tmp_path / "pb")
    files = write_protostream(ds, out).take_all()
    assert sum(r["rows"] for r in files) == 1500
    back = read_protostream(out).take_all()
    got = sorted((r["doc_id"], r["txt"]) for r in back)
    assert got == sorted(zip(range(1500),
                             (f"r{i}" for i in range(1500))))


def test_malformed_stream_raises():
    import pytest

    t = pa.table({"a": pa.array([1, 2], pa.int64()),
                  "s": pa.array(["x", "y"], pa.string())})
    specs = _pb_schema(t.schema)
    data = encode_records(t)
    # truncated mid-record: length prefix overruns the buffer
    with pytest.raises((IndexError, ValueError)):
        decode_records(data[:-2] + b"\x7f", specs)
    # record overruns its declared length
    raw = b"\x08\x02\x12\x03abc"
    framed = bytes([3]) + raw  # declared 3, actual longer
    with pytest.raises(ValueError):
        decode_records(framed + b"", specs)
