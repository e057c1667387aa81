"""Avro object-container codec (geoflow/io/avroio.py): spec golden
vectors for zigzag varints, typed roundtrips incl. nulls / unicode /
extremes / both codecs, vectorized-vs-scalar varint parity, block
append across multiple Ray blocks, and idempotent re-writes."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from geoflow.io.avroio import (_enc_varint_scalar, _varint_matrix,
                               _zigzag64, read_avro_bytes,
                               write_avro_bytes)


def test_varint_spec_goldens():
    # Avro spec table: value -> zigzag varint bytes
    for v, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                 (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                 (64, b"\x80\x01")]:
        assert _enc_varint_scalar(v) == b, v


def test_varint_vectorized_matches_scalar():
    vs = np.array([0, -1, 1, 63, 64, -65, 2**20, -2**40, 2**62,
                   -2**63, 2**63 - 1, 1234567890123456789], np.int64)
    flat, lens = _varint_matrix(_zigzag64(vs))
    pos = 0
    for v, ln in zip(vs.tolist(), lens.tolist()):
        assert flat[pos:pos + ln].tobytes() == _enc_varint_scalar(v)
        pos += ln
    assert pos == len(flat)


def _typed_table():
    return pa.table({
        "a": pa.array([1, None, -5, 2**62, 0], pa.int64()),
        "b": pa.array([1.5, float("inf"), None, -0.0,
                       float("nan")], pa.float64()),
        "s": pa.array(["héllo", "", None, 'x,"y\n', "ὠ"],
                      pa.string()),
        "raw": pa.array([b"\x00\xff", None, b"", b"abc", b"\x80"],
                        pa.binary()),
        "f": pa.array([True, False, None, True, False], pa.bool_()),
        "ts": pa.array([1, 2, None, 4, 0], pa.int64())
            .cast(pa.timestamp("us")),
    })


def _tables_bit_equal(a: pa.Table, b: pa.Table) -> bool:
    """Table equality with float columns compared by IEEE bit
    pattern (NaN == NaN, -0.0 != 0.0) — cross-array equals treats
    NaN as unequal."""
    if a.column_names != b.column_names:
        return False
    for c in a.column_names:
        ca, cb = a.column(c).combine_chunks(), \
            b.column(c).combine_chunks()
        if pa.types.is_floating(ca.type):
            na = np.asarray(ca.is_valid())
            if not (na == np.asarray(cb.is_valid())).all():
                return False
            va = np.asarray(ca.fill_null(0.0), np.float64)
            vb = np.asarray(cb.fill_null(0.0), np.float64)
            if not (va.view(np.uint64) == vb.view(np.uint64)).all():
                return False
        elif not ca.equals(cb):
            return False
    return True


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_all_types(codec):
    t = _typed_table()
    back = read_avro_bytes(write_avro_bytes(t, codec=codec))
    assert _tables_bit_equal(back, t)


def test_roundtrip_empty_and_fuzz():
    e = pa.table({"a": pa.array([], pa.int64()),
                  "s": pa.array([], pa.string())})
    assert read_avro_bytes(write_avro_bytes(e)).equals(e)
    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table({
        "id": pa.array(rng.integers(-2**60, 2**60, n), pa.int64()),
        "v": pa.array(rng.random(n), pa.float64()),
        "s": pa.array(["w" * int(k) for k in rng.integers(0, 40, n)],
                      pa.string())})
    mask = pa.array(rng.random(n) < 0.15)
    t = pa.table({c: pc.if_else(mask, pa.nulls(n, t.column(c).type),
                                t.column(c))
                  for c in t.column_names})
    assert read_avro_bytes(write_avro_bytes(t)).equals(t)


def test_ray_write_read_roundtrip(tmp_path):
    import ray.data

    from geoflow.io.avroio import read_avro, write_avro

    t = pa.table({"doc_id": pa.array(np.arange(2000), pa.int64()),
                  "txt": pa.array([f'v,"{i}"' for i in range(2000)],
                                  pa.string())})
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "avro")
    files = write_avro(ds, out, codec="deflate").take_all()
    assert sum(r["rows"] for r in files) == 2000
    assert len(files) == 4
    back = read_avro(out).take_all()
    got = sorted((r["doc_id"], r["txt"]) for r in back)
    want = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("txt").to_pylist()))
    assert got == want
    # idempotent re-write: same content-hash files, nothing new
    import os
    before = sorted(os.listdir(out))
    write_avro(ds, out, codec="deflate").take_all()
    assert sorted(os.listdir(out)) == before


def test_malformed_inputs_raise_cleanly():
    t = _typed_table()
    data = write_avro_bytes(t, codec="deflate")
    # wrong magic
    with pytest.raises(ValueError):
        read_avro_bytes(b"NOPE" + data[4:])
    # corrupted sync marker between blocks
    bad = bytearray(data)
    bad[-1] ^= 0xFF  # last byte is part of the trailing sync
    with pytest.raises(ValueError):
        read_avro_bytes(bytes(bad))
    # unsupported codec name in metadata round-trips to an error
    with pytest.raises(ValueError):
        write_avro_bytes(t, codec="snappy")
