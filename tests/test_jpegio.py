"""Baseline JPEG codec (geoflow/raster/jpegio.py) — spec anchors,
roundtrip error bounds, format rejection, raster/media wiring.

The encoder and decoder are both in-repo, so roundtrip tests alone
could hide a symmetric bug.  The anchors below are independent of the
decoder: the published T.81 Annex-C code assignment for the standard
DC-luminance table, and a fully hand-derived entropy bitstream for a
constant 8x8 block (DC path + Huffman packing + spec padding,
byte-for-byte)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from geoflow.raster.jpegio import (_DC_LUM, _huff_codes, jpeg_decode,
                                   jpeg_encode, quality_tables)
from geoflow.raster.rastwkb import Raster, from_wkb, to_wkb


def _gradient(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 2 + seed) % 256).astype(np.uint8)


def _scan_bytes(buf):
    i = buf.find(b"\xff\xda")
    (seglen,) = struct.unpack_from(">H", buf, i + 2)
    return buf[i + 2 + seglen:-2]


def test_dc_luminance_codes_match_published_table():
    # T.81 Annex C applied to the K.3.1 BITS list gives the canonical
    # codes every JPEG text reproduces: sizes 0..11 ->
    # 00,010,011,100,101,110,1110,11110,111110,...
    codes = _huff_codes(*_DC_LUM)
    expected = {0: (0b00, 2), 1: (0b010, 3), 2: (0b011, 3), 3: (0b100, 3),
                4: (0b101, 3), 5: (0b110, 3), 6: (0b1110, 4),
                7: (0b11110, 5), 8: (0b111110, 6), 9: (0b1111110, 7),
                10: (0b11111110, 8), 11: (0b111111110, 9)}
    assert codes == expected


def test_constant_block_entropy_bytes_hand_derived():
    # gray 168, q50: level shift 40 -> DC coefficient 8*40 = 320,
    # quant 16 -> 20 (all AC zero).  diff=20: size 5, code 110 (above),
    # value bits 10100; EOB = code 1010 (4th AC-lum symbol, length 4).
    # 110 10100 1010 + pad 1111 -> 0xD4 0xAF.
    a = np.full((8, 8), 168, np.uint8)
    buf = jpeg_encode(a, quality=50)
    assert _scan_bytes(buf) == bytes([0xD4, 0xAF])
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    # constant blocks decode bit-exactly (quantized DC is lossless here)
    assert np.array_equal(jpeg_decode(buf), a)


def test_quality_tables_ijg_scaling():
    lum50, _ = quality_tables(50)
    assert lum50[0] == 16  # unscaled Annex K at q=50
    lum100, chr100 = quality_tables(100)
    assert lum100.max() == 1 and chr100.max() == 1
    lum10, _ = quality_tables(10)
    assert (lum10 >= lum50).all() and lum10.max() <= 255


def test_gray_gradient_bounded_error():
    img = _gradient(40, 56)
    for q, bound in ((95, 4), (75, 8)):
        dec = jpeg_decode(jpeg_encode(img, quality=q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= bound


def test_rgb_roundtrip_444_and_420_odd_dims():
    h, w = 37, 45
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack([(x * 4) % 256, (y * 5) % 256, ((x + y) * 3) % 256],
                   axis=-1).astype(np.uint8)
    for sub, bound in (("444", 8), ("420", 16)):
        dec = jpeg_decode(jpeg_encode(rgb, quality=90, subsampling=sub))
        assert dec.shape == rgb.shape
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= bound


def test_restart_interval_roundtrip():
    img = _gradient(33, 41)
    buf = jpeg_encode(img, quality=85, restart_interval=3)
    assert b"\xff\xdd" in buf  # DRI present
    assert buf.count(b"\xff\xd0") >= 1  # at least one RST0
    dec = jpeg_decode(buf)
    base = jpeg_decode(jpeg_encode(img, quality=85))
    assert np.array_equal(dec, base)  # restarts change framing, not pixels


def test_deterministic_and_quality_size_monotone():
    img = np.random.default_rng(7).integers(0, 256, (48, 48, 3),
                                            dtype=np.uint8)
    b1 = jpeg_encode(img, quality=80)
    assert b1 == jpeg_encode(img, quality=80)
    assert len(jpeg_encode(img, quality=30)) < len(jpeg_encode(img,
                                                               quality=95))


def test_rejects_progressive_and_bad_input():
    buf = bytearray(jpeg_encode(_gradient(16, 16)))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode(bytes(buf))
    with pytest.raises(ValueError, match="uint8"):
        jpeg_encode(np.zeros((8, 8), np.uint16))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x00\x01\x02\x03")


def test_raster_ops_roundtrip():
    from geoflow.ops.registry import get_op
    band = _gradient(12, 20)
    r = Raster([band], [4], [None], 1.0, -1.0, 0.0, 12.0, 0.0, 0.0, 4326)
    col = pa.array([to_wkb(r), None], type=pa.binary())
    jpg = get_op("rast_asjpg").fn(col)
    assert jpg[1].as_py() is None
    back = get_op("rast_fromjpg").fn(jpg)
    r2 = from_wkb(back[0].as_py())
    assert r2.width == 20 and r2.height == 12
    assert np.abs(r2.bands[0].astype(int) - band.astype(int)).max() <= 8
    # 3-band path
    rgb = Raster([band, band[::-1], band], [4, 4, 4], [None] * 3)
    jpg3 = get_op("rast_asjpg").fn(pa.array([to_wkb(rgb)],
                                            type=pa.binary()))
    r3 = from_wkb(get_op("rast_fromjpg").fn(jpg3)[0].as_py())
    assert len(r3.bands) == 3
    # float bands rejected loudly
    rf = Raster([band.astype(np.float64)], [10], [None])
    with pytest.raises(ValueError, match="8BUI"):
        get_op("rast_asjpg").fn(pa.array([to_wkb(rf)], type=pa.binary()))


def test_media_decoder_real_jpeg():
    from geoflow.media import MediaDecoder
    img = _gradient(24, 16)[:, :, None].repeat(3, axis=2)
    payload = jpeg_encode(img, quality=92)
    batch = pa.table({
        "key": pa.array([1], type=pa.int64()),
        "media_type": pa.array(["image"]),
        "payload": pa.array([payload], type=pa.binary()),
        "width": pa.array([16], type=pa.int32()),
        "height": pa.array([24], type=pa.int32()),
        "channels": pa.array([3], type=pa.int32()),
        "sample_rate": pa.array([0], type=pa.int32()),
        "n_frames": pa.array([1], type=pa.int32()),
        "codec": pa.array(["jpeg"]),
    })
    out = MediaDecoder()(batch)
    px = np.frombuffer(out.column("pixels")[0].as_py(),
                       np.uint8).reshape(24, 16, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 8


def test_fill_bytes_before_markers_tolerated():
    # T.81 B.1.1.2: optional 0xFF fill bytes may precede any marker;
    # external encoders emit them (ADVICE r3). Inject fill bytes before
    # every marker segment of an own-encoded stream and re-decode.
    img = _gradient(16, 16)
    buf = jpeg_encode(img, quality=90)
    out = bytearray(buf[:2])  # SOI stays at offset 0
    i = 2
    n = len(buf)
    while i < n:
        if buf[i] == 0xFF and i + 1 < n and buf[i + 1] != 0x00:
            out += b"\xff\xff"  # fill bytes, then the real marker
            out += buf[i:i + 2]
            i += 2
            if buf[i - 1] == 0xDA:
                # entropy-coded scan follows SOS header: copy the rest
                # untouched (fill injection inside the scan is invalid)
                out += buf[i:]
                break
        else:
            out += buf[i:i + 1]
            i += 1
    dec_plain = jpeg_decode(buf)
    dec_fill = jpeg_decode(bytes(out))
    assert np.array_equal(dec_plain, dec_fill)
