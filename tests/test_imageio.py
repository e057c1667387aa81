"""PNG / (Geo)TIFF / BIL codec tests (geoflow/raster/imageio.py).

The encoders and decoders are independent code paths (the decoder
handles all five PNG filters and both TIFF byte orders; the encoder
emits one filter and little-endian), so roundtrips exercise real
cross-checking; byte-level fixtures are additionally hand-assembled
from the specs (W3C PNG 2nd ed. §9/§11, TIFF 6.0 §2, OGC 19-008r4).
"""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from geoflow.raster.imageio import (bil_decode, bil_encode, png_decode,
                                    png_encode, png_to_raster,
                                    raster_to_png, tiff_decode,
                                    tiff_encode)
from geoflow.raster.rastwkb import (PT_8BUI, PT_16BSI, PT_16BUI, PT_32BF,
                                    PT_64BF, Raster, from_wkb, to_wkb)


def _rng():
    return np.random.default_rng(20260818)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype,maxv", [(np.uint8, 256),
                                        (np.uint16, 65536)])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(dtype, maxv, channels, filter_type):
    a = _rng().integers(0, maxv, size=(11, 7, channels)).astype(dtype)
    b = png_decode(png_encode(a, filter_type=filter_type))
    assert b.dtype == dtype and b.shape == a.shape
    assert (b == a).all()


def test_png_gradient_compresses_with_sub_filter():
    # sanity: filters actually engage (a gradient under Sub is near-RLE)
    a = np.tile(np.arange(256, dtype=np.uint8), (64, 1))
    assert len(png_encode(a, filter_type=1)) < len(png_encode(a, 0))


def test_png_handbuilt_fixture():
    # 2x2 gray, filter 0, assembled chunk-by-chunk from the spec
    raw = bytes([0, 10, 20]) + bytes([0, 30, 40])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = png_decode(buf)
    assert out.shape == (2, 2, 1)
    assert out[:, :, 0].tolist() == [[10, 20], [30, 40]]


def test_png_rejects_bad_crc_and_interlace():
    a = np.zeros((2, 2), dtype=np.uint8)
    buf = bytearray(png_encode(a))
    buf[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(buf))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        png_decode(bad)


def test_png_raster_bridge_and_ops():
    import geoflow.raster  # noqa: F401
    from geoflow.ops.registry import get_op
    bands = [(_rng().integers(0, 256, size=(5, 6))).astype(np.uint8)
             for _ in range(3)]
    r = Raster(bands, [PT_8BUI] * 3, [None] * 3, shape=(5, 6))
    r2 = png_to_raster(raster_to_png(r))
    for b1, b2 in zip(r.bands, r2.bands):
        assert (b1 == b2).all()
    col = pa.array([to_wkb(r), None], type=pa.binary())
    png = get_op("rast_aspng").fn(col)
    assert png[1].as_py() is None
    back = get_op("rast_frompng").fn(png)
    rb = from_wkb(back[0].as_py())
    assert rb.pixtypes == [PT_8BUI] * 3
    assert all((a == b).all() for a, b in zip(rb.bands, r.bands))


def test_png_rejects_float_bands():
    r = Raster([np.zeros((2, 2))], [PT_64BF], [None], shape=(2, 2))
    with pytest.raises(ValueError, match="8BUI or 16BUI"):
        raster_to_png(r)


def test_media_decoder_real_png():
    from geoflow.media.stages import MediaDecoder
    a = _rng().integers(0, 256, size=(6, 9, 3)).astype(np.uint8)
    batch = pa.table({
        "key": pa.array([1], type=pa.int64()),
        "media_type": pa.array(["image"]),
        "payload": pa.array([png_encode(a)], type=pa.binary()),
        "width": pa.array([9], type=pa.int32()),
        "height": pa.array([6], type=pa.int32()),
        "channels": pa.array([3], type=pa.int32()),
        "sample_rate": pa.array([0], type=pa.int32()),
        "n_frames": pa.array([1], type=pa.int32()),
        "codec": pa.array(["png"]),
    })
    out = MediaDecoder()(batch)
    assert out.column("pixels")[0].as_py() == a.tobytes()


# ---------------------------------------------------------------------------
# TIFF / GeoTIFF
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pt,dt", [(PT_8BUI, "u1"), (PT_16BSI, "i2"),
                                   (PT_16BUI, "u2"), (PT_32BF, "f4"),
                                   (PT_64BF, "f8")])
@pytest.mark.parametrize("compression", ["none", "deflate"])
def test_tiff_roundtrip_types(pt, dt, compression):
    bands = [_rng().integers(-90, 90, size=(4, 9)).astype(dt)
             for _ in range(2)]
    r = Raster(bands, [pt] * 2, [None, 3.0], 0.25, -0.5, -10.0, 40.0,
               0.0, 0.0, 32633, shape=(4, 9))
    r2 = tiff_decode(tiff_encode(r, compression))
    assert r2.pixtypes == [pt] * 2
    assert (r2.scale_x, r2.scale_y, r2.ip_x, r2.ip_y) == \
        (0.25, -0.5, -10.0, 40.0)
    assert r2.srid == 32633
    assert r2.nodata[0] == 3.0  # GDAL_NODATA is per-file
    for b1, b2 in zip(r.bands, r2.bands):
        assert (b1 == b2).all()


def test_geotiff_sheared_and_geographic():
    r = Raster([np.arange(6, dtype="u1").reshape(2, 3)], [PT_8BUI],
               [None], 2.0, -3.0, 5.0, 6.0, 0.25, 0.125, 4326,
               shape=(2, 3))
    r2 = tiff_decode(tiff_encode(r))
    assert (r2.skew_x, r2.skew_y) == (0.25, 0.125)
    assert (r2.scale_x, r2.scale_y) == (2.0, -3.0)
    assert r2.srid == 4326  # GeographicTypeGeoKey path


def test_tiff_handbuilt_bigendian_chunky():
    # Big-endian, chunky (PlanarConfiguration 1), 2 samples/pixel,
    # single strip, uncompressed — none of which the encoder emits.
    w, h, spp = 3, 2, 2
    px = np.arange(w * h * spp, dtype=">u2").reshape(h, w, spp)
    data = px.tobytes()

    def entry(tag, typ, count, value):
        return struct.pack(">HHI", tag, typ, count) + value

    entries = []
    entries.append(entry(256, 3, 1, struct.pack(">HH", w, 0)))
    entries.append(entry(257, 3, 1, struct.pack(">HH", h, 0)))
    bits_off = None  # BitsPerSample count 2 fits inline (2x SHORT)
    entries.append(entry(258, 3, 2, struct.pack(">HH", 16, 16)))
    entries.append(entry(259, 3, 1, struct.pack(">HH", 1, 0)))
    entries.append(entry(262, 3, 1, struct.pack(">HH", 1, 0)))
    entries.append(entry(277, 3, 1, struct.pack(">HH", spp, 0)))
    entries.append(entry(284, 3, 1, struct.pack(">HH", 1, 0)))
    n = len(entries) + 2  # + offsets/counts below
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    entries.append(entry(273, 4, 1, struct.pack(">I", data_off)))
    entries.append(entry(279, 4, 1, struct.pack(">I", len(data))))
    entries.sort(key=lambda e: struct.unpack(">H", e[:2])[0])
    buf = (b"MM" + struct.pack(">HI", 42, ifd_off)
           + struct.pack(">H", n) + b"".join(entries)
           + struct.pack(">I", 0) + data)
    r = tiff_decode(buf)
    assert r.shape == (h, w) and len(r.bands) == spp
    assert r.pixtypes == [PT_16BUI] * 2
    assert (r.bands[0] == px[:, :, 0].astype("u2")).all()
    assert (r.bands[1] == px[:, :, 1].astype("u2")).all()
    assert bits_off is None


def test_tiff_ops_column():
    import geoflow.raster  # noqa: F401
    from geoflow.ops.registry import get_op
    r = Raster([np.arange(16, dtype="f8").reshape(4, 4)], [PT_64BF],
               [None], 1.0, -1.0, 0.0, 4.0, 0.0, 0.0, 3857, shape=(4, 4))
    col = pa.array([to_wkb(r)], type=pa.binary())
    tif = get_op("rast_astiff").fn(col)
    back = from_wkb(get_op("rast_fromtiff").fn(tif)[0].as_py())
    assert back.srid == 3857 and (back.bands[0] == r.bands[0]).all()


def test_tiff_rejects_mixed_band_types():
    r = Raster([np.zeros((2, 2), "u1"), np.zeros((2, 2), "f4")],
               [PT_8BUI, PT_32BF], [None, None], shape=(2, 2))
    with pytest.raises(ValueError, match="share one pixel type"):
        tiff_encode(r)


# ---------------------------------------------------------------------------
# BIL
# ---------------------------------------------------------------------------

def test_bil_roundtrip_interleave():
    bands = [np.arange(12, dtype="i2").reshape(3, 4) * (i + 1)
             for i in range(3)]
    r = Raster(bands, [PT_16BSI] * 3, [None] * 3, shape=(3, 4))
    raw = bil_encode(r)
    # byte layout: row 0 of band 0, row 0 of band 1, ... (by line)
    first_line = np.frombuffer(raw, dtype="<i2")[:12].reshape(3, 4)
    assert (first_line == np.stack([b[0] for b in bands])).all()
    r2 = bil_decode(raw, 4, 3, 3, PT_16BSI)
    for b1, b2 in zip(bands, r2.bands):
        assert (b1 == b2).all()
