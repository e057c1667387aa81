"""GIF87a/89a codec tests (raster/gifio.py) — LZW variable-code
roundtrips incl. 12-bit growth + mid-stream CLEAR, interlace,
transparency/disposal composition, MediaDecoder and raster-op wiring.
All fixtures are our own encoder's output or hand-assembled per the
GIF89a spec (no image library in this container)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from geoflow.raster.gifio import (_lzw_decode, _lzw_encode, gif_decode,
                                  gif_decode_frames, gif_decode_indexed,
                                  gif_encode, gif_encode_frames)


def _rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# LZW core
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,syms,mcs", [
    (0, 4, 2), (1, 4, 2), (10, 4, 2), (1000, 16, 4),
    (20000, 256, 8),        # forces width growth 9->12
    (120000, 256, 8),       # forces table-full CLEAR + rebuild
])
def test_lzw_roundtrip(n, syms, mcs):
    a = _rng().integers(0, syms, n).astype(np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(a, mcs), mcs, n), a)


def test_lzw_long_phrases_compress():
    a = np.tile(np.arange(8, dtype=np.uint8), 5000)
    enc = _lzw_encode(a, 3)
    assert np.array_equal(_lzw_decode(enc, 3, len(a)), a)
    assert len(enc) < len(a) // 10


def test_lzw_kwkwk_case():
    # "aaaa..." exercises the code==table-size (KwKwK) branch immediately
    a = np.zeros(500, dtype=np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(a, 2), 2, 500), a)


def test_lzw_truncation_raises():
    a = _rng().integers(0, 256, 1000).astype(np.uint8)
    enc = _lzw_encode(a, 8)
    with pytest.raises(ValueError, match="truncated|ended"):
        _lzw_decode(enc[:len(enc) // 2], 8, 1000)


# ---------------------------------------------------------------------------
# single-frame container
# ---------------------------------------------------------------------------

def test_gif_gray_roundtrip():
    img = _rng().integers(0, 256, (37, 53)).astype(np.uint8)
    buf = gif_encode(img)
    assert buf[:6] == b"GIF89a"
    idx, pal = gif_decode_indexed(buf)
    assert np.array_equal(idx, img)
    rgb = gif_decode(buf)
    assert rgb.shape == (37, 53, 3)
    for c in range(3):  # identity gray palette
        assert np.array_equal(rgb[:, :, c], img)


def test_gif_palette_roundtrip():
    pal_in = _rng().integers(0, 256, (10, 3)).astype(np.uint8)
    img = _rng().integers(0, 10, (20, 31)).astype(np.uint8)
    buf = gif_encode(img, pal_in)
    idx, pal = gif_decode_indexed(buf)
    assert np.array_equal(idx, img)
    assert np.array_equal(pal[:10], pal_in)
    assert np.array_equal(gif_decode(buf), pal_in[img])


def test_gif_rejects_index_beyond_palette():
    pal = np.zeros((4, 3), dtype=np.uint8)
    img = np.full((3, 3), 7, dtype=np.uint8)
    with pytest.raises(ValueError, match="beyond palette"):
        gif_encode(img, pal)


def test_gif_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"NOTAGIF" + b"\x00" * 20)


def test_gif_interlaced_decode():
    # assemble an interlaced GIF by hand: rows stored in pass order
    img = _rng().integers(0, 256, (13, 9)).astype(np.uint8)
    order = np.concatenate([np.arange(s, 13, t)
                            for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))])
    stored = img[order]
    buf = bytearray()
    buf += b"GIF89a"
    buf += struct.pack("<HHBBB", 9, 13, 0x80 | 0x70 | 0x07, 0, 0)
    g = np.arange(256, dtype=np.uint8)
    buf += np.stack([g, g, g], axis=1).tobytes()
    buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, 9, 13, 0x40)  # interlace
    buf.append(8)
    payload = _lzw_encode(stored.ravel(), 8)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        buf.append(len(chunk))
        buf += chunk
    buf += b"\x00\x3b"
    idx, _pal = gif_decode_indexed(bytes(buf))
    assert np.array_equal(idx, img)


# ---------------------------------------------------------------------------
# animation / composition
# ---------------------------------------------------------------------------

def test_gif_anim_roundtrip():
    frames = [_rng().integers(0, 256, (16, 16)).astype(np.uint8)
              for _ in range(5)]
    buf = gif_encode_frames(frames, delay_cs=10)
    out, delays = gif_decode_frames(buf)
    assert len(out) == 5 and delays == [10] * 5
    for f, o in zip(frames, out):
        assert np.array_equal(o[:, :, 0], f)


def test_gif_transparency_and_offset_compose():
    # frame 1: full 4x4 of color 1; frame 2: 2x2 patch at (1,1), one
    # pixel transparent (index 0) -> keeps frame 1 underneath
    pal = np.array([[0, 0, 0], [10, 10, 10], [200, 50, 0]], dtype=np.uint8)
    base = gif_encode(np.ones((4, 4), dtype=np.uint8), pal)
    # splice a second image block with a GCE before the trailer
    body = bytearray(base[:-1])
    patch = np.array([[2, 0], [2, 2]], dtype=np.uint8)
    body += b"\x21\xf9\x04" + struct.pack("<BHB", 0x05, 0, 0) + b"\x00"
    body += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    body.append(2)
    payload = _lzw_encode(patch.ravel(), 2)
    body.append(len(payload))
    body += payload
    body += b"\x00\x3b"
    frames, _ = gif_decode_frames(bytes(body))
    assert len(frames) == 2
    f2 = frames[1]
    assert tuple(f2[1, 1]) == (200, 50, 0)
    assert tuple(f2[1, 2]) == (10, 10, 10)      # transparent: underlying
    assert tuple(f2[2, 1]) == (200, 50, 0)
    assert tuple(f2[2, 2]) == (200, 50, 0)
    assert tuple(f2[0, 0]) == (10, 10, 10)      # outside patch untouched


def test_gif_disposal_background_restore():
    pal = np.array([[5, 5, 5], [10, 10, 10], [200, 50, 0]], dtype=np.uint8)
    base = gif_encode(np.ones((4, 4), dtype=np.uint8), pal)
    body = bytearray(base[:-1])
    # GCE disposal=2 (restore to background) on a full-frame color-2 image
    body += b"\x21\xf9\x04" + struct.pack("<BHB", 0x08, 0, 0) + b"\x00"
    body += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    body.append(2)
    payload = _lzw_encode(np.full(16, 2, np.uint8), 2)
    body.append(len(payload))
    body += payload
    body += b"\x00"
    # third frame: 1x1 patch of color 1 at origin — rest must be the
    # RESTORED background (bg index 0 -> (5,5,5)), not frame 2's color
    body += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
    body.append(2)
    payload = _lzw_encode(np.array([1], np.uint8), 2)
    body.append(len(payload))
    body += payload
    body += b"\x00\x3b"
    frames, _ = gif_decode_frames(bytes(body))
    assert len(frames) == 3
    assert tuple(frames[1][0, 0]) == (200, 50, 0)
    assert tuple(frames[2][0, 0]) == (10, 10, 10)
    assert tuple(frames[2][3, 3]) == (5, 5, 5)


# ---------------------------------------------------------------------------
# pipeline wiring
# ---------------------------------------------------------------------------

def _media_row(payload, w, h, c, f, codec):
    return pa.table({
        "key": pa.array([1], type=pa.int64()),
        "media_type": pa.array(["image"]),
        "payload": pa.array([payload], type=pa.binary()),
        "width": pa.array([w], type=pa.int32()),
        "height": pa.array([h], type=pa.int32()),
        "channels": pa.array([c], type=pa.int32()),
        "sample_rate": pa.array([0], type=pa.int32()),
        "n_frames": pa.array([f], type=pa.int32()),
        "codec": pa.array([codec]),
    })


def test_media_decoder_gif():
    from geoflow.media.stages import MediaDecoder
    img = _rng().integers(0, 256, (6, 9)).astype(np.uint8)
    out = MediaDecoder()(_media_row(gif_encode(img), 9, 6, 3, 1, "gif"))
    px = np.frombuffer(out.column("pixels")[0].as_py(),
                       np.uint8).reshape(6, 9, 3)
    assert np.array_equal(px[:, :, 0], img)


def test_media_decoder_gif_anim():
    from geoflow.media.stages import MediaDecoder
    frames = [_rng().integers(0, 256, (6, 9)).astype(np.uint8)
              for _ in range(3)]
    out = MediaDecoder()(_media_row(gif_encode_frames(frames),
                                    9, 6, 3, 3, "gif_anim"))
    px = np.frombuffer(out.column("pixels")[0].as_py(),
                       np.uint8).reshape(3, 6, 9, 3)
    for f, o in zip(frames, px):
        assert np.array_equal(o[:, :, 0], f)


def test_rast_gif_ops_roundtrip():
    from geoflow.ops.registry import get_op
    from geoflow.raster.rastwkb import PT_8BUI, Raster, from_wkb, to_wkb
    img = _rng().integers(0, 256, (7, 11)).astype(np.uint8)
    r = Raster([img], [PT_8BUI], [None], shape=img.shape)
    col = pa.array([to_wkb(r), None], type=pa.binary())
    gifs = get_op("rast_asgif").fn(col)
    assert gifs[1].as_py() is None
    back = get_op("rast_fromgif").fn(gifs)
    rb = from_wkb(back[0].as_py())
    assert np.array_equal(rb.bands[0], img)
    rgb = get_op("rast_fromgif").fn(gifs, mode="rgb")
    rr = from_wkb(rgb[0].as_py())
    assert len(rr.bands) == 3 and np.array_equal(rr.bands[1], img)
