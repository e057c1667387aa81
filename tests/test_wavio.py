"""RIFF/WAVE PCM codec (geoflow/media/wavio) + the codec-aware
AudioFeatures path."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from geoflow.media import AudioFeatures, wav_decode, wav_encode


def _sig(n=480, channels=1, amp=12000, seed=7):
    rng = np.random.RandomState(seed)
    t = np.arange(n)[:, None]
    base = (amp * np.sin(2 * np.pi * 440.0 * t / 8000.0)).astype(np.int64)
    return (base + rng.randint(-50, 50, size=(n, channels))).astype(np.int64)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip(bits, channels):
    amp = min(12000, (1 << (bits - 1)) - 200)
    s = _sig(200, channels, amp)
    buf = wav_encode(s, 8000, bits=bits)
    out, rate = wav_decode(buf)
    assert rate == 8000
    assert out.shape == (200, channels)
    np.testing.assert_array_equal(out, s)


def test_header_golden():
    """Canonical 44-byte PCM header: spot-check every field for a
    known mono 16-bit stream (spec worked example layout)."""
    s = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int64)
    buf = wav_encode(s, 44100, bits=16)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    assert buf[12:16] == b"fmt "
    fmt = struct.unpack_from("<IHHIIHH", buf, 16)
    assert fmt == (16, 1, 1, 44100, 44100 * 2, 2, 16)
    assert buf[36:40] == b"data"
    (dlen,) = struct.unpack_from("<I", buf, 40)
    assert dlen == 10
    assert np.frombuffer(buf[44:54], dtype="<i2").tolist() == \
        [0, 1000, -1000, 32767, -32768]


def test_odd_data_chunk_padding_and_unknown_chunks():
    """Word-aligned chunk walk: an odd-length data chunk is padded, and
    unknown chunks (LIST metadata) are skipped, not errors."""
    s = np.array([5, -3, 7], dtype=np.int64)
    body = wav_encode(s, 8000, bits=8)
    assert len(body) % 2 == 0  # 3 bytes of data + 1 pad
    # splice a LIST chunk between fmt and data
    fmt_part = body[12:36]
    rest = body[36:]
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = b"RIFF" + struct.pack("<I", 4 + len(fmt_part) + len(lst)
                                    + len(rest)) + b"WAVE" \
        + fmt_part + lst + rest
    out, rate = wav_decode(spliced)
    np.testing.assert_array_equal(out.reshape(-1), s)


def test_8bit_recentering():
    s = np.array([-128, -1, 0, 1, 127], dtype=np.int64)
    buf = wav_encode(s, 8000, bits=8)
    # stored unsigned
    assert list(buf[44:49]) == [0, 127, 128, 129, 255]
    out, _ = wav_decode(buf)
    np.testing.assert_array_equal(out.reshape(-1), s)


def test_extensible_and_compressed():
    s = np.array([1, 2, 3], dtype=np.int64)
    buf = bytearray(wav_encode(s, 8000, bits=16))
    struct.pack_into("<H", buf, 20, 0xFFFE)  # WAVE_FORMAT_EXTENSIBLE
    out, _ = wav_decode(bytes(buf))
    np.testing.assert_array_equal(out.reshape(-1), s)
    struct.pack_into("<H", buf, 20, 85)      # MP3-in-WAV
    with pytest.raises(NotImplementedError):
        wav_decode(bytes(buf))


def test_out_of_range_rejected():
    with pytest.raises(ValueError):
        wav_encode(np.array([300]), 8000, bits=8)
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxJUNK")


def test_audio_features_wav_codec():
    s = _sig(300, 1, 9000)
    buf = wav_encode(s, 8000, bits=16)
    t = pa.table({
        "key": pa.array([1], type=pa.int64()),
        "payload": pa.array([buf], type=pa.binary()),
        "codec": pa.array(["wav"], type=pa.string()),
    })
    f = AudioFeatures()(t)
    flat = s.reshape(-1)
    assert f.column("rms_milli")[0].as_py() == int(
        np.floor(np.sqrt((flat.astype(np.int64) ** 2).mean()) * 1000))
    sgn = np.sign(flat)
    sg = sgn[sgn != 0]
    assert f.column("zero_crossings")[0].as_py() == int(
        (sg[1:] != sg[:-1]).sum())
