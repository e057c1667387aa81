"""RIFF/AVI Motion-JPEG codec (geoflow/media/avio.py) + the video
decode → frame-sample pipeline plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.media import (FrameSampler, MediaDecoder, avi_decode_mjpeg,
                           avi_encode_mjpeg)


def _const_frames(k, nf=4, h=16, w=16):
    return np.stack([np.full((h, w), (7 * k + 31 * f) % 251, np.uint8)
                     for f in range(nf)])


def test_roundtrip_constant_frames_bit_exact():
    f = _const_frames(3)
    out, fps = avi_decode_mjpeg(avi_encode_mjpeg(f, fps=12, quality=100))
    assert fps == 12
    assert out.shape == (4, 16, 16, 1)
    assert np.array_equal(out[:, :, :, 0], f)


def test_roundtrip_smooth_frames_low_error():
    base = np.linspace(0, 200, 24 * 32).reshape(24, 32)
    fr = np.stack([(base + 10 * i).clip(0, 255).astype(np.uint8)
                   for i in range(3)])
    fr3 = np.repeat(fr[:, :, :, None], 3, axis=3)
    out, fps = avi_decode_mjpeg(avi_encode_mjpeg(fr3, fps=5, quality=90))
    assert out.shape == fr3.shape and fps == 5
    assert np.abs(out.astype(int) - fr3.astype(int)).mean() < 2.0


def test_container_structure():
    buf = avi_encode_mjpeg(_const_frames(0, nf=2), fps=10)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    # RIFF size field covers everything after the first 8 bytes
    import struct
    assert struct.unpack_from("<I", buf, 4)[0] == len(buf) - 8
    assert b"MJPG" in buf and b"movi" in buf and b"idx1" in buf
    assert buf.count(b"00dc") >= 4  # 2 movi chunks + 2 idx1 entries


def test_decode_rejects_garbage_and_empty():
    with pytest.raises(ValueError):
        avi_decode_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        avi_decode_mjpeg(b"\x89PNG not an avi")


def test_decode_mismatched_frame_shapes_raises():
    from geoflow.raster.jpegio import jpeg_encode
    import struct
    j1 = jpeg_encode(np.zeros((8, 8), np.uint8))
    j2 = jpeg_encode(np.zeros((16, 16), np.uint8))

    def chunk(cc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return cc + struct.pack("<I", len(payload)) + payload + pad
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", j1) + chunk(b"00dc", j2))
    body = b"AVI " + movi
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="disagree"):
        avi_decode_mjpeg(buf)


def test_roundtrip_fuzz_shapes_and_channels():
    # random shapes (incl. non-multiple-of-8 dims), 1 and 3 channels,
    # smooth content: container must round-trip shape/fps exactly and
    # pixels within JPEG tolerance at quality=95
    rng = np.random.default_rng(20260819)
    for trial in range(12):
        nf = int(rng.integers(1, 6))
        h = int(rng.integers(5, 40))
        w = int(rng.integers(5, 40))
        c = int(rng.choice([1, 3]))
        fps = int(rng.integers(1, 61))
        base = rng.integers(0, 200, (h, w), dtype=np.int64)
        # smooth it (JPEG-friendly) with a box blur
        k = np.ones((3, 3)) / 9.0
        sm = base.astype(float)
        for _ in range(2):
            p = np.pad(sm, 1, mode="edge")
            sm = sum(p[i:i + h, j:j + w] * k[i, j]
                     for i in range(3) for j in range(3))
        fr = np.stack([(sm + 5 * f).clip(0, 255).astype(np.uint8)
                       for f in range(nf)])
        if c == 3:
            fr = np.repeat(fr[:, :, :, None], 3, axis=3)
        out, got_fps = avi_decode_mjpeg(avi_encode_mjpeg(fr, fps=fps,
                                                         quality=95))
        want = fr if fr.ndim == 4 else fr[:, :, :, None]
        assert out.shape == want.shape, (trial, out.shape, want.shape)
        assert got_fps == fps, trial
        err = np.abs(out.astype(int) - want.astype(int)).mean()
        assert err < 4.0, (trial, err)


def test_motion_features_closed_form_and_brute():
    from geoflow.media import MotionFeatures
    h, w = 6, 7
    rng = np.random.default_rng(11)
    rows = []
    for k, nf in [(3, 4), (9, 1), (12, 3)]:
        fr = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
        rows.append((k, nf, fr))
    batch = pa.table({
        "key": pa.array([r[0] for r in rows], type=pa.int64()),
        "pixels": pa.array([r[2].tobytes() for r in rows],
                           type=pa.binary()),
        "width": pa.array(np.full(3, w, np.int32)),
        "height": pa.array(np.full(3, h, np.int32)),
        "channels": pa.array(np.full(3, 1, np.int32)),
        "n_frames": pa.array(np.array([r[1] for r in rows], np.int32))})
    out = {r["key"]: r for r in
           MotionFeatures(cut_threshold=30)(batch).to_pylist()}
    for k, nf, fr in rows:
        px = fr.reshape(nf, -1).astype(np.int64)
        if nf < 2:
            assert out[k] == {"key": k, "motion_energy": 0,
                              "n_cuts": 0, "peak_diff": 0}
            continue
        d = np.abs(np.diff(px, axis=0)).sum(axis=1)
        assert out[k]["motion_energy"] == d.sum()
        assert out[k]["peak_diff"] == d.max()
        assert out[k]["n_cuts"] == int((d // (h * w) >= 30).sum())


def test_media_decoder_video_path_and_frame_sampler():
    keys = np.array([5, 9], dtype=np.int64)
    nf, h, w = 4, 16, 16
    payloads = [avi_encode_mjpeg(_const_frames(int(k), nf, h, w),
                                 fps=10, quality=100) for k in keys]
    batch = pa.table({
        "key": pa.array(keys),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(np.full(2, w, np.int32)),
        "height": pa.array(np.full(2, h, np.int32)),
        "channels": pa.array(np.full(2, 1, np.int32)),
        "n_frames": pa.array(np.full(2, nf, np.int32)),
        "codec": pa.array(["mjpeg_avi"] * 2)})
    dec = MediaDecoder()(batch)
    assert len(dec.column("pixels")[0].as_py()) == nf * h * w
    sampled = FrameSampler(stride=2)(dec)
    assert sampled.num_rows == 4  # frames 0,2 per key
    for row in sampled.to_pylist():
        g = (7 * row["key"] + 31 * row["frame_idx"]) % 251
        px = np.frombuffer(row["pixels"], np.uint8)
        assert px.shape == (h * w,) and (px == g).all(), row
