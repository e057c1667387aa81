"""Minimal AVI (RIFF) container codec for Motion-JPEG video — pure
stdlib + the in-repo baseline JPEG codec (raster/jpegio.py).

MJPEG-in-AVI is the one mainstream video format decodable without an
entropy-codec library: the container is a RIFF chunk tree (same
chunk-walk discipline as media/wavio.py) and every frame is an
independent baseline JPEG. That makes the engine's video path REAL
end-to-end — container parse → per-frame JPEG decode → frame sampling
— while inter-frame-coded formats (h264/vp9/av1) stay honestly out of
scope (their bitstreams need codec libraries this container lacks).

Layout written by avi_encode_mjpeg (and accepted, along with common
tolerant variants, by avi_decode_mjpeg):

  RIFF 'AVI '
    LIST 'hdrl'
      'avih'  MainAVIHeader (56 bytes)
      LIST 'strl'
        'strh' AVIStreamHeader, fccType 'vids', handler 'MJPG'
        'strf' BITMAPINFOHEADER, biCompression 'MJPG'
    LIST 'movi'
      '00dc' <baseline JPEG>   (chunks padded to even length)
      ...
    'idx1'  AVIOLDINDEX (one keyframe entry per frame)

Reference surface: the jena-geo reference has no video datatype at
all; this module exists for the training-data multimodal pipeline
(frame extraction / sampling over opaque binary columns).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["avi_encode_mjpeg", "avi_decode_mjpeg"]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def avi_encode_mjpeg(frames, fps: int = 10, quality: int = 100) -> bytes:
    """uint8 frame stack (F,H,W) or (F,H,W,C in {1,3}) → AVI bytes.

    quality=100 keeps constant-valued 8×8 blocks bit-exact through the
    JPEG round trip (all-ones quant table, DC-only blocks) — the
    property the oracle-gated video query relies on."""
    from ..raster.jpegio import jpeg_encode

    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[:, :, :, None]
    if frames.ndim != 4 or frames.dtype != np.uint8 \
            or frames.shape[3] not in (1, 3):
        raise ValueError("frames must be uint8 (F,H,W) or (F,H,W,{1,3})")
    nf, h, w, c = frames.shape

    jpegs = [jpeg_encode(frames[i, :, :, 0] if c == 1 else frames[i],
                         quality=quality) for i in range(nf)]
    max_sz = max((len(j) for j in jpegs), default=0)

    # MainAVIHeader: usec/frame, maxbytes/sec, padding, flags
    # (HASINDEX=0x10), frames, initial, streams, bufsize, w, h, rsvd[4]
    avih = _chunk(b"avih", struct.pack(
        "<14I", 1_000_000 // max(1, fps), max_sz * fps, 0, 0x10,
        nf, 0, 1, max_sz, w, h, 0, 0, 0, 0))
    strh = _chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIii4H", b"vids", b"MJPG", 0, 0, 0, 0,
        1, max(1, fps), 0, nf, max_sz, -1, 0, 0, 0, w, h))
    strf = _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8 * c, b"MJPG",
        w * h * c, 0, 0, 0, 0))
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_payload = b"movi"
    index = b""
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        index += struct.pack("<4sIII", b"00dc", 0x10,
                             len(movi_payload), len(j))
        movi_payload += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(b"idx1", index)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def avi_decode_mjpeg(buf: bytes):
    """AVI bytes → (frames uint8 (F,H,W,C), fps). Tolerant chunk walk:
    frames come from '00dc'/'00db' chunks in movi order (idx1 not
    required); fps from strh dwRate/dwScale, falling back to avih."""
    from ..raster.jpegio import jpeg_decode

    buf = bytes(buf)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    end = min(len(buf), 8 + riff_size)

    fps = None
    usec_per_frame = None
    jpegs = []

    def scan(start, stop):
        nonlocal fps, usec_per_frame
        for fourcc, ps, ln in _walk(buf, start, stop):
            pe = min(ps + ln, stop)
            if fourcc == b"LIST":
                scan(ps + 4, pe)  # skip the list-type fourcc
            elif fourcc == b"avih" and ln >= 4:
                (us,) = struct.unpack_from("<I", buf, ps)
                usec_per_frame = us
            elif fourcc == b"strh" and ln >= 32 \
                    and buf[ps:ps + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", buf, ps + 20)
                if scale > 0 and rate > 0:
                    fps = rate // scale
            elif fourcc[2:4] in (b"dc", b"db") and ln > 0:
                jpegs.append(buf[ps:pe])

    scan(12, end)
    if not jpegs:
        raise ValueError("AVI stream contains no video frame chunks")
    if fps is None:
        fps = (1_000_000 // usec_per_frame
               if usec_per_frame else 0) or 1

    arrs = []
    for j in jpegs:
        a = jpeg_decode(j)
        if a.ndim == 2:
            a = a[:, :, None]
        arrs.append(a)
    shapes = {a.shape for a in arrs}
    if len(shapes) != 1:
        raise ValueError(f"frames disagree on shape: {sorted(shapes)}")
    return np.stack(arrs), int(fps)
