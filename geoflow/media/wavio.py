"""Pure-stdlib RIFF/WAVE PCM codec.

Closes the "audio decode is stubbed" gap honestly: WAV PCM carries no
entropy coding, so a complete decoder/encoder is byte-layout work only
(RIFF chunk walk + fixed-point sample views). Lossy audio (mp3/aac/ogg)
stays behind the import-try NotImplementedError — those genuinely need
codec libraries this container doesn't ship.

Format reference: Microsoft/IBM RIFF WAVE spec (public, 1991) — the
canonical 44-byte PCM layout plus the chunk-walk rules (chunks are
word-aligned; unknown chunks are skipped, not errors).

Supported: audio format 1 (integer PCM) at 8 (unsigned), 16, 24, 32
(signed little-endian) bits, any channel count / sample rate, and
format 65534 (WAVE_FORMAT_EXTENSIBLE) wrapping PCM.

Decode returns int32 samples shaped (n_frames, channels) — 8-bit input
is re-centered to signed (x-128) so every width feeds the same signed
feature kernels downstream.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["wav_decode", "wav_encode"]


def _walk_chunks(buf: bytes):
    """Yield (fourcc, payload_offset, payload_size) for each RIFF chunk."""
    pos = 12
    n = len(buf)
    while pos + 8 <= n:
        cc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield cc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def wav_decode(buf: bytes):
    """WAV bytes -> (samples int32 [n_frames, channels], sample_rate).

    8-bit samples are re-centered to signed (-128..127); 16/24/32-bit
    are sign-extended verbatim. Raises ValueError on non-PCM formats
    (compressed WAV needs a codec library)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    data = None
    for cc, off, size in _walk_chunks(buf):
        if cc == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", buf, off)
        elif cc == b"data" and data is None:
            data = buf[off:off + size]
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _brate, _balign, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: subformat GUID
        audio_format = 1        # leads with the format code; PCM GUID is
        # 00000001-0000-0010-8000-00aa00389b71 — we accept it as PCM and
        # let the bit-width switch below reject anything exotic.
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} is compressed; only "
            f"integer PCM decodes without a codec library")
    if channels < 1:
        raise ValueError("channels < 1")
    if bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        s = np.frombuffer(data[:len(data) // 2 * 2],
                          dtype="<i2").astype(np.int32)
    elif bits == 24:
        raw = np.frombuffer(data[:len(data) // 3 * 3], dtype=np.uint8)
        raw = raw.reshape(-1, 3).astype(np.int32)
        s = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        s -= (s & 0x800000) << 1  # sign-extend bit 23
    elif bits == 32:
        s = np.frombuffer(data[:len(data) // 4 * 4], dtype="<i4") \
            .astype(np.int32)
    else:
        raise ValueError(f"unsupported PCM bit width {bits}")
    nfr = len(s) // channels
    return s[:nfr * channels].reshape(nfr, channels), int(rate)


def wav_encode(samples, sample_rate: int, bits: int = 16) -> bytes:
    """int samples [n_frames, channels] (or 1-D mono) -> WAV bytes.

    Values must already fit the target width; 8-bit output re-centers
    signed input to the format's unsigned convention (x+128)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be 1-D or (n_frames, channels)")
    nfr, channels = s.shape
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    si = s.astype(np.int64)
    if si.size and (si.min() < lo or si.max() > hi):
        raise ValueError(f"sample out of range for {bits}-bit PCM")
    if bits == 8:
        data = (si + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = si.astype("<i2").tobytes()
    elif bits == 24:
        u = (si & 0xFFFFFF).astype(np.uint32)
        b = np.empty((u.size, 3), dtype=np.uint8)
        f = u.reshape(-1)
        b[:, 0] = f & 0xFF
        b[:, 1] = (f >> 8) & 0xFF
        b[:, 2] = (f >> 16) & 0xFF
        data = b.tobytes()
    elif bits == 32:
        data = si.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported PCM bit width {bits}")
    balign = channels * (bits // 8)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, channels, int(sample_rate),
        int(sample_rate) * balign, balign, bits,
        b"data", len(data))
    pad = b"\x00" if len(data) & 1 else b""
    return hdr + data + pad
