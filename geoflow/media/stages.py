"""Actor-pool media stages (see package docstring for the design).

Schema convention:
  input   (key:int64, media_type:string, payload:binary,
           width:int32, height:int32, channels:int32,
           sample_rate:int32, n_frames:int32, codec:string)
  decoded adds pixels:binary (row-major uint8, h*w*c) — still opaque
          bytes so downstream stages stay zero-copy-friendly
  stats   adds per-image aggregate columns
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def make_media_batch(keys: np.ndarray, width=16, height=12, channels=1,
                     media_type="image", codec="fake8",
                     sample_rate=8000, n_frames=1) -> pa.Table:
    """Deterministic synthetic media rows: payload byte i of row k is
    (k*7 + i) % 251 — reproducible from the key alone, so an external
    (SQL) oracle can recompute any derived statistic."""
    keys = np.asarray(keys, dtype=np.int64)
    n = len(keys)
    size = width * height * channels * n_frames
    idx = np.arange(size, dtype=np.int64)
    payload_mat = ((keys[:, None] * 7 + idx[None, :]) % 251).astype(np.uint8)
    payloads = [payload_mat[i].tobytes() for i in range(n)]
    return pa.table({
        "key": pa.array(keys),
        "media_type": pa.array([media_type] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(np.full(n, width, dtype=np.int32)),
        "height": pa.array(np.full(n, height, dtype=np.int32)),
        "channels": pa.array(np.full(n, channels, dtype=np.int32)),
        "sample_rate": pa.array(np.full(n, sample_rate, dtype=np.int32)),
        "n_frames": pa.array(np.full(n, n_frames, dtype=np.int32)),
        "codec": pa.array([codec] * n, type=pa.string()),
    })


class MediaDecoder:
    """payload → pixels (row-major uint8 bytes). Actor-pool stage:
    codec dispatch table built once per actor.

    codecs:
      fake8      payload bytes ARE the pixels (deterministic test codec)
      png        real pure-stdlib decoder (raster/imageio.py — zlib +
                 the W3C filter spec); 8-bit only here (the pixels
                 column contract is uint8)
      jpeg       real pure-numpy baseline decoder (raster/jpegio.py —
                 T.81 baseline sequential, Huffman, 1/3 components,
                 sampling factors 1-2; progressive rejected by name)
      mjpeg_avi  real video decode: RIFF/AVI container walk
                 (media/avio.py) + per-frame baseline JPEG; pixels =
                 n_frames consecutive h*w*c frames.
      gif        real pure-stdlib GIF87a/89a decoder
                 (raster/gifio.py — LZW variable codes); first frame,
                 composed to RGB (c must be 3)
      gif_anim   all frames of an animated GIF (disposal/transparency
                 composed); pixels = n_frames consecutive h*w*3 frames."""

    def __init__(self):
        self._codecs = {"fake8": self._decode_fake8,
                        "png": self._decode_png,
                        "jpeg": self._decode_jpeg,
                        "mjpeg_avi": self._decode_mjpeg_avi,
                        "gif": self._decode_gif,
                        "gif_anim": self._decode_gif_anim}

    @staticmethod
    def _decode_fake8(buf: bytes, w: int, h: int, c: int, f: int) -> bytes:
        need = w * h * c * f
        if len(buf) < need:
            buf = buf + b"\x00" * (need - len(buf))
        return buf[:need]

    @staticmethod
    def _decode_png(buf, w, h, c, f):
        from ..raster.imageio import png_decode
        px = png_decode(bytes(buf))
        if px.dtype != np.uint8:
            raise ValueError("png decode: 16-bit image in an 8-bit "
                             "pixels pipeline (use raster ops instead)")
        if px.shape != (h, w, c):
            raise ValueError(f"png decode: metadata says {(h, w, c)}, "
                             f"image is {px.shape}")
        return px.tobytes()

    @staticmethod
    def _decode_jpeg(buf, w, h, c, f):
        from ..raster.jpegio import jpeg_decode
        px = jpeg_decode(bytes(buf))
        if px.ndim == 2:
            px = px[:, :, None]
        if px.shape != (h, w, c):
            raise ValueError(f"jpeg decode: metadata says {(h, w, c)}, "
                             f"image is {px.shape}")
        return px.tobytes()

    @staticmethod
    def _decode_mjpeg_avi(buf, w, h, c, f):
        from .avio import avi_decode_mjpeg
        px, _fps = avi_decode_mjpeg(bytes(buf))
        if px.shape != (f, h, w, c):
            raise ValueError(f"avi decode: metadata says {(f, h, w, c)}, "
                             f"stream is {px.shape}")
        return px.tobytes()

    @staticmethod
    def _decode_gif(buf, w, h, c, f):
        from ..raster.gifio import gif_decode
        px = gif_decode(bytes(buf))
        if px.shape != (h, w, c):
            raise ValueError(f"gif decode: metadata says {(h, w, c)}, "
                             f"image is {px.shape}")
        return px.tobytes()

    @staticmethod
    def _decode_gif_anim(buf, w, h, c, f):
        from ..raster.gifio import gif_decode_frames
        frames, _delays = gif_decode_frames(bytes(buf))
        px = np.stack(frames)
        if px.shape != (f, h, w, c):
            raise ValueError(f"gif decode: metadata says {(f, h, w, c)}, "
                             f"stream is {px.shape}")
        return px.tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("payload").to_pylist()
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        c = batch.column("channels").to_numpy(zero_copy_only=False)
        f = batch.column("n_frames").to_numpy(zero_copy_only=False)
        codecs = batch.column("codec").to_pylist()
        out = []
        for i, buf in enumerate(bufs):
            fn = self._codecs.get(codecs[i])
            if fn is None:
                raise NotImplementedError(
                    f"codec {codecs[i]!r} needs an image library not in "
                    f"this container (available: {sorted(self._codecs)})")
            out.append(fn(buf, int(w[i]), int(h[i]), int(c[i]), int(f[i])))
        return batch.append_column("pixels", pa.array(out, type=pa.binary()))


class MediaResize:
    """Nearest-neighbor resize of decoded frames to (out_w, out_h) —
    real vectorized kernel (index gather per batch)."""

    def __init__(self, out_w: int, out_h: int):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("pixels").to_pylist()
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        c = batch.column("channels").to_numpy(zero_copy_only=False)
        ow, oh = self.out_w, self.out_h
        out = []
        for i, buf in enumerate(bufs):
            wi, hi, ci = int(w[i]), int(h[i]), int(c[i])
            px = np.frombuffer(buf, dtype=np.uint8)[:wi * hi * ci] \
                .reshape(hi, wi, ci)
            ri = (np.arange(oh, dtype=np.int64) * hi) // oh
            cj = (np.arange(ow, dtype=np.int64) * wi) // ow
            out.append(px[np.ix_(ri, cj)].tobytes())
        t = batch.drop_columns(["pixels"])
        t = t.append_column("pixels", pa.array(out, type=pa.binary()))
        t = t.set_column(t.schema.get_field_index("width"), "width",
                         pa.array(np.full(len(out), ow, dtype=np.int32)))
        t = t.set_column(t.schema.get_field_index("height"), "height",
                         pa.array(np.full(len(out), oh, dtype=np.int32)))
        return t


class ImageStats:
    """Per-image pixel aggregates (integer-exact: px_sum/min/max as
    int64 — hashable across engines)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("pixels").to_pylist()
        sums = np.zeros(len(bufs), dtype=np.int64)
        mins = np.zeros(len(bufs), dtype=np.int64)
        maxs = np.zeros(len(bufs), dtype=np.int64)
        for i, buf in enumerate(bufs):
            px = np.frombuffer(buf, dtype=np.uint8)
            sums[i] = int(px.sum(dtype=np.int64))
            mins[i] = int(px.min()) if len(px) else 0
            maxs[i] = int(px.max()) if len(px) else 0
        return pa.table({
            "key": batch.column("key"),
            "px_sum": pa.array(sums),
            "px_min": pa.array(mins),
            "px_max": pa.array(maxs)})


class FrameSampler:
    """Keep every `stride`-th frame of a multi-frame (video) payload —
    emits one row per sampled frame with frame_idx."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("pixels").to_pylist()
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        c = batch.column("channels").to_numpy(zero_copy_only=False)
        f = batch.column("n_frames").to_numpy(zero_copy_only=False)
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        ok, ofr, opx = [], [], []
        for i, buf in enumerate(bufs):
            fsz = int(w[i]) * int(h[i]) * int(c[i])
            for fi in range(0, int(f[i]), self.stride):
                ok.append(int(keys[i]))
                ofr.append(fi)
                opx.append(buf[fi * fsz:(fi + 1) * fsz])
        return pa.table({
            "key": pa.array(ok, type=pa.int64()),
            "frame_idx": pa.array(ofr, type=pa.int32()),
            "pixels": pa.array(opx, type=pa.binary())})


class MotionFeatures:
    """Temporal features over a decoded multi-frame (video) payload —
    the standard video-curation signals (PySceneDetect-style
    mean-abs-diff content metric, integer-exact):

      motion_energy   Σ over frame transitions of Σ|frame[f+1]-frame[f]|
                      (int64 — order-free, hashable across engines)
      n_cuts          transitions whose MEAN abs diff (per pixel,
                      integer-floored) >= cut_threshold
      peak_diff       max per-transition Σ|Δ| (0 for single-frame)

    Input: rows with pixels (n_frames·h·w·c uint8 bytes) + the metadata
    columns. One vectorized pass per row (frames stacked, one abs-diff
    over the whole stack); no Python per pixel or per frame."""

    def __init__(self, cut_threshold: int = 30):
        self.cut_threshold = int(cut_threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("pixels").to_pylist()
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        c = batch.column("channels").to_numpy(zero_copy_only=False)
        f = batch.column("n_frames").to_numpy(zero_copy_only=False)
        energy = np.zeros(len(bufs), dtype=np.int64)
        cuts = np.zeros(len(bufs), dtype=np.int64)
        peak = np.zeros(len(bufs), dtype=np.int64)
        for i, buf in enumerate(bufs):
            nf, fsz = int(f[i]), int(w[i]) * int(h[i]) * int(c[i])
            if nf < 2:
                continue
            px = np.frombuffer(buf, dtype=np.uint8)[:nf * fsz] \
                .reshape(nf, fsz).astype(np.int64)
            d = np.abs(np.diff(px, axis=0)).sum(axis=1)
            energy[i] = int(d.sum())
            peak[i] = int(d.max())
            cuts[i] = int(np.count_nonzero(d // fsz >= self.cut_threshold))
        return pa.table({
            "key": batch.column("key"),
            "motion_energy": pa.array(energy),
            "n_cuts": pa.array(cuts),
            "peak_diff": pa.array(peak)})


class AudioFeatures:
    """PCM → integer-exact features: rms_milli (int64, floor of
    RMS*1000) + zero crossings, over interleaved signed samples.

    codec column dispatch (built once per actor):
      fake8 / absent  payload bytes are uint8 PCM centered at 128
      wav             real RIFF/WAVE PCM decode (media/wavio.py;
                      8/16/24/32-bit, any channel count)"""

    def __init__(self):
        from .wavio import wav_decode
        self._wav_decode = wav_decode

    def _samples(self, buf: bytes, codec) -> np.ndarray:
        if codec == "wav":
            frames, _rate = self._wav_decode(bytes(buf))
            return frames.reshape(-1).astype(np.int64)
        return np.frombuffer(buf, dtype=np.uint8).astype(np.int64) - 128

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("payload").to_pylist()
        codecs = (batch.column("codec").to_pylist()
                  if "codec" in batch.schema.names else [None] * len(bufs))
        rms = np.zeros(len(bufs), dtype=np.int64)
        zc = np.zeros(len(bufs), dtype=np.int64)
        for i, buf in enumerate(bufs):
            s = self._samples(buf, codecs[i])
            if len(s) == 0:
                continue
            rms[i] = int(np.floor(np.sqrt((s * s).mean()) * 1000.0))
            sgn = np.sign(s)
            nz = sgn != 0
            sg = sgn[nz]
            zc[i] = int((sg[1:] != sg[:-1]).sum()) if len(sg) > 1 else 0
        return pa.table({
            "key": batch.column("key"),
            "rms_milli": pa.array(rms),
            "zero_crossings": pa.array(zc)})


class PerceptualHash:
    """dHash + aHash perceptual image fingerprints over decoded pixel
    batches (near-duplicate image detection; public spec: the
    difference-hash / average-hash family popularized by pHash /
    Krawetz).

    Exactness design: the classic algorithm resizes to a tiny grid
    and compares CELL MEANS. Means are computed as integer cell SUMS
    compared by CROSS-MULTIPLICATION (sum_a * n_b > sum_b * n_a), so
    no float division ever happens and the bits are exact for ANY
    image dimensions — reproducible in SQL for planted images
    (`image_phash` driver gate). Channels are summed (a shared factor
    c on both sides of every comparison — order-preserving), so RGB
    needs no grayscale rounding either. Bound: sum * n_cell must fit
    int64 — images to ~50 MP at c=3 (documented, asserted).

    Grid: ``grid_w`` x ``grid_h`` cells (default 9x8). dhash bit
    (y, x) = cell(y,x) > cell(y,x+1), packed at position
    y*(grid_w-1)+x — 64 bits at the default. ahash uses the left
    (grid_w-1) x grid_h cells vs the global mean, same packing.
    Both emitted as int64 (two's complement of the u64 bit pattern).
    """

    def __init__(self, grid_w: int = 9, grid_h: int = 8):
        self.gw = grid_w
        self.gh = grid_h

    def _cells(self, px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(cell sums, cell pixel counts) over the channel-summed
        image via an integral image — exact int64."""
        gray = px.sum(axis=2, dtype=np.int64)
        h, w = gray.shape
        ii = np.zeros((h + 1, w + 1), dtype=np.int64)
        np.cumsum(np.cumsum(gray, axis=0), axis=1, out=ii[1:, 1:])
        yb = (np.arange(self.gh + 1, dtype=np.int64) * h) // self.gh
        xb = (np.arange(self.gw + 1, dtype=np.int64) * w) // self.gw
        s = (ii[yb[1:], :][:, xb[1:]] - ii[yb[:-1], :][:, xb[1:]]
             - ii[yb[1:], :][:, xb[:-1]] + ii[yb[:-1], :][:, xb[:-1]])
        n = ((yb[1:] - yb[:-1])[:, None] * (xb[1:] - xb[:-1])[None, :])
        if int(s.max(initial=0)) * int(n.max(initial=1)) >= 2**62:
            raise ValueError("image too large for exact int64 "
                             "cross-multiplied cell means (~50 MP cap)")
        return s, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("pixels").to_pylist()
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        c = batch.column("channels").to_numpy(zero_copy_only=False)
        dh = np.zeros(len(bufs), dtype=np.uint64)
        ah = np.zeros(len(bufs), dtype=np.uint64)
        pos = np.uint64(1) << np.arange(
            (self.gw - 1) * self.gh, dtype=np.uint64)
        for i, buf in enumerate(bufs):
            wi, hi, ci = int(w[i]), int(h[i]), int(c[i])
            if wi < self.gw or hi < self.gh:
                continue  # smaller than the grid: hash stays 0
            px = np.frombuffer(buf, dtype=np.uint8)[:wi * hi * ci] \
                .reshape(hi, wi, ci)
            s, n = self._cells(px)
            dbits = (s[:, :-1] * n[:, 1:]) > (s[:, 1:] * n[:, :-1])
            dh[i] = (pos * dbits.ravel().astype(np.uint64)).sum()
            tot = int(s.sum())
            npx = int(n.sum())
            abits = (s[:, :-1] * npx) > (tot * n[:, :-1])
            ah[i] = (pos * abits.ravel().astype(np.uint64)).sum()
        return pa.table({
            "key": batch.column("key"),
            "dhash": pa.array(dh.view(np.int64)),
            "ahash": pa.array(ah.view(np.int64))})


class AudioFingerprint:
    """Energy-envelope audio fingerprint: frame the PCM stream, take
    each frame's integer energy (Σ x², exact int64), and emit one bit
    per frame transition — bit_j = energy(j+1) > energy(j) — packed
    into an int64 (up to 63 transitions; longer streams fold with XOR
    per 63-bit page). The sign-of-energy-delta envelope is the
    robust core of the published audio-fingerprint family (Haitsma &
    Kalker 2002 use per-band deltas; band filtering needs an FFT
    library this container doesn't ship, so the envelope variant is
    the honest pure-integer implementation — exact, SQL-reproducible,
    and driver-gated by `audio_fingerprint` through the REAL WAV
    codec).

    Same codec dispatch as AudioFeatures (wav / fake8 bytes)."""

    def __init__(self, frame: int = 256):
        from .wavio import wav_decode
        self._wav_decode = wav_decode
        self.frame = frame

    def _samples(self, buf: bytes, codec) -> np.ndarray:
        if codec == "wav":
            frames, _rate = self._wav_decode(bytes(buf))
            return frames.reshape(-1).astype(np.int64)
        return np.frombuffer(buf, dtype=np.uint8).astype(np.int64) - 128

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("payload").to_pylist()
        codecs = (batch.column("codec").to_pylist()
                  if "codec" in batch.schema.names
                  else [None] * len(bufs))
        fp = np.zeros(len(bufs), dtype=np.uint64)
        nf = np.zeros(len(bufs), dtype=np.int64)
        for i, buf in enumerate(bufs):
            s = self._samples(buf, codecs[i])
            n = (len(s) // self.frame) * self.frame
            if n < 2 * self.frame:
                continue
            e = (s[:n].reshape(-1, self.frame) ** 2).sum(axis=1)
            bits = (e[1:] > e[:-1])
            nf[i] = len(e)
            acc = np.uint64(0)
            for page in range(0, len(bits), 63):
                chunk = bits[page: page + 63]
                word = (chunk.astype(np.uint64)
                        << np.arange(len(chunk), dtype=np.uint64)).sum()
                acc ^= word
            fp[i] = acc
        return pa.table({
            "key": batch.column("key"),
            "n_frames_fp": pa.array(nf),
            "afp": pa.array(fp.view(np.int64))})
