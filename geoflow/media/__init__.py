"""Multimodal (image/audio/video) columns for the training-data
pipeline: opaque `binary` payloads + typed metadata, processed by
actor-pool map_batches stages.

Design (the part that matters at 100 TB):
- media rows are (key, media_type, payload: binary, meta struct) — the
  payload NEVER converts to Python objects outside the decode stage and
  flows zero-copy through the object store;
- decode / resize / feature stages are callable CLASSES for
  `map_batches(Cls, concurrency=N, batch_size=B)` — codec/model state
  loads once per actor in __init__, per-batch work in __call__;
- batches stay small for large payloads (batch_size is the caller's
  memory knob: batch_size × payload_size × concurrency must fit the
  worker heap).

Codecs: "png" decodes for real (pure-stdlib codec in
geoflow/raster/imageio.py — zlib + the W3C filter spec; TIFF/BIL live
there too as raster ops), "jpeg" decodes for real (pure-numpy baseline
T.81 codec in geoflow/raster/jpegio.py — Huffman + vectorized DCT)
and "wav" PCM audio decodes/encodes for real (media/wavio.py — RIFF
chunk walk, 8/16/24/32-bit). VIDEO decodes for real via "mjpeg_avi"
(media/avio.py — RIFF/AVI container walk + per-frame baseline JPEG;
the one mainstream video format with no inter-frame entropy coding).
Inter-frame-coded formats (mp3/aac/h264/vp9) need codec libraries
this container doesn't ship, so they raise NotImplementedError with
the library name;
the "fake8" codec is a deterministic byte-stream decoder (payload
bytes = row-major uint8 pixels, shaped by meta) that keeps every
downstream kernel — resize, stats, frame sampling, audio features —
real, vectorized and testable.
"""

from .avio import avi_decode_mjpeg, avi_encode_mjpeg
from .stages import (AudioFeatures, AudioFingerprint, FrameSampler, ImageStats, MediaDecoder,
                     MotionFeatures, PerceptualHash,
                     MediaResize, make_media_batch)
from .wavio import wav_decode, wav_encode

__all__ = ["MediaDecoder", "MediaResize", "ImageStats", "FrameSampler",
           "AudioFingerprint",
           "PerceptualHash",
           "MotionFeatures",
           "AudioFeatures", "make_media_batch", "wav_decode", "wav_encode",
           "avi_encode_mjpeg", "avi_decode_mjpeg"]
