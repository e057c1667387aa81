"""Multimodal stages: opaque binary payloads + typed metadata through
actor-pool decode / resize / stats / frame-sample / audio-feature
stages (geoflow/media)."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.media import (AudioFeatures, FrameSampler, ImageStats,
                           MediaDecoder, MediaResize, make_media_batch)


def test_make_media_deterministic():
    a = make_media_batch(np.array([3, 5]))
    b = make_media_batch(np.array([3, 5]))
    assert a.equals(b)
    buf = a.column("payload")[0].as_py()
    px = np.frombuffer(buf, dtype=np.uint8)
    assert px[0] == (3 * 7) % 251 and px[10] == (3 * 7 + 10) % 251


def test_decode_resize_stats_chain():
    t = make_media_batch(np.array([0, 1, 42]), width=16, height=12)
    dec = MediaDecoder()(t)
    assert "pixels" in dec.schema.names
    rs = MediaResize(8, 8)(dec)
    assert rs.column("width")[0].as_py() == 8
    st = ImageStats()(rs)
    # numpy oracle for key 42
    idx = np.arange(16 * 12, dtype=np.int64)
    full = ((42 * 7 + idx) % 251).astype(np.uint8).reshape(12, 16)
    ri = (np.arange(8) * 12) // 8
    cj = (np.arange(8) * 16) // 8
    small = full[np.ix_(ri, cj)]
    row = {c: st.column(c)[2].as_py() for c in st.schema.names}
    assert row["px_sum"] == int(small.sum())
    assert row["px_min"] == int(small.min())
    assert row["px_max"] == int(small.max())


def test_unknown_codec_raises():
    t = make_media_batch(np.array([1]), codec="jpeg")
    dec = MediaDecoder()
    if "jpeg" not in dec._codecs:    # pillow absent in this container
        with pytest.raises(NotImplementedError):
            dec(t)


def test_frame_sampler():
    t = make_media_batch(np.array([7]), width=4, height=3, n_frames=6)
    dec = MediaDecoder()(t)
    frames = FrameSampler(stride=2)(dec)
    assert frames.column("frame_idx").to_pylist() == [0, 2, 4]
    # frame 2's bytes are payload[2*12:3*12]
    buf = t.column("payload")[0].as_py()
    assert frames.column("pixels")[1].as_py() == buf[24:36]


def test_audio_features():
    t = make_media_batch(np.array([9]), width=50, height=1,
                         media_type="audio")
    f = AudioFeatures()(t)
    s = np.frombuffer(t.column("payload")[0].as_py(),
                      dtype=np.uint8).astype(np.int64) - 128
    assert f.column("rms_milli")[0].as_py() == int(
        np.floor(np.sqrt((s * s).mean()) * 1000))


def test_media_pipeline_on_ray(ray_session):
    """End-to-end Dataset plumbing: payload binary through the object
    store, actor-pool stages, stable output schema."""
    import ray
    ids = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64))})

    def synth(batch: pa.Table) -> pa.Table:
        return make_media_batch(
            batch.column("doc_id").to_numpy(zero_copy_only=False))

    out = ray.data.from_arrow(ids) \
        .map_batches(synth, batch_format="pyarrow") \
        .map_batches(MediaDecoder, batch_format="pyarrow", concurrency=2,
                     batch_size=16) \
        .map_batches(MediaResize, fn_constructor_args=(8, 8),
                     batch_format="pyarrow", concurrency=2) \
        .map_batches(ImageStats(), batch_format="pyarrow")
    rows = out.take_all()
    assert len(rows) == 40
    assert set(rows[0].keys()) == {"key", "px_sum", "px_min", "px_max"}
