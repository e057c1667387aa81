"""AudioFingerprint stage (geoflow/media/stages.py): energy-envelope
bits over PCM frames. Driver gate is the `audio_fingerprint` query
(planted samples through the real WAV codec); these tests pin the
frame/bit layout, the short-stream guard and the 63-bit fold."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.media import AudioFingerprint, wav_encode


def _fp(sample_lists, frame=4, codec="wav"):
    payloads = [wav_encode(np.asarray(s, np.int64), 8000, bits=16)
                if codec == "wav" else
                (np.asarray(s, np.int64) + 128).astype(np.uint8)
                .tobytes()
                for s in sample_lists]
    t = pa.table({
        "key": pa.array(np.arange(len(payloads), dtype=np.int64)),
        "payload": pa.array(payloads, pa.binary()),
        "codec": pa.array([codec] * len(payloads), pa.string())})
    out = AudioFingerprint(frame=frame)(t)
    return (out.column("afp").to_pylist(),
            out.column("n_frames_fp").to_pylist())


def test_envelope_bits():
    # frames of 4: energies 4*1, 4*4, 4*0, 4*9 -> bits (up,down,up)
    s = [1, -1, 1, -1, 2, 2, -2, -2, 0, 0, 0, 0, 3, 3, 3, 3]
    afp, nf = _fp([s])
    assert nf == [4]
    assert afp == [0b101]


def test_flat_energy_all_zero_bits():
    s = [5, -5] * 8  # every frame identical energy
    afp, nf = _fp([s])
    assert afp == [0] and nf == [4]


def test_short_stream_guard():
    afp, nf = _fp([[1, 2, 3]])  # < 2 frames
    assert afp == [0] and nf == [0]


def test_tail_samples_dropped():
    # 9 samples at frame 4 -> 2 frames, 1 bit; the 9th is ignored
    a, _ = _fp([[1, 1, 1, 1, 2, 2, 2, 2, 99]])
    b, _ = _fp([[1, 1, 1, 1, 2, 2, 2, 2]])
    assert a == b


def test_fold_over_63_bits():
    # 130 frames -> 129 bits -> three pages XOR-folded
    rng = np.random.default_rng(3)
    s = rng.integers(-100, 100, 130 * 4)
    afp, nf = _fp([s.tolist()])
    assert nf == [130]
    e = (np.asarray(s).reshape(-1, 4) ** 2).sum(axis=1)
    bits = (e[1:] > e[:-1])
    acc = 0
    for page in range(0, len(bits), 63):
        chunk = bits[page: page + 63]
        word = sum(int(b) << i for i, b in enumerate(chunk))
        acc ^= word
    assert afp == [np.uint64(acc).astype(np.int64)]


def test_duplicate_audio_same_fp():
    s = np.arange(64).tolist()
    afp, _ = _fp([s, s])
    assert afp[0] == afp[1]
