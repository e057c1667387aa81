"""int8 embedding quantization (geoflow/vector/quant.py). Driver gate
is the `embed_int8` oracle query over the real embeddings table."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.vector.quant import (int8_dequantize, int8_quantize_batch)


def _q(vecs):
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([np.asarray(v, np.float32) for v in vecs],
                              pa.list_(pa.float32()))})
    return int8_quantize_batch(t).to_pandas()


def test_codes_range_and_extremes():
    df = _q([[1.0, -1.0, 0.5, 0.0]])
    assert df["code"].tolist() == [127, -127, 64, 0]  # 0.5*127+0.5=64
    assert df["scale"].tolist() == [1.0] * 4
    assert df["dim"].tolist() == [0, 1, 2, 3]


def test_scale_is_max_abs():
    df = _q([[0.2, -0.8, 0.4]])
    assert np.allclose(df["scale"], np.float64(np.float32(0.8)))
    assert df["code"].tolist()[1] == -127


def test_zero_vector_guard():
    df = _q([[0.0, 0.0]])
    assert df["code"].tolist() == [0, 0]
    assert df["scale"].tolist() == [0.0, 0.0]


def test_roundtrip_error_bound():
    rng = np.random.default_rng(5)
    v = rng.normal(0, 0.3, 64).astype(np.float32)
    df = _q([v])
    back = int8_dequantize(df["code"].to_numpy(),
                           float(df["scale"].iloc[0]))
    assert np.abs(back - v.astype(np.float64)).max() \
        <= float(df["scale"].iloc[0]) / 254.0 + 1e-12


def test_half_up_rounding_negative():
    # floor(x + 0.5) rounds -0.5 cases toward +inf on both engines
    df = _q([[1.0, -0.00393700787]])  # -0.5/127
    assert df["code"].tolist()[1] in (0, -0)


def test_multi_vector_lineage():
    df = _q([[1.0], [2.0, -2.0]])
    assert df["vec_id"].tolist() == [0, 1, 1]
    assert df["code"].tolist() == [127, 127, -127]
