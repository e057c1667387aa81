"""Scalar int8 embedding quantization (max-abs symmetric).

The storage-compression step of a 100-TB embedding pipeline (4x
smaller than float32 before PQ-level codes; the vector/pq.py product
quantizer is the heavier alternative). Per vector:

    scale  = max_i |x_i|            (order-independent, float-exact)
    code_i = floor(x_i / scale * 127.0 + 0.5)   in [-127, 127]

Exactness design: every per-element op is a single IEEE double
operation in a FIXED order (cast f32->f64 exact, divide, multiply,
add, floor), and the scale is a max (no accumulation-order hazard —
an L2-norm scale would sum floats and never hash across engines,
CLAUDE.md). DuckDB evaluates the identical expression over the same
floats, so codes and scales hash-match bit-for-bit (`embed_int8`
driver gate over the real embeddings table).

One map_batches pass; the list column is consumed zero-copy (flat
values buffer + offsets, np.maximum.reduceat per vector).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _flat_list(col):
    """(float64 values, int64 offsets) of a list<float-ish> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = np.asarray(col.offsets, dtype=np.int64)
    vals = np.asarray(col.values, dtype=np.float64)
    return vals, offs


def int8_quantize_batch(batch: pa.Table, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> pa.Table:
    """map_batches UDF: flattened (vec_id, dim, code, scale) rows —
    one row per vector element (list columns don't survive the
    driver's pandas value-hash, so the gated shape is flat)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    vals, offs = _flat_list(batch.column(vec_col))
    lens = offs[1:] - offs[:-1]
    n = len(lens)
    if len(vals) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "dim": pa.array([], pa.int64()),
                         "code": pa.array([], pa.int64()),
                         "scale": pa.array([], pa.float64())})
    nz = lens > 0
    scale = np.zeros(n, dtype=np.float64)
    scale[nz] = np.maximum.reduceat(np.abs(vals), offs[:-1][nz])
    srep = np.repeat(scale, lens)
    parent = np.repeat(np.arange(n, dtype=np.int64), lens)
    dim = np.arange(len(vals), dtype=np.int64) \
        - np.repeat(offs[:-1], lens)
    # FIXED op order, mirrored in the SQL oracle: /scale, *127, +0.5
    code = np.zeros(len(vals), dtype=np.int64)
    ok = srep > 0.0
    code[ok] = np.floor(vals[ok] / srep[ok] * 127.0 + 0.5) \
        .astype(np.int64)
    return pa.table({"vec_id": pa.array(ids[parent]),
                     "dim": pa.array(dim),
                     "code": pa.array(code),
                     "scale": pa.array(srep)})


def int8_dequantize(codes: np.ndarray, scale: float) -> np.ndarray:
    """code * scale / 127.0 — the symmetric inverse (max abs error
    scale/254 per element)."""
    return codes.astype(np.float64) * scale / 127.0


def int8_quantize(ds, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """One map_batches pass; no shuffle."""
    return ds.map_batches(
        lambda b: int8_quantize_batch(b, vec_col, id_col),
        batch_format="pyarrow")
