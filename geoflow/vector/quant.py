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


def int8_mips_topk(ds, query_ids, k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """Top-k maximum-inner-product search over int8-quantized vectors
    (the integer-exact MIPS baseline: per-vector max-abs symmetric
    quantization — int8_quantize_batch's op order — then int32 code
    dot products). Scores are exact integers, so (qid, vec_id, score)
    hash-match the SQL oracle; cosine/IP ranking over the ORIGINAL
    floats is ann.py's domain — this is the quantized-scan variant a
    100-TB corpus actually runs (4× smaller reads, integer SIMD).

    Shape: query codes broadcast once via ray.put; one map_batches
    pass quantizes each batch and matmuls against the query matrix
    (per-batch top-k partials), driver merges the bounded candidate
    set (|queries|·k per block)."""
    import ray
    import ray.data

    query_ids = sorted(int(q) for q in query_ids)

    def _codes(batch: pa.Table):
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vals, offs = _flat_list(batch.column(vec_col))
        lens = offs[1:] - offs[:-1]
        if len(lens) == 0 or (lens != lens[0]).any():
            raise ValueError("int8_mips_topk: ragged embedding dims")
        m = vals.astype(np.float64).reshape(len(lens), lens[0])
        scale = np.abs(m).max(axis=1)
        ok = scale > 0.0
        c = np.zeros_like(m)
        c[ok] = np.floor(m[ok] / scale[ok, None] * 127.0 + 0.5)
        return ids, c.astype(np.int32)

    # ---- collect + quantize the query vectors (tiny)
    qset = set(query_ids)

    def pick(b: pa.Table) -> pa.Table:
        m = pa.compute.is_in(b.column(id_col),
                             value_set=pa.array(query_ids,
                                                pa.int64()))
        return b.filter(m)

    qtab = pa.concat_tables(
        [b for b in ds.map_batches(pick, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows and id_col in b.schema.names])
    if set(qtab.column(id_col).to_pylist()) != qset:
        raise KeyError("int8_mips_topk: missing query vec_ids")
    qids, qcodes = _codes(qtab)
    order = np.argsort(qids)
    qref = ray.put((qids[order], qcodes[order]))

    def score(b: pa.Table, _q=qref) -> pa.Table:
        qi, qc = ray.get(_q)
        ids, dc = _codes(b)
        s = dc @ qc.T.astype(np.int32)          # (n, Q) int32 exact
        out_q, out_d, out_s = [], [], []
        for j, q in enumerate(qi):
            col = s[:, j].astype(np.int64)
            m = ids != q                        # exclude self
            idx = np.nonzero(m)[0]
            sel = idx[np.lexsort((ids[idx], -col[idx]))[:k]]
            out_q.append(np.full(len(sel), q, np.int64))
            out_d.append(ids[sel])
            out_s.append(col[sel])
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_d)),
                         "score": pa.array(np.concatenate(out_s))})

    qs, ds_, ss = [], [], []
    for b in ds.map_batches(score, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0 or "qid" not in b.schema.names:
            continue
        qs.append(b.column("qid").to_numpy(zero_copy_only=False))
        ds_.append(b.column("vec_id").to_numpy(zero_copy_only=False))
        ss.append(b.column("score").to_numpy(zero_copy_only=False))
    q = np.concatenate(qs)
    d = np.concatenate(ds_)
    s = np.concatenate(ss)
    keep = []
    for qv in np.unique(q):
        i = np.nonzero(q == qv)[0]
        keep.append(i[np.lexsort((d[i], -s[i]))[:k]])
    keep = np.concatenate(keep)
    import ray.data
    return ray.data.from_arrow(pa.table({
        "qid": pa.array(q[keep]), "vec_id": pa.array(d[keep]),
        "score": pa.array(s[keep])}))
