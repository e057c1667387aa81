"""Areal-weighted interpolation (Goodchild & Lam 1980): redistribute
an extensive variable (population, counts) from source zones onto
target zones proportionally to overlap area — the standard
census-block → grid re-aggregation primitive.

Exactness contract: zones are axis-aligned INTEGER rectangles, so
overlap areas are exact int64 products; each source's contribution is
floor(value · overlap · SCALE / area_src) — a per-source integer
floor, summed per target. The SQL twin computes the identical
per-pair floors (HUGEINT product, // then cast), so estimates
hash-match. General polygon zones route through the overlay engine
(geom/clipping.py) and are float-area — pytest-gated there, not
hash-gated.

Shape: targets are the SMALL side — broadcast via ray.put once, each
source batch computes its pair contributions vectorized against the
whole target matrix (no shuffle), then ONE groupby(target).sum
collapses to |targets| rows."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1 << 20


def areal_interpolate(src_ds, targets,
                      rect_cols=("x0", "y0", "x1", "y1"),
                      value_col: str = "value",
                      target_id_col: str = "target_id"):
    """``targets``: pa.Table / dict with target_id + the same four
    integer rect columns. Returns (target_id, est_units) where
    est_units = Σ_src floor(value·overlap·2^20 / src_area); the
    /2^20 to engineering units is one client-side float op."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    if isinstance(targets, dict):
        targets = pa.table(targets)
    tid = np.asarray(targets.column(target_id_col).to_pylist(),
                     dtype=np.int64)
    tx0, ty0, tx1, ty1 = (
        np.asarray(targets.column(c).to_pylist(), dtype=np.int64)
        for c in rect_cols)
    t_ref = ray.put((tid, tx0, ty0, tx1, ty1))
    x0c, y0c, x1c, y1c = rect_cols

    def contrib(batch: pa.Table, _t=t_ref) -> pa.Table:
        ti, a0, b0, a1, b1 = ray.get(_t)
        sx0 = batch.column(x0c).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sy0 = batch.column(y0c).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sx1 = batch.column(x1c).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sy1 = batch.column(y1c).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        val = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        area = (sx1 - sx0) * (sy1 - sy0)
        ox = (np.minimum(sx1[:, None], a1[None, :])
              - np.maximum(sx0[:, None], a0[None, :])).clip(min=0)
        oy = (np.minimum(sy1[:, None], b1[None, :])
              - np.maximum(sy0[:, None], b0[None, :])).clip(min=0)
        ov = ox * oy
        si, tj = np.nonzero(ov)
        if len(si) == 0:
            return pa.table({"target_id": pa.array([], pa.int64()),
                             "est_units": pa.array([], pa.int64())})
        units = (val[si] * ov[si, tj] * SCALE) // area[si]
        return pa.table({"target_id": pa.array(ti[tj]),
                         "est_units": pa.array(units)})

    return (src_ds.map_batches(contrib, batch_format="pyarrow")
            .groupby("target_id")
            .aggregate(Sum("est_units", alias_name="est_units")))
