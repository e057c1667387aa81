"""Raster operators: map algebra, attributes, pixel↔world, relations.

Reference packages: raster/algebra/*.java (33 classes — per-pixel JAI ops,
e.g. Add.java:23-52), raster/attribute/*.java, raster/relation/*.java
(raster operands reduce to envelope polygons for topological relations —
Intersects.java:26-55). Here per-pixel math is numpy over the decoded band
arrays; batch kernels loop rasters but each raster's math is vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ops.registry import register_op
from .rastwkb import PT_8BUI, PT_64BF, Raster, from_wkb, to_wkb

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _map_binary(col_a, col_b, fn) -> pa.Array:
    out = []
    for a, b in zip(col_a.to_pylist(), col_b.to_pylist()):
        if a is None or b is None:
            out.append(None)
            continue
        out.append(to_wkb(fn(from_wkb(a), from_wkb(b))))
    return pa.array(out, type=pa.binary())


def _map_unary(col, fn) -> pa.Array:
    out = []
    for a in col.to_pylist():
        out.append(None if a is None else to_wkb(fn(from_wkb(a))))
    return pa.array(out, type=pa.binary())


def _map_scalar(col, fn, typ=pa.float64()) -> pa.Array:
    out = []
    for a in col.to_pylist():
        out.append(None if a is None else fn(from_wkb(a)))
    return pa.array(out, type=typ)


def _float_result(r: Raster, bands) -> Raster:
    return Raster(bands, [PT_64BF] * len(bands),
                  [None] * len(bands), r.scale_x, r.scale_y, r.ip_x, r.ip_y,
                  r.skew_x, r.skew_y, r.srid, shape=r.shape)


def _algebra2(name, npfn, doc):
    @register_op(name, 2, "raster_algebra")
    def op(col_a, col_b, _f=npfn):
        def fn(ra, rb):
            bands = [_f(a.astype(np.float64), b.astype(np.float64))
                     for a, b in zip(ra.bands, rb.bands)]
            return _float_result(ra, bands)
        return _map_binary(col_a, col_b, fn)
    op.__doc__ = doc
    return op


def _algebra_const(name, npfn, doc):
    @register_op(name, 2, "raster_algebra")
    def op(col, const, _f=npfn):
        def fn(r):
            bands = [_f(b.astype(np.float64), const) for b in r.bands]
            return _float_result(r, bands)
        return _map_unary(col, fn)
    op.__doc__ = doc
    return op


# per-pixel binary ops (raster/algebra/Add.java:23-52 family)
_algebra2("rast_add", np.add, "Add.java:23 — per-pixel sum")
_algebra2("rast_subtract", np.subtract, "Subtract.java:23")
_algebra2("rast_mult", np.multiply, "Mult.java:23")
_algebra2("rast_div", lambda a, b: np.divide(a, np.where(b == 0, np.nan, b)),
          "Div.java:23 (div-by-zero → NaN)")
_algebra2("rast_max", np.maximum, "Max.java:23")
_algebra2("rast_min", np.minimum, "Min.java:23")
_algebra2("rast_mean", lambda a, b: (a + b) / 2.0, "Mean.java:23")
_algebra2("rast_and", lambda a, b: ((a != 0) & (b != 0)).astype(np.float64),
          "And.java:23 — logical per-pixel")
_algebra2("rast_or", lambda a, b: ((a != 0) | (b != 0)).astype(np.float64),
          "Or.java:23")
_algebra2("rast_xor", lambda a, b: ((a != 0) ^ (b != 0)).astype(np.float64),
          "Xor.java:23")

_algebra_const("rast_addconst", np.add, "AddConst.java:24")
_algebra_const("rast_subtractconst", np.subtract, "SubtractConst.java:24")
_algebra_const("rast_subtractfromconst", lambda a, c: c - a,
               "SubtractFromConst.java:24")
_algebra_const("rast_multconst", np.multiply, "MultConst.java:24")
_algebra_const("rast_divconst",
               lambda a, c: np.divide(a, c) if c != 0 else np.full_like(a, np.nan),
               "DivConst.java:24")
_algebra_const("rast_andconst",
               lambda a, c: ((a != 0) & (c != 0)).astype(np.float64),
               "AndConst.java:24")
_algebra_const("rast_orconst",
               lambda a, c: ((a != 0) | (c != 0)).astype(np.float64),
               "OrConst.java:24")
_algebra_const("rast_xorconst",
               lambda a, c: ((a != 0) ^ (c != 0)).astype(np.float64),
               "XorConst.java:24")


@register_op("rast_abs", 1, "raster_algebra")
def rast_abs(col):
    """Abs.java:23."""
    return _map_unary(col, lambda r: _float_result(
        r, [np.abs(b.astype(np.float64)) for b in r.bands]))


@register_op("rast_exp", 1, "raster_algebra")
def rast_exp(col):
    """Exp.java:23."""
    return _map_unary(col, lambda r: _float_result(
        r, [np.exp(b.astype(np.float64)) for b in r.bands]))


@register_op("rast_log", 1, "raster_algebra")
def rast_log(col):
    """Log.java:24 (non-positive → NaN)."""
    def f(r):
        out = []
        for b in r.bands:
            a = b.astype(np.float64)
            out.append(np.log(np.where(a > 0, a, np.nan)))
        return _float_result(r, out)
    return _map_unary(col, f)


@register_op("rast_not", 1, "raster_algebra")
def rast_not(col):
    """Not.java:23."""
    return _map_unary(col, lambda r: _float_result(
        r, [(b == 0).astype(np.float64) for b in r.bands]))


@register_op("rast_binarize", 2, "raster_algebra")
def rast_binarize(col, threshold):
    """Binarize.java:24 — pixel >= threshold → 1 else 0."""
    return _map_unary(col, lambda r: _float_result(
        r, [(b.astype(np.float64) >= threshold).astype(np.float64)
            for b in r.bands]))


@register_op("rast_clamp", 3, "raster_algebra")
def rast_clamp(col, lo, hi):
    """Clamp.java:23."""
    return _map_unary(col, lambda r: _float_result(
        r, [np.clip(b.astype(np.float64), lo, hi) for b in r.bands]))


@register_op("rast_threshold", 3, "raster_algebra")
def rast_threshold(col, lo, hi):
    """Threshold.java:23 — keep pixels in [lo, hi], else 0."""
    def f(r):
        out = []
        for b in r.bands:
            a = b.astype(np.float64)
            out.append(np.where((a >= lo) & (a <= hi), a, 0.0))
        return _float_result(r, out)
    return _map_unary(col, f)


def _window_view(a: np.ndarray, k: int) -> np.ndarray:
    """(h, w) → (h, w, k, k) sliding windows over an edge-padded array."""
    pad = k // 2
    ap = np.pad(a, pad, mode="edge")
    return np.lib.stride_tricks.sliding_window_view(ap, (k, k))


def _filter_op(name, reducer, doc):
    @register_op(name, 2, "raster_algebra")
    def op(col, size=3, _red=reducer):
        def f(r):
            out = [_red(_window_view(b.astype(np.float64), size), axis=(2, 3))
                   for b in r.bands]
            return _float_result(r, out)
        return _map_unary(col, f)
    op.__doc__ = doc
    return op


_filter_op("rast_medianfilter", np.median,
           "MedianFilter.java:23 — k×k neighborhood median")
_filter_op("rast_minfilter", np.min, "MinFilter.java:23")
_filter_op("rast_maxfilter", np.max, "MaxFilter.java:23")


def _dct2(a: np.ndarray, inverse=False) -> np.ndarray:
    """2D DCT-II / DCT-III via explicit cosine basis (no scipy)."""
    def basis(n):
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        return m
    bh = basis(a.shape[0])
    bw = basis(a.shape[1])
    if inverse:
        return bh.T @ a @ bw
    return bh @ a @ bw.T


@register_op("rast_dct", 1, "raster_algebra")
def rast_dct(col):
    """DCT.java:23 — 2D DCT-II per band."""
    return _map_unary(col, lambda r: _float_result(
        r, [_dct2(b.astype(np.float64)) for b in r.bands]))


@register_op("rast_idct", 1, "raster_algebra")
def rast_idct(col):
    """IDCT.java:23."""
    return _map_unary(col, lambda r: _float_result(
        r, [_dct2(b.astype(np.float64), inverse=True) for b in r.bands]))


# ---------------------------------------------------------------------------
# attributes (raster/attribute/*.java)
# ---------------------------------------------------------------------------

@register_op("rast_width", 1, "raster_attr")
def rast_width(col):
    """Width.java:26."""
    return _map_scalar(col, lambda r: r.width, pa.int32())


@register_op("rast_height", 1, "raster_attr")
def rast_height(col):
    """Height.java:26."""
    return _map_scalar(col, lambda r: r.height, pa.int32())


@register_op("rast_numbands", 1, "raster_attr")
def rast_numbands(col):
    """NumBands.java:21."""
    return _map_scalar(col, lambda r: r.num_bands, pa.int32())


@register_op("rast_srid", 1, "raster_attr")
def rast_srid(col):
    return _map_scalar(col, lambda r: r.srid, pa.int32())


for _n, _attr in [("rast_scalex", "scale_x"), ("rast_scaley", "scale_y"),
                  ("rast_skewx", "skew_x"), ("rast_skewy", "skew_y"),
                  ("rast_upperleftx", "ip_x"), ("rast_upperlefty", "ip_y")]:
    def _mk(attr):
        def op(col, _a=attr):
            return _map_scalar(col, lambda r: float(getattr(r, _a)))
        return op
    register_op(_n, 1, "raster_attr")(_mk(_attr))


@register_op("rast_pixelwidth", 1, "raster_attr")
def rast_pixelwidth(col):
    """PixelWidth.java:9 — |scale| incl. skew component."""
    return _map_scalar(col, lambda r: float(np.hypot(r.scale_x, r.skew_y)))


@register_op("rast_pixelheight", 1, "raster_attr")
def rast_pixelheight(col):
    """PixelHeight.java:31."""
    return _map_scalar(col, lambda r: float(np.hypot(r.scale_y, r.skew_x)))


@register_op("rast_maxvalue", 2, "raster_attr")
def rast_maxvalue(col, band=0):
    """MaxValue.java:11 (nodata excluded)."""
    def f(r):
        b = r.bands[band].astype(np.float64)
        nd = r.nodata[band]
        vals = b[b != nd] if nd is not None else b
        return float(vals.max()) if vals.size else None
    return _map_scalar(col, f)


@register_op("rast_minvalue", 2, "raster_attr")
def rast_minvalue(col, band=0):
    """MinValue.java:11."""
    def f(r):
        b = r.bands[band].astype(np.float64)
        nd = r.nodata[band]
        vals = b[b != nd] if nd is not None else b
        return float(vals.min()) if vals.size else None
    return _map_scalar(col, f)


@register_op("rast_value", 4, "raster_attr")
def rast_value(col, band, x, y):
    """Value.java:22 — pixel value at raster coords."""
    def f(r):
        if 0 <= y < r.height and 0 <= x < r.width:
            return float(r.bands[band][y, x])
        return None
    return _map_scalar(col, f)


@register_op("rast_bandnodata", 2, "raster_attr")
def rast_bandnodata(col, band=0):
    """BandNoDataValue.java:22."""
    def f(r):
        nd = r.nodata[band]
        return None if nd is None else float(nd)
    return _map_scalar(col, f)


@register_op("rast_summarystats", 2, "raster_attr")
def rast_summarystats(col, band=0):
    """Summary/SummaryStats (count/sum/mean/stddev/min/max, nodata
    excluded) as a struct array."""
    rows = []
    for a in col.to_pylist():
        if a is None:
            rows.append(None)
            continue
        r = from_wkb(a)
        b = r.bands[band].astype(np.float64)
        nd = r.nodata[band]
        vals = b[b != nd] if nd is not None else b.ravel()
        if vals.size == 0:
            rows.append({"count": 0, "sum": 0.0, "mean": 0.0,
                         "stddev": 0.0, "min": 0.0, "max": 0.0})
        else:
            rows.append({"count": int(vals.size), "sum": float(vals.sum()),
                         "mean": float(vals.mean()),
                         "stddev": float(vals.std()),
                         "min": float(vals.min()), "max": float(vals.max())})
    return pa.array(rows, type=pa.struct([
        ("count", pa.int64()), ("sum", pa.float64()), ("mean", pa.float64()),
        ("stddev", pa.float64()), ("min", pa.float64()),
        ("max", pa.float64())]))


@register_op("rast_envelope", 1, "raster_attr")
def rast_envelope(col):
    """raster/attribute/Envelope.java:27 — envelope polygon WKB."""
    from ..geom import to_wkb as geom_to_wkb
    out = []
    for a in col.to_pylist():
        out.append(None if a is None
                   else geom_to_wkb(from_wkb(a).envelope_polygon()))
    return pa.array(out, type=pa.binary())


@register_op("rast_rastertoworldcoord", 3, "raster_attr")
def rast_rastertoworldcoord(col, px, py):
    """RasterToWorldCoord.java:35 → struct<x,y>."""
    rows = []
    for a in col.to_pylist():
        if a is None:
            rows.append(None)
            continue
        r = from_wkb(a)
        x, y = r.raster_to_world(px, py)
        rows.append({"x": float(x), "y": float(y)})
    return pa.array(rows, type=pa.struct([("x", pa.float64()),
                                          ("y", pa.float64())]))


@register_op("rast_worldtorastercoord", 3, "raster_attr")
def rast_worldtorastercoord(col, wx, wy):
    """WorldToRasterCoord.java:38 → struct<col,row> (floor of fractional)."""
    rows = []
    for a in col.to_pylist():
        if a is None:
            rows.append(None)
            continue
        r = from_wkb(a)
        c, rr = r.world_to_raster(wx, wy)
        rows.append({"col": int(np.floor(c)), "row": int(np.floor(rr))})
    return pa.array(rows, type=pa.struct([("col", pa.int64()),
                                          ("row", pa.int64())]))


@register_op("rast_pixelaspolygon", 3, "raster_attr")
def rast_pixelaspolygon(col, px, py):
    """PixelAsPolygon.java:28 — pixel footprint polygon WKB."""
    from ..geom import Geometry, to_wkb as geom_to_wkb
    out = []
    for a in col.to_pylist():
        if a is None:
            out.append(None)
            continue
        r = from_wkb(a)
        cs = np.array([px, px + 1, px + 1, px, px], dtype=np.float64)
        rs = np.array([py, py, py + 1, py + 1, py], dtype=np.float64)
        x, y = r.raster_to_world(cs, rs)
        ring = np.column_stack([x, y])
        out.append(geom_to_wkb(Geometry(3, rings=[ring],
                                        srid=r.srid or 4326)))
    return pa.array(out, type=pa.binary())


# ---------------------------------------------------------------------------
# transforms / editors
# ---------------------------------------------------------------------------

@register_op("rast_resize", 3, "raster_transform")
def rast_resize(col, new_w, new_h):
    """Resize.java:17 — nearest-neighbor resample; scale adjusted so the
    world extent is preserved."""
    def f(r):
        ridx = (np.arange(new_h) * r.height / new_h).astype(np.int64)
        cidx = (np.arange(new_w) * r.width / new_w).astype(np.int64)
        bands = [b[np.ix_(ridx, cidx)] for b in r.bands]
        return Raster(bands, r.pixtypes, r.nodata,
                      r.scale_x * r.width / new_w,
                      r.scale_y * r.height / new_h,
                      r.ip_x, r.ip_y, r.skew_x, r.skew_y, r.srid,
                      shape=(new_h, new_w))
    return _map_unary(col, f)


@register_op("rast_crop", 5, "raster_transform")
def rast_crop(col, x0, y0, x1, y1):
    """raster/algebra/Crop.java:23 — pixel-space crop [x0,x1)×[y0,y1)."""
    def f(r):
        bands = [b[y0:y1, x0:x1] for b in r.bands]
        nix, niy = r.raster_to_world(x0, y0)
        return Raster(bands, r.pixtypes, r.nodata, r.scale_x, r.scale_y,
                      float(nix), float(niy), r.skew_x, r.skew_y, r.srid,
                      shape=(y1 - y0, x1 - x0))
    return _map_unary(col, f)


@register_op("rast_reproject", 2, "raster_transform")
def rast_reproject(col, dst_srid):
    """Reproject / Transform (raster): inverse-mapping nearest-neighbor
    resample between the supported CRS (4326 ↔ 3857 ↔ UTM — the same
    envelope as vector st_transform; arbitrary-EPSG is out of scope,
    matching geom/crs.py). Output keeps the source pixel count; its
    georeference is the dst-CRS bounding box of the source extent."""
    from ..geom.crs import get_transformer

    def f(r):
        if r.srid == dst_srid or r.width == 0 or r.height == 0:
            return r
        fwd = get_transformer(r.srid, dst_srid)
        inv = get_transformer(dst_srid, r.srid)
        # dst bbox from the source corner points
        cx = np.array([0, r.width, 0, r.width], dtype=np.float64)
        cy = np.array([0, 0, r.height, r.height], dtype=np.float64)
        wx = r.ip_x + cx * r.scale_x + cy * r.skew_x
        wy = r.ip_y + cx * r.skew_y + cy * r.scale_y
        dx, dy = fwd(wx, wy)
        x0, x1 = float(np.min(dx)), float(np.max(dx))
        y0, y1 = float(np.min(dy)), float(np.max(dy))
        w, h = r.width, r.height
        sx = (x1 - x0) / w
        sy = (y0 - y1) / h          # north-up: negative scale_y
        # inverse map each dst pixel center to a source pixel
        jj, ii = np.meshgrid(np.arange(w), np.arange(h))
        dwx = x0 + (jj + 0.5) * sx
        dwy = y1 + (ii + 0.5) * sy
        swx, swy = inv(dwx.ravel(), dwy.ravel())
        det = r.scale_x * r.scale_y - r.skew_x * r.skew_y
        px = ((swx - r.ip_x) * r.scale_y - (swy - r.ip_y) * r.skew_x) / det
        py = ((swy - r.ip_y) * r.scale_x - (swx - r.ip_x) * r.skew_y) / det
        pxi = np.floor(px).astype(np.int64)
        pyi = np.floor(py).astype(np.int64)
        valid = (pxi >= 0) & (pxi < w) & (pyi >= 0) & (pyi < h)
        pxi = np.clip(pxi, 0, w - 1)
        pyi = np.clip(pyi, 0, h - 1)
        bands = []
        for bi, b in enumerate(r.bands):
            out = b[pyi, pxi].reshape(h, w).copy()
            nod = r.nodata[bi]
            fill = nod if nod is not None else 0
            out[~valid.reshape(h, w)] = fill
            bands.append(out)
        return Raster(bands, r.pixtypes, r.nodata, sx, sy, x0, y1,
                      0.0, 0.0, dst_srid, shape=(h, w))
    return _map_unary(col, f)


@register_op("rast_reclass", 2, "raster_transform")
def rast_reclass(col, mapping):
    """Reclass — {old_value: new_value} remap, others passthrough."""
    def f(r):
        out = []
        for b in r.bands:
            a = b.astype(np.float64)
            res = a.copy()
            for old, new in mapping.items():
                res[a == old] = new
            out.append(res)
        return _float_result(r, out)
    return _map_unary(col, f)


@register_op("rast_makeempty", 0, "raster_constructor")
def rast_makeempty(width=0, height=0, ip_x=0.0, ip_y=0.0, scale=1.0,
                   srid=0, n=1):
    """MakeEmptyRaster.java:48 — n identical empty rasters as a column."""
    r = Raster([], [], [], scale, -scale, ip_x, ip_y, 0.0, 0.0, srid,
               shape=(height, width))
    return pa.array([to_wkb(r)] * n, type=pa.binary())


# ---------------------------------------------------------------------------
# relations — raster reduces to its envelope polygon
# (raster/relation/Intersects.java:26-55 semantics)
# ---------------------------------------------------------------------------

def _env_pred(name, predfn, doc):
    @register_op(name, 2, "raster_relation")
    def op(col_a, col_b, _p=predfn):
        from ..geom import algorithms as alg
        out = []
        for a, b in zip(col_a.to_pylist(), col_b.to_pylist()):
            if a is None or b is None:
                out.append(None)
                continue
            ga = from_wkb(a).envelope_polygon()
            gb = from_wkb(b).envelope_polygon()
            out.append(bool(getattr(alg, _p)(ga, gb)))
        return pa.array(out, type=pa.bool_())
    op.__doc__ = doc
    return op


_env_pred("rast_intersects", "intersects",
          "raster/relation/Intersects.java:26-55 (envelope semantics)")
_env_pred("rast_contains", "contains", "raster/relation/Contains.java:29")
_env_pred("rast_within", "within", "raster/relation/Within.java:33")
_env_pred("rast_disjoint", "disjoint", "raster/relation/Disjoint.java:29")
_env_pred("rast_touches", "touches", "raster/relation/Touches.java:29")
_env_pred("rast_overlaps", "overlaps", "raster/relation/Overlaps.java:29")
_env_pred("rast_covers", "covers", "raster/relation/Covers.java:29")
_env_pred("rast_coveredby", "covered_by", "raster/relation/CoveredBy.java:29")


@register_op("rast_sameal", 2, "raster_relation")
def rast_samealignment(col_a, col_b):
    """SameAlignment.java:28 — same scale/skew and grid-aligned origins."""
    out = []
    for a, b in zip(col_a.to_pylist(), col_b.to_pylist()):
        if a is None or b is None:
            out.append(None)
            continue
        ra, rb = from_wkb(a), from_wkb(b)
        same = (ra.scale_x == rb.scale_x and ra.scale_y == rb.scale_y
                and ra.skew_x == rb.skew_x and ra.skew_y == rb.skew_y)
        if same:
            c, r = ra.world_to_raster(rb.ip_x, rb.ip_y)
            same = (abs(c - round(c)) < 1e-9 and abs(r - round(r)) < 1e-9)
        out.append(bool(same))
    return pa.array(out, type=pa.bool_())


@register_op("rast_distance", 2, "raster_relation")
def rast_distance(col_a, col_b):
    """Raster-raster distance = envelope-polygon distance
    (DistanceTest.java:42-60: wkb1 vs wkb1 → 0.0)."""
    from ..geom import algorithms as alg
    out = []
    for a, b in zip(col_a.to_pylist(), col_b.to_pylist()):
        if a is None or b is None:
            out.append(None)
            continue
        out.append(alg.distance(from_wkb(a).envelope_polygon(),
                                from_wkb(b).envelope_polygon()))
    return pa.array(out, type=pa.float64())


# ---------------------------------------------------------------------------
# tiling / memory metadata (single-tile rendering model) + value-window
# relations — raster class tail
# ---------------------------------------------------------------------------

def _int_attr(col, fn):
    from .rastwkb import from_wkb as _fw
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for b in vals:
        if b is None:
            out.append(None)
            continue
        out.append(int(fn(_fw(b))))
    return pa.array(out, type=pa.int64())


@register_op("rast_numxtiles", 1, "raster_attr")
def rast_numxtiles(col):
    """NumXTiles.java — 1 in this engine's single-tile model."""
    return _int_attr(col, lambda r: 1)


@register_op("rast_numytiles", 1, "raster_attr")
def rast_numytiles(col):
    """NumYTiles.java."""
    return _int_attr(col, lambda r: 1)


@register_op("rast_tilewidth", 1, "raster_attr")
def rast_tilewidth(col):
    """TileWidth.java — tile == raster in the single-tile model."""
    return _int_attr(col, lambda r: r.width)


@register_op("rast_tileheight", 1, "raster_attr")
def rast_tileheight(col):
    """TileHeight.java."""
    return _int_attr(col, lambda r: r.height)


@register_op("rast_mintilex", 1, "raster_attr")
def rast_mintilex(col):
    """MinTileX.java."""
    return _int_attr(col, lambda r: 0)


@register_op("rast_mintiley", 1, "raster_attr")
def rast_mintiley(col):
    """MinTileY.java."""
    return _int_attr(col, lambda r: 0)


@register_op("rast_tilegridxoffset", 1, "raster_attr")
def rast_tilegridxoffset(col):
    """TileGridXOffset.java (also the reference's PixelSize.java, which
    returns the tile grid X offset)."""
    return _int_attr(col, lambda r: 0)


@register_op("rast_tilegridyoffset", 1, "raster_attr")
def rast_tilegridyoffset(col):
    """TileGridYOffset.java."""
    return _int_attr(col, lambda r: 0)


@register_op("rast_memsize", 1, "raster_attr")
def rast_memsize(col):
    """MemSize.java — data buffer element count (w·h·bands)."""
    return _int_attr(col, lambda r: r.width * r.height * len(r.bands))


@register_op("rast_hasnoband", 2, "raster_attr")
def rast_hasnoband(col, band=0):
    """HasNoBand.java."""
    from .rastwkb import from_wkb as _fw
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = [None if b is None else not (0 <= band < len(_fw(b).bands))
           for b in vals]
    return pa.array(out, type=pa.bool_())


@register_op("rast_bandpixeltype", 2, "raster_attr")
def rast_bandpixeltype(col, band=0):
    """BandPixelType.java — PostGIS pixel type name of the band."""
    from .rastwkb import PIXTYPE_NAMES, from_wkb as _fw
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for b in vals:
        if b is None:
            out.append(None)
            continue
        r = _fw(b)
        out.append(PIXTYPE_NAMES.get(r.pixtypes[band], "unknown")
                   if 0 <= band < len(r.pixtypes) else None)
    return pa.array(out, type=pa.string())


@register_op("rast_nearestvalue", 4, "raster_attr")
def rast_nearestvalue(col, band, px, py):
    """NearestValue.java — band value at (column, row)."""
    from .rastwkb import from_wkb as _fw
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for b in vals:
        if b is None:
            out.append(None)
            continue
        r = _fw(b)
        if not (0 <= band < len(r.bands)) or not \
                (0 <= py < r.height and 0 <= px < r.width):
            out.append(None)
            continue
        out.append(float(r.bands[band][py, px]))
    return pa.array(out, type=pa.float64())


@register_op("rast_translate", 3, "raster_transform")
def rast_translate(col, dx, dy):
    """TranslateX.java / TranslateY.java — shift the georeference."""
    def f(r):
        return Raster(r.bands, r.pixtypes, r.nodata, r.scale_x, r.scale_y,
                      r.ip_x + dx, r.ip_y + dy, r.skew_x, r.skew_y, r.srid,
                      shape=r.shape)
    return _map_unary(col, f)


@register_op("rast_reskew", 3, "raster_transform")
def rast_reskew(col, skew_x, skew_y):
    """Reskew — set the georeference skew terms."""
    def f(r):
        return Raster(r.bands, r.pixtypes, r.nodata, r.scale_x, r.scale_y,
                      r.ip_x, r.ip_y, skew_x, skew_y, r.srid, shape=r.shape)
    return _map_unary(col, f)


@register_op("rast_setgeoreference", 7, "raster_transform")
def rast_setgeoreference(col, ip_x, ip_y, scale_x, scale_y,
                         skew_x=0.0, skew_y=0.0):
    """SetGeoReference.java."""
    def f(r):
        return Raster(r.bands, r.pixtypes, r.nodata, scale_x, scale_y,
                      ip_x, ip_y, skew_x, skew_y, r.srid, shape=r.shape)
    return _map_unary(col, f)


@register_op("rast_setupperleft", 3, "raster_transform")
def rast_setupperleft(col, ip_x, ip_y):
    """SetUpperLeft.java."""
    def f(r):
        return Raster(r.bands, r.pixtypes, r.nodata, r.scale_x, r.scale_y,
                      ip_x, ip_y, r.skew_x, r.skew_y, r.srid, shape=r.shape)
    return _map_unary(col, f)


@register_op("rast_retile", 3, "raster_transform")
def rast_retile(col, tile_w, tile_h):
    """Retile — list<raster wkb> of tile_w×tile_h tiles covering the
    raster (ragged edge tiles clipped)."""
    from .rastwkb import from_wkb as _fw, to_wkb as _tw
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for b in vals:
        if b is None:
            out.append(None)
            continue
        r = _fw(b)
        tiles = []
        for y0 in range(0, r.height, tile_h):
            for x0 in range(0, r.width, tile_w):
                y1 = min(y0 + tile_h, r.height)
                x1 = min(x0 + tile_w, r.width)
                bands = [bb[y0:y1, x0:x1] for bb in r.bands]
                nix, niy = r.raster_to_world(x0, y0)
                tiles.append(_tw(Raster(bands, r.pixtypes, r.nodata,
                                        r.scale_x, r.scale_y,
                                        float(nix), float(niy), r.skew_x,
                                        r.skew_y, r.srid,
                                        shape=(y1 - y0, x1 - x0))))
        out.append(tiles)
    return pa.array(out, type=pa.list_(pa.binary()))


@register_op("rast_rasterequals", 2, "raster_relation")
def rast_rasterequals(col_a, col_b):
    """RasterEquals.java — same georeference, shape and band values."""
    from .rastwkb import from_wkb as _fw
    va = col_a.to_pylist() if hasattr(col_a, "to_pylist") else col_a
    vb = col_b.to_pylist() if hasattr(col_b, "to_pylist") else col_b
    out = []
    for a, b in zip(va, vb):
        if a is None or b is None:
            out.append(None)
            continue
        ra, rb = _fw(a), _fw(b)
        same = (ra.shape == rb.shape and len(ra.bands) == len(rb.bands)
                and ra.ip_x == rb.ip_x and ra.ip_y == rb.ip_y
                and ra.scale_x == rb.scale_x and ra.scale_y == rb.scale_y
                and all(np.array_equal(x, y)
                        for x, y in zip(ra.bands, rb.bands)))
        out.append(bool(same))
    return pa.array(out, type=pa.bool_())


def _env_overlap_window(r, env):
    """pixel window [x0,x1)×[y0,y1) of r overlapping world envelope."""
    ex0, ey0, ex1, ey1 = env
    rx0, ry0, rx1, ry1 = r.envelope()
    ox0, oy0 = max(ex0, rx0), max(ey0, ry0)
    ox1, oy1 = min(ex1, rx1), min(ey1, ry1)
    if ox0 >= ox1 or oy0 >= oy1:
        return None
    # assume north-up, no skew (the engine's relation envelope model)
    px0 = int(np.floor((ox0 - r.ip_x) / r.scale_x))
    px1 = int(np.ceil((ox1 - r.ip_x) / r.scale_x))
    if r.scale_y < 0:
        py0 = int(np.floor((oy1 - r.ip_y) / r.scale_y))
        py1 = int(np.ceil((oy0 - r.ip_y) / r.scale_y))
    else:
        py0 = int(np.floor((oy0 - r.ip_y) / r.scale_y))
        py1 = int(np.ceil((oy1 - r.ip_y) / r.scale_y))
    px0, py0 = max(px0, 0), max(py0, 0)
    px1, py1 = min(px1, r.width), min(py1, r.height)
    if px0 >= px1 or py0 >= py1:
        return None
    return px0, py0, px1, py1


def _value_window_relation(col_a, col_b, band, agg_pred):
    """Shared body of the *Intersects value relations: crop A to the
    envelope overlap with B, apply agg_pred(values) — reference
    raster/relation/{Smaller,Greater,Value,Median}Intersects.java."""
    from .rastwkb import from_wkb as _fw
    va = col_a.to_pylist() if hasattr(col_a, "to_pylist") else col_a
    vb = col_b.to_pylist() if hasattr(col_b, "to_pylist") else col_b
    out = []
    for a, b in zip(va, vb):
        if a is None or b is None:
            out.append(None)
            continue
        ra, rb = _fw(a), _fw(b)
        if not (0 <= band < len(ra.bands)):
            out.append(None)
            continue
        win = _env_overlap_window(ra, rb.envelope())
        if win is None:
            out.append(False)
            continue
        x0, y0, x1, y1 = win
        vals = ra.bands[band][y0:y1, x0:x1].astype(np.float64)
        out.append(bool(agg_pred(vals)))
    return pa.array(out, type=pa.bool_())


@register_op("rast_smallerintersects", 4, "raster_relation")
def rast_smallerintersects(col_a, col_b, band=0, value=0.0):
    """SmallerIntersects.java — max of the overlap window < value."""
    return _value_window_relation(col_a, col_b, band,
                                  lambda v: v.max() < value)


@register_op("rast_greaterintersects", 4, "raster_relation")
def rast_greaterintersects(col_a, col_b, band=0, value=0.0):
    """GreaterIntersects.java — min of the overlap window > value."""
    return _value_window_relation(col_a, col_b, band,
                                  lambda v: v.min() > value)


@register_op("rast_valueintersects", 4, "raster_relation")
def rast_valueintersects(col_a, col_b, band=0, value=0.0):
    """ValueIntersects.java — overlap window contains the value."""
    return _value_window_relation(col_a, col_b, band,
                                  lambda v: bool((v == value).any()))


@register_op("rast_medianintersects", 4, "raster_relation")
def rast_medianintersects(col_a, col_b, band=0, value=0.0):
    """MedianIntersects.java — the reference compares the arithmetic
    MEAN of the overlap window against value with ±1 tolerance."""
    return _value_window_relation(
        col_a, col_b, band,
        lambda v: (value - 1) <= v.mean() <= (value + 1))


@register_op("rast_containsproperly", 2, "raster_relation")
def rast_containsproperly(col_a, col_b):
    """ContainsProperly.java — B's envelope strictly inside A's."""
    from .rastwkb import from_wkb as _fw
    va = col_a.to_pylist() if hasattr(col_a, "to_pylist") else col_a
    vb = col_b.to_pylist() if hasattr(col_b, "to_pylist") else col_b
    out = []
    for a, b in zip(va, vb):
        if a is None or b is None:
            out.append(None)
            continue
        ax0, ay0, ax1, ay1 = _fw(a).envelope()
        bx0, by0, bx1, by1 = _fw(b).envelope()
        out.append(bool(ax0 < bx0 and ay0 < by0 and bx1 < ax1
                        and by1 < ay1))
    return pa.array(out, type=pa.bool_())


@register_op("rast_summary", 1, "raster_attr")
def rast_summary(col):
    """Summary.java — human-readable raster description (this engine's
    single-tile rendering model)."""
    from .rastwkb import from_wkb as _fw
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for b in vals:
        if b is None:
            out.append(None)
            continue
        r = _fw(b)
        out.append(
            f"Raster of {r.width}x{r.height}\n MemSize: "
            f"{r.width * r.height * len(r.bands)}\nMINX/Y: [0,0] pixels "
            f"has {len(r.bands)} bands\n and extent of {r.envelope()}\n"
            f"Tiles: 1/1[{r.width}/{r.height}] Offset: [0/0]")
    return pa.array(out, type=pa.string())


# ---------------------------------------------------------------------------
# CoverageJSON codec (spec: covjson.org; CoverageJsonWriter.java:47,
# RastFromCoverageJSON.java — JSON-only, no image libraries needed)
# ---------------------------------------------------------------------------

@register_op("rast_ascoveragejson", 1, "raster_exporter")
def rast_ascoveragejson(col):
    """AsCoverageJSON — CovJSON 'Coverage' document with a Grid domain
    (x/y axes start/stop/num from the georeference) and one NdArray
    range per band."""
    import json
    from .rastwkb import from_wkb as _fw
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for b in vals:
        if b is None:
            out.append(None)
            continue
        r = _fw(b)
        x0, y0, x1, y1 = r.envelope()
        doc = {
            "type": "Coverage",
            "domain": {
                "type": "Domain",
                "domainType": "Grid",
                "axes": {
                    "x": {"start": x0, "stop": x1, "num": r.width},
                    "y": {"start": y1, "stop": y0, "num": r.height},
                },
                "referencing": [{
                    "coordinates": ["x", "y"],
                    "system": {"type": "GeographicCRS"
                               if r.srid == 4326 else "ProjectedCRS",
                               "id": f"EPSG:{r.srid}"},
                }],
            },
            "ranges": {
                f"band{i}": {
                    "type": "NdArray",
                    "dataType": "float",
                    "axisNames": ["y", "x"],
                    "shape": [r.height, r.width],
                    "values": band.astype(np.float64).ravel().tolist(),
                } for i, band in enumerate(r.bands)
            },
        }
        out.append(json.dumps(doc))
    return pa.array(out, type=pa.string())


@register_op("rast_fromcoveragejson", 1, "raster_constructor")
def rast_fromcoveragejson(col):
    """RastFromCoverageJSON.java — parse a CovJSON Grid coverage back
    into the raster WKB form (float64 bands)."""
    import json
    from .rastwkb import from_wkb as _fw, to_wkb as _tw  # noqa: F401
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for s in vals:
        if s is None:
            out.append(None)
            continue
        doc = json.loads(s)
        ax = doc["domain"]["axes"]
        w, h = int(ax["x"]["num"]), int(ax["y"]["num"])
        x0, x1 = float(ax["x"]["start"]), float(ax["x"]["stop"])
        ytop, ybot = float(ax["y"]["start"]), float(ax["y"]["stop"])
        srid = 0
        for ref in doc["domain"].get("referencing", []):
            rid = ref.get("system", {}).get("id", "")
            if rid.startswith("EPSG:"):
                srid = int(rid[5:])
        bands = []
        for _name, rng in sorted(doc.get("ranges", {}).items()):
            arr = np.asarray(rng["values"], dtype=np.float64).reshape(
                rng.get("shape", [h, w]))
            bands.append(arr)
        sx = (x1 - x0) / w if w else 1.0
        sy = (ybot - ytop) / h if h else -1.0
        out.append(to_wkb(Raster(bands, [PT_64BF] * len(bands),
                                 [None] * len(bands), sx, sy, x0, ytop,
                                 0.0, 0.0, srid, shape=(h, w))))
    return pa.array(out, type=pa.binary())


@register_op("rast_asxyz", 1, "raster_exporter")
def rast_asxyz(col):
    """Raster WKB column → XYZ ASCII grid text (XYZDatatype.java names
    the format; its read/unparse are stubs in the reference, so this
    follows the public 'x y z' cell-center convention — see
    rastwkb.to_xyz)."""
    from .rastwkb import to_xyz
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else to_xyz(from_wkb(a)))
    return pa.array(out, type=pa.string())


@register_op("rast_fromxyz", 1, "raster_constructor")
def rast_fromxyz(col):
    """XYZ ASCII grid text column → raster WKB (see rastwkb.from_xyz)."""
    from .rastwkb import from_xyz
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else to_wkb(from_xyz(a)))
    return pa.array(out, type=pa.binary())


@register_op("rast_asasciigrid", 1, "raster_exporter")
def rast_asasciigrid(col):
    """Raster WKB column → ESRI ASCII grid (AAIGrid) text — the public
    GDAL/ArcInfo interchange format (no reference equivalent; rounds
    out the raster text-IO family beside XYZ/CoverageJSON). See
    rastwkb.to_asciigrid."""
    from .rastwkb import to_asciigrid
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else to_asciigrid(from_wkb(a)))
    return pa.array(out, type=pa.string())


@register_op("rast_fromasciigrid", 1, "raster_constructor")
def rast_fromasciigrid(col):
    """ESRI ASCII grid text column → raster WKB (xllcorner/xllcenter
    variants, NODATA_value; see rastwkb.from_asciigrid)."""
    from .rastwkb import from_asciigrid
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else to_wkb(from_asciigrid(a)))
    return pa.array(out, type=pa.binary())


# ---------------------------------------------------------------------------
# transform tail — Rescale / Rotation / Grayscale are stubs in the
# reference (raster/transform/Rescale.java, Rotation.java,
# Grayscale.java per SURVEY §2.8); semantics follow PostGIS
# ST_Rescale georeference math, world-file rotation composition and
# ITU-R BT.601 luma.
# ---------------------------------------------------------------------------

@register_op("rast_rescale", 3, "raster_transform")
def rast_rescale(col, scale_x, scale_y=None):
    """Rescale (reference stub): set new pixel scale; the grid is
    resampled nearest-neighbor so the world extent is preserved
    (PostGIS ST_Rescale semantics, nearest-neighbor only)."""
    sy = -abs(scale_x) if scale_y is None else scale_y

    def f(r):
        if r.scale_x == 0 or r.scale_y == 0 or not r.bands:
            return Raster(r.bands, r.pixtypes, r.nodata, scale_x, sy,
                          r.ip_x, r.ip_y, r.skew_x, r.skew_y, r.srid,
                          shape=r.shape)
        new_w = max(1, int(round(r.width * abs(r.scale_x / scale_x))))
        new_h = max(1, int(round(r.height * abs(r.scale_y / sy))))
        ridx = (np.arange(new_h) * r.height / new_h).astype(np.int64)
        cidx = (np.arange(new_w) * r.width / new_w).astype(np.int64)
        bands = [b[np.ix_(ridx, cidx)] for b in r.bands]
        return Raster(bands, r.pixtypes, r.nodata, scale_x, sy,
                      r.ip_x, r.ip_y, r.skew_x, r.skew_y, r.srid,
                      shape=(new_h, new_w))
    return _map_unary(col, f)


@register_op("rast_rotate", 2, "raster_transform")
def rast_rotate(col, theta):
    """Rotation (reference stub): rotate the georeference by theta
    radians about the upper-left corner — new affine matrix
    [[a b],[d e]] = R(theta) @ M, pixels untouched."""
    ct, st = np.cos(theta), np.sin(theta)

    def f(r):
        a = ct * r.scale_x - st * r.skew_y
        b = ct * r.skew_x - st * r.scale_y
        d = st * r.scale_x + ct * r.skew_y
        e = st * r.skew_x + ct * r.scale_y
        return Raster(r.bands, r.pixtypes, r.nodata, a, e,
                      r.ip_x, r.ip_y, b, d, r.srid, shape=r.shape)
    return _map_unary(col, f)


@register_op("rast_rotation", 1, "raster_attr")
def rast_rotation(col):
    """Rotation angle of the georeference in radians:
    atan2(skew_y, scale_x) (0 for an axis-aligned grid)."""
    return _map_scalar(col, lambda r: float(np.arctan2(r.skew_y,
                                                       r.scale_x)))


@register_op("rast_grayscale", 1, "raster_transform")
def rast_grayscale(col):
    """Grayscale (reference stub): ITU-R BT.601 luma of the first three
    bands (0.299 R + 0.587 G + 0.114 B) as a single 64BF band; 1-band
    rasters pass through as float."""
    def f(r):
        if len(r.bands) >= 3:
            luma = (0.299 * r.bands[0].astype(np.float64)
                    + 0.587 * r.bands[1].astype(np.float64)
                    + 0.114 * r.bands[2].astype(np.float64))
        elif r.bands:
            luma = r.bands[0].astype(np.float64)
        else:
            return r
        return _float_result(r, [luma])
    return _map_unary(col, f)


@register_op("rast_clip", 2, "raster_transform")
def rast_clip(col, geom_wkb, nodata_value=None, crop=True):
    """PostGIS-style ST_Clip (no reference counterpart — the reference
    stops at raster↔vector relations): pixels whose CENTER falls
    outside the polygon become nodata; ``crop=True`` also trims the
    grid to the pixel window of the geometry's bbox (georeference
    shifted accordingly). ``geom_wkb`` is one geometry (bytes) applied
    to every raster in the column, or a same-length sequence."""
    from ..geom.algorithms import points_in_polygon
    from ..geom.wkb import from_wkb as geom_from_wkb

    rasters = col.to_pylist()
    geoms = ([geom_wkb] * len(rasters)
             if isinstance(geom_wkb, (bytes, bytearray))
             else (geom_wkb.to_pylist() if hasattr(geom_wkb, "to_pylist")
                   else list(geom_wkb)))
    out = []
    for buf, gw in zip(rasters, geoms):
        if buf is None or gw is None:
            out.append(None)
            continue
        r = from_wkb(buf)
        g = geom_from_wkb(bytes(gw))
        bx0, by0, bx1, by1 = g.bounds()
        if r.is_empty or not np.isfinite(bx0):
            out.append(to_wkb(r))
            continue
        h, w = r.height, r.width
        cs, rs = r.world_to_raster(np.array([bx0, bx1, bx0, bx1]),
                                   np.array([by0, by1, by1, by0]))
        # tight center-containment window: pixel c's center sits at
        # c+0.5 in pixel space, so c ∈ [ceil(min-0.5), floor(max-0.5)]
        c0 = max(0, int(np.ceil(cs.min() - 0.5)))
        c1 = min(w - 1, int(np.floor(cs.max() - 0.5)))
        r0 = max(0, int(np.ceil(rs.min() - 0.5)))
        r1 = min(h - 1, int(np.floor(rs.max() - 0.5)))
        if not crop:
            c0, c1, r0, r1 = 0, w - 1, 0, h - 1
        if c1 < c0 or r1 < r0:
            ip_x, ip_y = r.raster_to_world(0, 0)
            out.append(to_wkb(Raster(
                [b[:0, :0] for b in r.bands], r.pixtypes, r.nodata,
                r.scale_x, r.scale_y, float(ip_x), float(ip_y),
                r.skew_x, r.skew_y, r.srid, shape=(0, 0))))
            continue
        cc, rr = np.meshgrid(np.arange(c0, c1 + 1, dtype=np.float64),
                             np.arange(r0, r1 + 1, dtype=np.float64))
        px, py = r.raster_to_world(cc.ravel() + 0.5, rr.ravel() + 0.5)
        inside = points_in_polygon(px, py, g, on_boundary=True) \
            .reshape(r1 - r0 + 1, c1 - c0 + 1)
        bands, nods = [], []
        for bi, b in enumerate(r.bands):
            nd = r.nodata[bi]
            if nd is None:
                nd = float(nodata_value) if nodata_value is not None \
                    else 0.0
            win = b[r0:r1 + 1, c0:c1 + 1].astype(np.float64).copy()
            win[~inside] = nd
            bands.append(win)
            nods.append(nd)
        ip_x, ip_y = r.raster_to_world(c0, r0)
        out.append(to_wkb(Raster(
            bands, [PT_64BF] * len(bands), nods, r.scale_x, r.scale_y,
            float(ip_x), float(ip_y), r.skew_x, r.skew_y, r.srid)))
    return pa.array(out, type=pa.binary())


# ---------------------------------------------------------------------------
# image egress/ingress — the reference DECLARES AsPNG/AsTIFF/AsBIL
# (raster/exporter/AsPNG.java:8, AsTIFF.java:11, AsBIL.java:3; AsPNG
# and AsTIFF are stubs) and a GeoTIFF datatype (GeoTIFFDatatype.java).
# Implemented here with pure-stdlib codecs (raster/imageio.py): PNG =
# zlib + the W3C filter spec, TIFF 6.0 baseline + OGC GeoTIFF keys.
# JPEG (AsJPG.java, also a reference stub) is the pure-numpy baseline
# T.81 codec in raster/jpegio.py — DCT as 8x8 matrix products,
# Annex-K tables, Huffman entropy coding in plain bit arithmetic.
# ---------------------------------------------------------------------------

@register_op("rast_aspng", 1, "raster_exporter")
def rast_aspng(col):
    """Raster WKB column → PNG bytes (uniform 8/16-bit unsigned bands,
    1-4 bands; georeference is not carried — use rast_astiff)."""
    from .imageio import raster_to_png
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else raster_to_png(from_wkb(a)))
    return pa.array(out, type=pa.binary())


@register_op("rast_frompng", 1, "raster_constructor")
def rast_frompng(col):
    """PNG bytes column → raster WKB (unit grid at the origin; set the
    georeference with rast_setscale/rast_setupperleft)."""
    from .imageio import png_to_raster
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else to_wkb(png_to_raster(a)))
    return pa.array(out, type=pa.binary())


@register_op("rast_astiff", 1, "raster_exporter")
def rast_astiff(col, compression="deflate"):
    """Raster WKB column → GeoTIFF bytes (georeference + EPSG carried
    via ModelPixelScale/Tiepoint/Transformation + GeoKeyDirectory)."""
    from .imageio import tiff_encode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else tiff_encode(from_wkb(a),
                                                      compression))
    return pa.array(out, type=pa.binary())


@register_op("rast_fromtiff", 1, "raster_constructor")
def rast_fromtiff(col):
    """(Geo)TIFF bytes column → raster WKB."""
    from .imageio import tiff_decode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else to_wkb(tiff_decode(a)))
    return pa.array(out, type=pa.binary())


@register_op("rast_asjpg", 1, "raster_exporter")
def rast_asjpg(col, quality=85, subsampling="444"):
    """Raster WKB column → baseline JPEG bytes (uniform 8BUI bands,
    1 or 3 bands; lossy-but-deterministic — see raster/jpegio.py).
    Closes the reference's stubbed AsJPG (raster/exporter/AsJPG.java)."""
    from .jpegio import jpeg_encode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        if a is None:
            out.append(None)
            continue
        r = from_wkb(a)
        if len(r.bands) not in (1, 3) or any(pt != PT_8BUI
                                             for pt in r.pixtypes):
            raise ValueError("JPEG needs 1 or 3 uniform 8BUI bands, got "
                             f"{len(r.bands)} of {r.pixtypes}")
        arr = (r.bands[0].astype(np.uint8) if len(r.bands) == 1 else
               np.stack([b.astype(np.uint8) for b in r.bands], axis=-1))
        out.append(jpeg_encode(arr, quality=quality,
                               subsampling=subsampling))
    return pa.array(out, type=pa.binary())


@register_op("rast_fromjpg", 1, "raster_constructor")
def rast_fromjpg(col):
    """Baseline JPEG bytes column → raster WKB (unit grid at the
    origin; set the georeference with rast_setscale/rast_setupperleft)."""
    from .jpegio import jpeg_decode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        if a is None:
            out.append(None)
            continue
        arr = jpeg_decode(a)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        bands = [arr[:, :, i] for i in range(arr.shape[2])]
        out.append(to_wkb(Raster(bands, [PT_8BUI] * len(bands),
                                 [None] * len(bands), 1.0, -1.0,
                                 0.0, 0.0, 0.0, 0.0, 0,
                                 shape=arr.shape[:2])))
    return pa.array(out, type=pa.binary())


@register_op("rast_asgif", 1, "raster_exporter")
def rast_asgif(col):
    """Raster WKB column → GIF89a bytes (pure-stdlib LZW codec,
    raster/gifio.py). 1 uniform 8BUI band, encoded as grayscale
    (identity 256-gray palette) — lossless, unlike JPEG."""
    from .gifio import gif_encode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        if a is None:
            out.append(None)
            continue
        r = from_wkb(a)
        if len(r.bands) != 1 or r.pixtypes[0] != PT_8BUI:
            raise ValueError("GIF needs exactly one 8BUI band, got "
                             f"{len(r.bands)} of {r.pixtypes}")
        out.append(gif_encode(r.bands[0].astype(np.uint8)))
    return pa.array(out, type=pa.binary())


@register_op("rast_fromgif", 1, "raster_constructor")
def rast_fromgif(col, mode="indexed"):
    """GIF bytes column → raster WKB (unit grid at the origin).

    mode="indexed" (default): the palette INDEX plane as one 8BUI band
    — the lossless inverse of rast_asgif (grayscale palette = identity,
    so indices ARE the gray values). mode="rgb": first frame composed
    to three 8BUI bands through the palette."""
    from .gifio import gif_decode, gif_decode_indexed
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        if a is None:
            out.append(None)
            continue
        if mode == "indexed":
            idx, _pal = gif_decode_indexed(a)
            bands = [idx]
        else:
            rgb = gif_decode(a)
            bands = [rgb[:, :, i] for i in range(3)]
        out.append(to_wkb(Raster(bands, [PT_8BUI] * len(bands),
                                 [None] * len(bands), 1.0, -1.0,
                                 0.0, 0.0, 0.0, 0.0, 0,
                                 shape=bands[0].shape)))
    return pa.array(out, type=pa.binary())


@register_op("rast_asnetcdf", 1, "raster_exporter")
def rast_asnetcdf(col):
    """Raster WKB column → NetCDF-3 classic bytes (CDF-1; bands as
    variables, georeference as global attributes). Closes the
    reference's NetCDFDatatype (datatype/raster/NetCDFDatatype.java:23,
    a stub throwing UnsupportedOperationException)."""
    from .netcdfio import nc_encode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else nc_encode(from_wkb(a)))
    return pa.array(out, type=pa.binary())


@register_op("rast_fromnetcdf", 1, "raster_constructor")
def rast_fromnetcdf(col):
    """NetCDF-3 classic bytes column → raster WKB (general classic
    reader: CDF-1/CDF-2, fixed + record variables; every 2-D numeric
    variable becomes a band)."""
    from .netcdfio import nc_decode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else to_wkb(nc_decode(a)))
    return pa.array(out, type=pa.binary())


@register_op("rast_asgmlcov", 1, "raster_exporter")
def rast_asgmlcov(col):
    """Raster WKB column → OGC GMLCOV RectifiedGridCoverage XML string.
    Closes the reference's GMLCOVDatatype
    (datatype/raster/GMLCOVDatatype.java:17, a stub returning null)."""
    from .gmlcovio import gmlcov_encode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else gmlcov_encode(from_wkb(a)))
    return pa.array(out, type=pa.string())


@register_op("rast_fromgmlcov", 1, "raster_constructor")
def rast_fromgmlcov(col):
    """GMLCOV RectifiedGridCoverage XML column → raster WKB
    (namespace-lenient parse; georeference from the RectifiedGrid)."""
    from .gmlcovio import gmlcov_decode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else to_wkb(gmlcov_decode(a)))
    return pa.array(out, type=pa.binary())


@register_op("rast_asbil", 1, "raster_exporter")
def rast_asbil(col):
    """Raster WKB column → ESRI BIL raw bytes (band-interleaved-by-
    line, little-endian; headerless per the format — shape/type travel
    with the raster metadata)."""
    from .imageio import bil_encode
    out = []
    for a in (col.to_pylist() if hasattr(col, "to_pylist") else col):
        out.append(None if a is None else bil_encode(from_wkb(a)))
    return pa.array(out, type=pa.binary())
