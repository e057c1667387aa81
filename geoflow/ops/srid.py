"""SRID / CRS operators (geometry/srid/*.java + Transform.java)."""

from __future__ import annotations

import pyarrow as pa

from ..geom import crs
from ..geom.wkt import srid_from_uri, uri_from_srid
from .kernels import decode_geoms, unary_geom
from .registry import register_op


@register_op("st_srid", 1, "srid")
def st_srid(col):
    """SRID of each geometry."""
    out = [g.srid if g is not None else None for g in decode_geoms(col)]
    return pa.array(out, type=pa.int32())


@register_op("st_setsrid", 2, "srid")
def st_setsrid(col, srid):
    """SetSRID.java:18 — relabel, no reprojection."""
    def f(g):
        def set_(x):
            x.srid = srid
            if x.parts is not None:
                for p in x.parts:
                    set_(p)
        set_(g)
        return g
    return unary_geom(col, f)


@register_op("st_transform", 2, "srid")
def st_transform(col, dst_epsg):
    """Transform.java:28 — reproject (4326 / 3857 / UTM 326xx-327xx;
    Krüger-series TM, see geom/crs.py)."""
    return unary_geom(col, lambda g: crs.transform_geom(g, dst_epsg))


@register_op("st_buffer_meters", 2, "srid")
def st_buffer_meters(col, dist_m):
    """Metric buffer via centroid-UTM round-trip
    (GeometryWrapper.java:409-476 semantics)."""
    return unary_geom(col, lambda g: crs.buffer_meters(g, dist_m))


@register_op("srid_to_epsg", 1, "srid")
def srid_to_epsg(col):
    """SRIDToEPSG.java:8 — URI string → epsg int."""
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    return pa.array([srid_from_uri(v) if v is not None else None
                     for v in vals], type=pa.int32())


@register_op("epsg_to_srid", 1, "srid")
def epsg_to_srid(col):
    """EPSGToSRID.java:6 — epsg int → URI string."""
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    return pa.array([uri_from_srid(v) if v is not None else None
                     for v in vals], type=pa.string())


@register_op("st_utmzone", 1, "srid")
def st_utmzone(col):
    """Centroid UTM zone EPSG (GeometryWrapper.java:456-476)."""
    from ..geom import algorithms as alg
    out = []
    for g in decode_geoms(col):
        if g is None or g.is_empty:
            out.append(None)
            continue
        cx, cy = alg.centroid(g)
        out.append(crs.utm_zone_epsg(cx, cy))
    return pa.array(out, type=pa.int32())


@register_op("st_epsgtowkt", 1, "srid")
def st_epsgtowkt(col):
    """EPSGToWKT.java:8 is a reference stub; EPSG int column → OGC WKT1
    strings from the declarative table in geom/crswkt.py (geographic
    aliases emit their datum-equivalent canonical geographic CRS).
    Unsupported codes yield null."""
    from ..geom.crswkt import epsg_to_wkt
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for v in vals:
        try:
            out.append(None if v is None else epsg_to_wkt(int(v)))
        except ValueError:
            out.append(None)
    return pa.array(out, type=pa.string())


@register_op("st_sridtowkt", 1, "srid")
def st_sridtowkt(col):
    """SRIDToWKT.java:10 is a reference stub; SRS URI string column →
    WKT1 via srid_from_uri + epsg_to_wkt. Unsupported → null."""
    from ..geom.crswkt import epsg_to_wkt
    vals = col.to_pylist() if hasattr(col, "to_pylist") else col
    out = []
    for v in vals:
        try:
            out.append(None if v is None
                       else epsg_to_wkt(int(srid_from_uri(v))))
        except (ValueError, TypeError):
            out.append(None)
    return pa.array(out, type=pa.string())
