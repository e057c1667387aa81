"""OGC GML Coverage (GMLCOV) raster codec — pure stdlib.

Closes the reference's GMLCOVDatatype surface
(datatype/raster/GMLCOVDatatype.java:17 — a stub returning null).
Implements the OGC GML 3.2.1 RectifiedGridCoverage encoding per the
public GMLCOV 1.0 / GML 3.2.1 specs: domainSet = RectifiedGrid
(limits + origin + offsetVectors carry the affine georeference),
rangeSet = DataBlock tupleList (tuples space-separated, components
comma-separated — GML 3.2.1 §10.1.4.2), rangeType = SWE DataRecord
(one field per band; nodata via swe:nilValues, pixel type via the
field definition URI suffix).

Pixel order: row-major, x fastest (sequenceRule Linear, axisOrder
"+1 +2" with axisLabels "x y"). The decoder is namespace-lenient
(matches on local names) so externally produced GMLCOV parses too.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from .rastwkb import PIXTYPE_NAMES, Raster

__all__ = ["gmlcov_encode", "gmlcov_decode"]

_PT_BY_NAME = {v: k for k, v in PIXTYPE_NAMES.items()}
_PT_DTYPE = {"1BB": "u1", "2BUI": "u1", "4BUI": "u1", "8BSI": "i1",
             "8BUI": "u1", "16BSI": "i2", "16BUI": "u2", "32BSI": "i4",
             "32BUI": "u4", "32BF": "f4", "64BF": "f8"}


def _fmt(v: float) -> str:
    f = float(v)
    return repr(int(f)) if f == int(f) and abs(f) < 1e15 else repr(f)


def gmlcov_encode(r: Raster, cov_id: str = "c1") -> str:
    """Raster → GMLCOV RectifiedGridCoverage XML string."""
    h, w = r.height, r.width
    nb = len(r.bands)
    fields = []
    for i in range(nb):
        ptname = PIXTYPE_NAMES.get(r.pixtypes[i], "64BF")
        nod = r.nodata[i] if i < len(r.nodata) else None
        nil = ("<swe:nilValues><swe:NilValues>"
               f'<swe:nilValue reason="urn:ogc:def:nil:OGC:missing">'
               f"{_fmt(nod)}</swe:nilValue>"
               "</swe:NilValues></swe:nilValues>") if nod is not None else ""
        fields.append(
            f'<swe:field name="band{i + 1}">'
            f'<swe:Quantity definition="urn:geoflow:def:pixtype:{ptname}">'
            f"{nil}<swe:uom code=\"1\"/></swe:Quantity></swe:field>")
    if nb:
        flat = np.stack([np.asarray(b).reshape(h * w) for b in r.bands],
                        axis=1)
        tuples = " ".join(",".join(_fmt(v) for v in row) for row in flat)
    else:
        tuples = ""
    srs = f' srsName="http://www.opengis.net/def/crs/EPSG/0/{r.srid}"' \
        if r.srid else ""
    return (
        '<gmlcov:RectifiedGridCoverage '
        'xmlns:gml="http://www.opengis.net/gml/3.2" '
        'xmlns:gmlcov="http://www.opengis.net/gmlcov/1.0" '
        'xmlns:swe="http://www.opengis.net/swe/2.0" '
        f'gml:id="{cov_id}">'
        "<gml:domainSet>"
        f'<gml:RectifiedGrid dimension="2" gml:id="{cov_id}-grid"{srs}>'
        "<gml:limits><gml:GridEnvelope>"
        "<gml:low>0 0</gml:low>"
        f"<gml:high>{w - 1} {h - 1}</gml:high>"
        "</gml:GridEnvelope></gml:limits>"
        "<gml:axisLabels>x y</gml:axisLabels>"
        f'<gml:origin><gml:Point gml:id="{cov_id}-origin"{srs}>'
        f"<gml:pos>{_fmt(r.ip_x)} {_fmt(r.ip_y)}</gml:pos>"
        "</gml:Point></gml:origin>"
        f"<gml:offsetVector>{_fmt(r.scale_x)} {_fmt(r.skew_y)}"
        "</gml:offsetVector>"
        f"<gml:offsetVector>{_fmt(r.skew_x)} {_fmt(r.scale_y)}"
        "</gml:offsetVector>"
        "</gml:RectifiedGrid></gml:domainSet>"
        "<gml:rangeSet><gml:DataBlock>"
        "<gml:rangeParameters/>"
        f"<gml:tupleList>{tuples}</gml:tupleList>"
        "</gml:DataBlock></gml:rangeSet>"
        "<gmlcov:rangeType><swe:DataRecord>"
        + "".join(fields) +
        "</swe:DataRecord></gmlcov:rangeType>"
        "</gmlcov:RectifiedGridCoverage>")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find(el, name):
    for c in el.iter():
        if _local(c.tag) == name:
            return c
    return None


def _findall(el, name):
    return [c for c in el.iter() if _local(c.tag) == name]


def gmlcov_decode(xml_text: str) -> Raster:
    """GMLCOV RectifiedGridCoverage XML → Raster."""
    root = ET.fromstring(xml_text)
    grid = _find(root, "RectifiedGrid")
    if grid is None:
        raise ValueError("gmlcov: no RectifiedGrid domainSet")
    low = [int(v) for v in _find(grid, "low").text.split()]
    high = [int(v) for v in _find(grid, "high").text.split()]
    w = high[0] - low[0] + 1
    h = high[1] - low[1] + 1
    pos = _find(grid, "pos")
    ip_x, ip_y = ([float(v) for v in pos.text.split()][:2]
                  if pos is not None else (0.0, 0.0))
    offs = [[float(v) for v in o.text.split()]
            for o in _findall(grid, "offsetVector")]
    scale_x, skew_y = offs[0][:2] if offs else (1.0, 0.0)
    skew_x, scale_y = offs[1][:2] if len(offs) > 1 else (0.0, -1.0)
    srid = 0
    srs_el = grid if grid.get("srsName") else _find(grid, "Point")
    srs = (srs_el.get("srsName") or "") if srs_el is not None else ""
    for sep in ("/", ":"):
        tail = srs.rsplit(sep, 1)[-1]
        if tail.isdigit():
            srid = int(tail)
            break
    # rangeType: per-band pixel type + nodata
    ptnames, nodata = [], []
    for f in _findall(root, "field"):
        q = _find(f, "Quantity")
        definition = (q.get("definition") or "") if q is not None else ""
        ptnames.append(definition.rsplit(":", 1)[-1]
                       if definition.rsplit(":", 1)[-1] in _PT_BY_NAME
                       else "64BF")
        nil = _find(f, "nilValue")
        nodata.append(float(nil.text) if nil is not None
                      and nil.text else None)
    tl = _find(root, "tupleList")
    text = (tl.text or "").strip() if tl is not None else ""
    if not text:
        return Raster([], [], [], scale_x, scale_y, ip_x, ip_y,
                      skew_x, skew_y, srid, shape=(h, w))
    rows = [t.split(",") for t in text.split()]
    nb = len(rows[0])
    if not ptnames:
        ptnames = ["64BF"] * nb
        nodata = [None] * nb
    vals = np.asarray(rows, dtype=np.float64)
    if vals.shape != (h * w, nb):
        raise ValueError(f"gmlcov: tupleList size {vals.shape} != "
                         f"grid {h}x{w} x {nb} bands")
    bands, pts = [], []
    for i in range(nb):
        ptname = ptnames[i] if i < len(ptnames) else "64BF"
        arr = vals[:, i].reshape(h, w).astype(_PT_DTYPE[ptname])
        bands.append(arr)
        pts.append(_PT_BY_NAME[ptname])
    while len(nodata) < nb:
        nodata.append(None)
    return Raster(bands, pts, nodata[:nb], scale_x, scale_y, ip_x, ip_y,
                  skew_x, skew_y, srid)
