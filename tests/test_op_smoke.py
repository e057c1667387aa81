"""Every registered arity-1 operator runs once on a type-appropriate
input without crashing (latent-crash net: the MinimumBoundingCircleCenter
unpack bug survived 250 tests because nothing ever CALLED it)."""

import numpy as np
import pyarrow as pa

import geoflow.raster  # noqa: F401  (registers rast_* ops)
from geoflow.geom.wkb import to_wkb
from geoflow.geom.wkt import from_wkt
from geoflow.ops import REGISTRY, get_op
from geoflow.raster import Raster, to_wkb as rast_to_wkb

GEO = pa.array([to_wkb(from_wkt(w)) for w in (
    "POINT(1 2)",
    "LINESTRING(0 0,3 1,5 4)",
    "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((5 5,7 5,7 8,5 8,5 5)))",
    "MULTIPOINT((1 1),(2 2))",
    "POINT Z(1 2 3)",
    "GEOMETRYCOLLECTION(POINT(9 9),LINESTRING(0 0,1 1))",
)], type=pa.binary())
NUM = pa.array([0.5, 1.0, 100.0, -3.25])
_r = Raster([np.arange(16, dtype=np.uint8).reshape(4, 4)], [4], [None],
            1.0, -1.0, 0.0, 4.0, 0.0, 0.0, 4326)
RAST = pa.array([rast_to_wkb(_r)], type=pa.binary())

# ops whose single argument is NOT a geometry-WKB column
_NUMERIC = {n for n in REGISTRY if n.endswith("_to_meter")
            or n.startswith("meter_to_")} | {"to_degrees", "to_radians"}
_STRING_IN = {
    "st_geomfromtext": "POINT(1 2)",
    "st_pointfromtext": "POINT(1 2)",
    "st_linefromtext": "LINESTRING(0 0,1 1)",
    "st_polygonfromtext": "POLYGON((0 0,1 0,1 1,0 1,0 0))",
    "st_mpointfromtext": "MULTIPOINT((1 1))",
    "st_mlinefromtext": "MULTILINESTRING((0 0,1 1))",
    "st_mpolyfromtext": "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)))",
    "st_geomcollfromtext": "GEOMETRYCOLLECTION(POINT(1 2))",
    "st_geomfromgeojson":
        '{"type": "Point", "coordinates": [1.0, 2.0]}',
    "st_geomfromgml":
        "<gml:Point><gml:pos>1 2</gml:pos></gml:Point>",
    "st_geomfromkml":
        "<Point><coordinates>1,2</coordinates></Point>",
    "st_geomfrompolyshape": "0kfcpHixiq@",
    "st_pointfromgeohash": "u4pruydqqvj",
    "st_linefromencodedpolyline": "_p~iF~ps|U_ulLnnqC",
    "srid_to_epsg": "<http://www.opengis.net/def/crs/EPSG/0/4326>",
    "st_geomfromgpx": "<gpx><wpt lat='1.5' lon='2.5'/></gpx>",
    "st_geomfromgeouri": "geo:1.5,2.5",
    "st_geomfromosm": to_wkb(from_wkt("POINT(1 2)")).hex(),
    "rast_fromxyz": "0.5 0.5 1\n1.5 0.5 2\n0.5 1.5 3\n1.5 1.5 4",
}
_TYPED_WKB = {  # ops that validate their input's geometry type
    "st_pointfromwkb": "POINT(3 4)",
    "st_linefromwkb": "LINESTRING(0 0,1 1)",
    "st_polygonfromwkb": "POLYGON((0 0,1 0,1 1,0 1,0 0))",
    "st_makepolygon": "LINESTRING(0 0,2 0,2 2,0 2,0 0)",
    "st_linefrommultipoint": "MULTIPOINT((0 0),(1 1))",
    "st_makeline": None,  # list<wkb> column, built below
    "st_straightskeleton": "POLYGON((0 0,2 0,2 2,0 2,0 0))",
}
_COVJSON = {"rast_fromcoveragejson"}


def test_every_unary_op_smokes():
    failures = []
    for name in sorted(REGISTRY):
        op = get_op(name)
        if op.arity != 1:
            continue
        try:
            if name in _NUMERIC:
                op.fn(NUM)
            elif name in _STRING_IN:
                op.fn(pa.array([_STRING_IN[name]], type=pa.string()))
            elif name == "st_makeline":
                pts = pa.array([[to_wkb(from_wkt("POINT(0 0)")),
                                 to_wkb(from_wkt("POINT(1 1)"))]],
                               type=pa.list_(pa.binary()))
                op.fn(pts)
            elif name in _TYPED_WKB:
                col = pa.array([to_wkb(from_wkt(_TYPED_WKB[name]))],
                               type=pa.binary())
                op.fn(col)
            elif name in _COVJSON:
                cj = get_op("rast_ascoveragejson").fn(RAST)
                op.fn(cj)
            elif name.startswith("rast_"):
                op.fn(RAST)
            else:
                op.fn(GEO)
        except NotImplementedError:
            pass        # honest documented guards
        except Exception as e:  # noqa: BLE001
            failures.append((name, type(e).__name__, str(e)[:80]))
    assert not failures, failures
