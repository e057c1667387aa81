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
    "st_geomfromtopojson":
        '{"type": "Topology", "objects": {"g": {"type": "LineString",'
        ' "arcs": [0]}}, "arcs": [[[0, 0], [1, 1]]]}',
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
_IMGBYTES = {"rast_frompng": "rast_aspng", "rast_fromtiff": "rast_astiff",
             "rast_fromjpg": "rast_asjpg",
             "rast_fromnetcdf": "rast_asnetcdf",
             "rast_fromgmlcov": "rast_asgmlcov",
             "rast_fromgif": "rast_asgif",
             "rast_fromasciigrid": "rast_asasciigrid"}


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
            elif name in _IMGBYTES:
                op.fn(get_op(_IMGBYTES[name]).fn(RAST))
            elif name.startswith("rast_"):
                op.fn(RAST)
            else:
                op.fn(GEO)
        except NotImplementedError:
            pass        # honest documented guards
        except Exception as e:  # noqa: BLE001
            failures.append((name, type(e).__name__, str(e)[:80]))
    assert not failures, failures


def test_every_multiarg_op_smokes():
    """Every arity>=2 operator runs on SOME plausible argument
    combination without crashing (the registry-level net the unary
    smoke provides, extended: an op whose wrapper/arity/argument
    unpacking is broken crashes on every combination)."""
    LINE = pa.array([to_wkb(from_wkt("LINESTRING(0 0,3 1,5 4,6 0)"))] * 4,
                    type=pa.binary())
    PT = pa.array([to_wkb(from_wkt("POINT(1 2)"))] * 4, type=pa.binary())
    G4 = pa.array([GEO[i].as_py() for i in range(4)], type=pa.binary())
    BOXES = tuple(pa.array(v) for v in
                  ([0.0, 1.0, 2.0, 5.0], [0.0, 1.0, 2.0, 5.0],
                   [3.0, 4.0, 6.0, 9.0], [2.0, 3.0, 7.0, 8.0]))
    TS = pa.array(np.array([0, 10, 20, 30], dtype="datetime64[us]"))
    TE = pa.array(np.array([5, 15, 25, 35], dtype="datetime64[us]"))
    STR4 = pa.array(["T*****FF*"] * 4)
    RAST2 = pa.array([RAST[0].as_py()], type=pa.binary())

    def combos(arity):
        base2 = [
            (G4, G4), (LINE, PT), (PT, G4), (G4, 1), (G4, 0.5),
            (LINE, 0.5), (G4, STR4), (G4, "T*****FF*"),
            (BOXES[0], BOXES[1]) if False else (G4, 2.0),
            (RAST2, RAST2), (RAST2, 2.0), (RAST2, 1),
            ((TS, TE), (TS, TE)), (NUM, NUM), (G4, "name"),
        ]
        if arity == 2:
            return base2
        pads = [0.5, 1, 2.0, 3, "x", 0.25]
        out = []
        for c in base2:
            out.append(tuple(list(c) + pads[:arity - 2]))
        # numeric-only constructors (st_makeellipse etc.)
        out.append(tuple([NUM] + pads[:arity - 1]))
        out.append(tuple([G4] + pads[:arity - 1]))
        return out

    POLY4 = pa.array([to_wkb(from_wkt(
        "POLYGON((0 0,4 0,4 4,0 4,0 0))"))] * 4, type=pa.binary())
    POLY_HOLE = pa.array([to_wkb(from_wkt(
        "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))"))] * 4,
        type=pa.binary())
    PT2 = pa.array([to_wkb(from_wkt("POINT(5 7)"))] * 4, type=pa.binary())
    PT3 = pa.array([to_wkb(from_wkt("POINT(0 9)"))] * 4, type=pa.binary())
    RING = pa.array([to_wkb(from_wkt(
        "LINESTRING(1.2 1.2,1.8 1.2,1.8 1.8,1.2 1.8,1.2 1.2)"))] * 4,
        type=pa.binary())
    LINE_M = pa.array([to_wkb(from_wkt(
        "LINESTRING M(0 0 0,2 0 5,4 0 10)"))] * 4, type=pa.binary())
    LINE_Z = pa.array([to_wkb(from_wkt(
        "LINESTRING Z(0 0 0,2 0 5,4 0 10)"))] * 4, type=pa.binary())
    GH = pa.array(["u4pruyd"] * 4)
    from geoflow.ops.registry import get_op as _g
    SOLID = _g("st_extrude").fn(POLY4, 0.0, 2.0)
    NUM2 = pa.array([10.5, 11.0, 110.0, 6.75])
    _SPECIAL = {
        "st_azimuth": (PT, PT2),
        "st_angle": (PT, PT2, PT3),
        "st_affine": (G4, 1.0, 0.0, 0.0, 1.0, 2.0, 3.0),
        "st_makeenvelope": (NUM, NUM, NUM2, NUM2),
        "st_asmvtgeom": (POLY4, (0.0, 0.0, 16.0, 16.0), 4096, 256, True),
        "st_geomfromgeohash": (GH, 5),
        "st_transform": (G4, 3857),
        "st_swapordinates": (G4, "x", "y"),
        "st_generatepoints": (POLY4, 5, 1),
        "st_pointinsidecircle": (PT, 1.0, 2.0, 5.0),
        "st_project": (PT, 1000.0, 0.5),
        "st_filterbyt": (LINE_M, 0.0, 100.0),
        "st_locatebetween": (LINE_M, 2.0, 8.0),
        "st_locatebetweenelevations": (LINE_Z, 2.0, 8.0),
        "st_removepoint": (LINE, 1),
        "st_setpoint": (LINE, PT, 1),
        "st_addpoint": (LINE, PT, 1),
        "st_interiorringn": (POLY_HOLE, 0),
        "st_addring": (POLY4, RING),
        "st_makecircle": (PT, 1.0, 8),
        "st_makeellipse": (PT, 2.0, 1.0, 8),
        "st_makepointm": (NUM, NUM, NUM),
        "st_makepointt": (NUM, NUM, NUM),
        "st_makebox2d": (PT, PT2),
        "st_makebox3d": (PT, PT2),
        "st_intersection3d": (SOLID, SOLID),
        "st_difference3d": (SOLID, SOLID),
        "rast_bandnodata": (RAST2, 0),
        "rast_maxvalue": (RAST2, 0),
        "rast_minvalue": (RAST2, 0),
        "rast_summarystats": (RAST2, 0),
        "rast_crop": (RAST2, 1, 1, 3, 3),
        "rast_resize": (RAST2, 2, 2),
        "rast_retile": (RAST2, 2, 2),
        "rast_setgeoreference": (RAST2, 0.0, 4.0, 1.0, -1.0, 0.0, 0.0),
        "rast_clip": (RAST2, POLY4),
        "rast_smallerintersects": (RAST2, RAST2, 0, 1.0),
        "rast_greaterintersects": (RAST2, RAST2, 0, 1.0),
        "rast_valueintersects": (RAST2, RAST2, 0, 1.0),
        "rast_medianintersects": (RAST2, RAST2, 0, 1.0),
    }

    failures = []
    for name in sorted(REGISTRY):
        op = get_op(name)
        if op.arity < 2:
            continue
        if name in _SPECIAL:
            try:
                op.fn(*_SPECIAL[name])
            except NotImplementedError:
                pass
            except Exception as e:  # noqa: BLE001
                failures.append((name, op.arity,
                                 [f"{type(e).__name__}: {e}"[:70]]))
            continue
        if name.startswith("bbox_"):
            try:
                op.fn((BOXES[0], BOXES[1], BOXES[2], BOXES[3]),
                      (BOXES[3], BOXES[2], BOXES[1], BOXES[0]))
                continue
            except NotImplementedError:
                continue
            except Exception:
                pass  # fall through to generic combos
        ok = False
        errs = []
        for args in combos(op.arity):
            # interval ops take ((start, end)) column pairs
            flat = []
            for a in args:
                flat.extend(a) if isinstance(a, tuple) else flat.append(a)
            if len(flat) != op.arity:
                continue
            try:
                op.fn(*flat)
                ok = True
                break
            except NotImplementedError:
                ok = True
                break
            except Exception as e:  # noqa: BLE001
                errs.append(f"{type(e).__name__}")
        if not ok:
            failures.append((name, op.arity, sorted(set(errs))[:3]))
    assert not failures, failures
