from .types import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING,
                    MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, DEFAULT_SRID,
                    Geometry)
from .wkt import from_wkt, to_wkt, to_wkt_literal
from .wkb import from_wkb, to_wkb, points_to_wkb, wkb_to_points
from .strtree import STRtree
from . import algorithms, greatcircle

__all__ = [
    "Geometry", "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
    "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION", "DEFAULT_SRID",
    "from_wkt", "to_wkt", "to_wkt_literal", "from_wkb", "to_wkb",
    "points_to_wkb", "wkb_to_points", "STRtree", "algorithms", "greatcircle",
]
