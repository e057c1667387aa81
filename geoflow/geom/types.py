"""Geometry value model.

The reference wraps every geometry in a ``GeometryWrapper`` holding a JTS
``Geometry`` plus SRS + dimension info
(/root/reference/src/main/io/github/galbiston/geosparql_jena/implementation/GeometryWrapper.java:67-131).
Here a geometry is a small Python object over numpy coordinate arrays; the
*columnar* form used in Ray Data pipelines is a WKB ``binary`` column plus an
optional ``srid`` column — these objects only materialize inside map_batches
kernels.

Coordinate layout: every coords array is float64 with shape (n, ndim),
ndim in {2, 3, 4}; ``has_z`` / ``has_m`` disambiguate XYZ vs XYM for ndim=3.
"""

from __future__ import annotations

import numpy as np

# geometry type codes (match WKB integer codes)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
NAME_TYPES = {v.upper(): k for k, v in TYPE_NAMES.items()}

# default SRID: CRS84 / WGS84 lon-lat (GeometryWrapper.java:123-125)
DEFAULT_SRID = 4326


class Geometry:
    """A parsed geometry: type code + coordinate payload.

    payload by type:
      POINT              coords (ndim,)  (empty -> (0,) size-0 array)
      LINESTRING         coords (n, ndim)
      POLYGON            rings: list[(n, ndim)] (first = exterior)
      MULTI*/COLLECTION  parts: list[Geometry]
    """

    __slots__ = ("type", "coords", "rings", "parts", "has_z", "has_m", "srid")

    def __init__(self, type_, coords=None, rings=None, parts=None,
                 has_z=False, has_m=False, srid=DEFAULT_SRID):
        self.type = type_
        self.coords = coords
        self.rings = rings
        self.parts = parts
        self.has_z = has_z
        self.has_m = has_m
        self.srid = srid

    # ---- constructors -------------------------------------------------
    @staticmethod
    def point(x, y, z=None, m=None, srid=DEFAULT_SRID):
        vals = [x, y]
        if z is not None:
            vals.append(z)
        if m is not None:
            vals.append(m)
        return Geometry(POINT, coords=np.asarray(vals, dtype=np.float64),
                        has_z=z is not None, has_m=m is not None, srid=srid)

    @staticmethod
    def linestring(coords, has_z=False, has_m=False, srid=DEFAULT_SRID):
        return Geometry(LINESTRING, coords=np.asarray(coords, dtype=np.float64),
                        has_z=has_z, has_m=has_m, srid=srid)

    @staticmethod
    def polygon(rings, has_z=False, has_m=False, srid=DEFAULT_SRID):
        return Geometry(POLYGON,
                        rings=[np.asarray(r, dtype=np.float64) for r in rings],
                        has_z=has_z, has_m=has_m, srid=srid)

    @staticmethod
    def multi(type_, parts, srid=DEFAULT_SRID):
        hz = any(p.has_z for p in parts)
        hm = any(p.has_m for p in parts)
        return Geometry(type_, parts=list(parts), has_z=hz, has_m=hm, srid=srid)

    @staticmethod
    def empty(type_, srid=DEFAULT_SRID):
        if type_ == POINT:
            return Geometry(POINT, coords=np.empty((0,), dtype=np.float64), srid=srid)
        if type_ == LINESTRING:
            return Geometry(LINESTRING, coords=np.empty((0, 2), dtype=np.float64), srid=srid)
        if type_ == POLYGON:
            return Geometry(POLYGON, rings=[], srid=srid)
        return Geometry(type_, parts=[], srid=srid)

    # ---- basic properties --------------------------------------------
    @property
    def type_name(self) -> str:
        return TYPE_NAMES[self.type]

    @property
    def ndim(self) -> int:
        return 2 + int(self.has_z) + int(self.has_m)

    @property
    def is_empty(self) -> bool:
        if self.type == POINT:
            return self.coords.size == 0
        if self.type == LINESTRING:
            return len(self.coords) == 0
        if self.type == POLYGON:
            return len(self.rings) == 0
        return len(self.parts) == 0 or all(p.is_empty for p in self.parts)

    def coord_blocks(self):
        """Yield every (n, ndim) coordinate array in this geometry."""
        if self.type == POINT:
            if self.coords.size:
                yield self.coords.reshape(1, -1)
        elif self.type == LINESTRING:
            if len(self.coords):
                yield self.coords
        elif self.type == POLYGON:
            yield from self.rings
        else:
            for p in self.parts:
                yield from p.coord_blocks()

    def all_coords(self) -> np.ndarray:
        blocks = list(self.coord_blocks())
        if not blocks:
            return np.empty((0, self.ndim), dtype=np.float64)
        return np.concatenate([b for b in blocks], axis=0)

    def bounds(self):
        """(xmin, ymin, xmax, ymax); NaNs for empty geometry."""
        c = self.all_coords()
        if len(c) == 0:
            return (np.nan, np.nan, np.nan, np.nan)
        return (float(c[:, 0].min()), float(c[:, 1].min()),
                float(c[:, 0].max()), float(c[:, 1].max()))

    def map_coords(self, fn) -> "Geometry":
        """Return a copy with fn applied to every (n, ndim) coords array."""
        if self.type == POINT:
            if self.coords.size == 0:
                return Geometry.empty(POINT, self.srid)
            out = fn(self.coords.reshape(1, -1))[0]
            return Geometry(POINT, coords=np.asarray(out, dtype=np.float64),
                            has_z=self.has_z, has_m=self.has_m, srid=self.srid)
        if self.type == LINESTRING:
            return Geometry(LINESTRING, coords=np.asarray(fn(self.coords), dtype=np.float64),
                            has_z=self.has_z, has_m=self.has_m, srid=self.srid)
        if self.type == POLYGON:
            return Geometry(POLYGON, rings=[np.asarray(fn(r), dtype=np.float64) for r in self.rings],
                            has_z=self.has_z, has_m=self.has_m, srid=self.srid)
        return Geometry(self.type, parts=[p.map_coords(fn) for p in self.parts],
                        has_z=self.has_z, has_m=self.has_m, srid=self.srid)

    def __repr__(self):
        from .wkt import to_wkt
        w = to_wkt(self)
        if len(w) > 80:
            w = w[:77] + "..."
        return f"<Geometry {w} srid={self.srid}>"

    def __eq__(self, other):
        if not isinstance(other, Geometry):
            return NotImplemented
        from .wkb import to_wkb
        return to_wkb(self) == to_wkb(other) and self.srid == other.srid

    def __hash__(self):
        from .wkb import to_wkb
        return hash(to_wkb(self))
