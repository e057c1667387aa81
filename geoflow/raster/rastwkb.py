"""PostGIS raster-WKB codec (pure numpy).

Field layout ported from the reference's documented fixtures
(/root/reference/src/test/de/hsmainz/cs/semgis/arqextension/test/util/SampleRasters.java:27-58)
and the vendored reader
(/root/reference/src/main/org/geotoolkit/coverage/wkb/WKBRasterReader.java:1-354):

  endian:uint8 | version:uint16 | nBands:uint16 | scaleX,scaleY:float64 |
  ipX,ipY:float64 | skewX,skewY:float64 | srid:int32 | width,height:uint16 |
  per band: flags:uint8 (0x80 offline, 0x40 hasNodata, 0x0F pixtype) |
            nodata:pixtype | pixels row-major width*height

Pixel types (WKBRasterConstants): 0=1BB 1=2BUI 2=4BUI 3=8BSI 4=8BUI
5=16BSI 6=16BUI 7=32BSI 8=32BUI 10=32BF 11=64BF.
"""

from __future__ import annotations

import struct

import numpy as np

PT_1BB = 0
PT_2BUI = 1
PT_4BUI = 2
PT_8BSI = 3
PT_8BUI = 4
PT_16BSI = 5
PT_16BUI = 6
PT_32BSI = 7
PT_32BUI = 8
PT_32BF = 10
PT_64BF = 11

PIXTYPE_NAMES = {
    PT_1BB: "1BB", PT_2BUI: "2BUI", PT_4BUI: "4BUI", PT_8BSI: "8BSI",
    PT_8BUI: "8BUI", PT_16BSI: "16BSI", PT_16BUI: "16BUI",
    PT_32BSI: "32BSI", PT_32BUI: "32BUI", PT_32BF: "32BF",
    PT_64BF: "64BF",
}

# numpy dtype + bytes-per-pixel per pixel type (sub-byte types decode
# through uint8)
_PT_INFO = {
    PT_1BB: ("u1", 1), PT_2BUI: ("u1", 1), PT_4BUI: ("u1", 1),
    PT_8BSI: ("i1", 1), PT_8BUI: ("u1", 1),
    PT_16BSI: ("i2", 2), PT_16BUI: ("u2", 2),
    PT_32BSI: ("i4", 4), PT_32BUI: ("u4", 4),
    PT_32BF: ("f4", 4), PT_64BF: ("f8", 8),
}


class Raster:
    """In-memory raster: per-band numpy arrays (h, w) + georeference."""

    __slots__ = ("bands", "pixtypes", "nodata", "scale_x", "scale_y",
                 "ip_x", "ip_y", "skew_x", "skew_y", "srid", "shape")

    def __init__(self, bands, pixtypes, nodata, scale_x=1.0, scale_y=1.0,
                 ip_x=0.0, ip_y=0.0, skew_x=0.0, skew_y=0.0, srid=0,
                 shape=None):
        self.bands = [np.asarray(b) for b in bands]
        self.pixtypes = list(pixtypes)
        self.nodata = list(nodata)
        self.scale_x = scale_x
        self.scale_y = scale_y
        self.ip_x = ip_x
        self.ip_y = ip_y
        self.skew_x = skew_x
        self.skew_y = skew_y
        self.srid = srid
        # (height, width); needed for band-less rasters which still carry
        # a grid extent (THE_EMPTY_RASTER fixture has 2x2, 0 bands)
        self.shape = shape if shape is not None else (
            self.bands[0].shape if self.bands else (0, 0))

    @property
    def width(self) -> int:
        return self.shape[1]

    @property
    def height(self) -> int:
        return self.shape[0]

    @property
    def num_bands(self) -> int:
        return len(self.bands)

    @property
    def is_empty(self) -> bool:
        return self.width == 0 or self.height == 0

    # --- georeference ---------------------------------------------------
    def raster_to_world(self, col, row):
        """pixel (col, row) upper-left corner → world x,y (affine;
        RasterToWorldCoord.java:35 semantics)."""
        col = np.asarray(col, dtype=np.float64)
        row = np.asarray(row, dtype=np.float64)
        x = self.ip_x + col * self.scale_x + row * self.skew_x
        y = self.ip_y + col * self.skew_y + row * self.scale_y
        return x, y

    def world_to_raster(self, x, y):
        """world → fractional pixel (col, row) (inverse affine)."""
        x = np.asarray(x, dtype=np.float64) - self.ip_x
        y = np.asarray(y, dtype=np.float64) - self.ip_y
        det = self.scale_x * self.scale_y - self.skew_x * self.skew_y
        col = (x * self.scale_y - y * self.skew_x) / det
        row = (y * self.scale_x - x * self.skew_y) / det
        return col, row

    def envelope(self):
        """(xmin, ymin, xmax, ymax) of the full grid extent."""
        cs = np.array([0, self.width, 0, self.width], dtype=np.float64)
        rs = np.array([0, 0, self.height, self.height], dtype=np.float64)
        x, y = self.raster_to_world(cs, rs)
        return float(x.min()), float(y.min()), float(x.max()), float(y.max())

    def envelope_polygon(self):
        from ..geom import Geometry
        x0, y0, x1, y1 = self.envelope()
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        return Geometry(3, rings=[ring], srid=self.srid or 4326)


def from_wkb(buf: bytes) -> Raster:
    endian = buf[0]
    ec = "<" if endian == 1 else ">"
    version, n_bands = struct.unpack_from(ec + "HH", buf, 1)
    (scale_x, scale_y, ip_x, ip_y, skew_x,
     skew_y) = struct.unpack_from(ec + "6d", buf, 5)
    srid, = struct.unpack_from(ec + "i", buf, 53)
    width, height = struct.unpack_from(ec + "HH", buf, 57)
    pos = 61
    bands = []
    pixtypes = []
    nodata = []
    for _ in range(n_bands):
        flags = buf[pos]
        pos += 1
        pixtype = flags & 0x0F
        dt, size = _PT_INFO[pixtype]
        nd = np.frombuffer(buf, dtype=ec + dt, count=1, offset=pos)[0]
        pos += size
        n = width * height
        arr = np.frombuffer(buf, dtype=ec + dt, count=n, offset=pos).copy()
        pos += n * size
        if pixtype == PT_1BB:
            arr = arr & 1
        elif pixtype == PT_2BUI:
            arr = arr & 0x3
        elif pixtype == PT_4BUI:
            arr = arr & 0xF
        bands.append(arr.reshape(height, width))
        pixtypes.append(pixtype)
        nodata.append(nd if flags & 0x40 else None)
    return Raster(bands, pixtypes, nodata, scale_x, scale_y, ip_x, ip_y,
                  skew_x, skew_y, srid, shape=(height, width))


def to_wkb(r: Raster, width=None, height=None) -> bytes:
    w = r.width if width is None else width
    h = r.height if height is None else height
    out = [struct.pack("<BHH", 1, 0, r.num_bands),
           struct.pack("<6d", r.scale_x, r.scale_y, r.ip_x, r.ip_y,
                       r.skew_x, r.skew_y),
           struct.pack("<i", r.srid),
           struct.pack("<HH", w, h)]
    for band, pt, nd in zip(r.bands, r.pixtypes, r.nodata):
        dt, _ = _PT_INFO[pt]
        flags = pt | (0x40 if nd is not None else 0)
        out.append(struct.pack("<B", flags))
        ndval = 0 if nd is None else nd
        out.append(np.array([ndval]).astype("<" + dt).tobytes())
        out.append(np.ascontiguousarray(band).astype("<" + dt).tobytes())
    return b"".join(out)


def from_hexwkb(s: str) -> Raster:
    return from_wkb(bytes.fromhex(s))


def to_hexwkb(r: Raster) -> str:
    return to_wkb(r).hex().upper()


# ---------------------------------------------------------------------------
# XYZ ASCII grid codec (XYZDatatype.java:24-45 is a STUB in the
# reference — both read and unparse; this implements the public/GDAL
# "x y z" convention the class names: one line per cell, cell-center
# coordinates, rows north-to-south)
# ---------------------------------------------------------------------------

def to_xyz(r: Raster, band: int = 0) -> str:
    """Raster band → XYZ ASCII grid ('x y z' per cell, cell centers,
    repr-formatted doubles so parse round-trips exactly)."""
    h, w = r.height, r.width
    cols, rows = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    x, y = r.raster_to_world(cols.ravel(), rows.ravel())
    z = np.asarray(r.bands[band], dtype=np.float64).ravel()
    sx = np.char.mod("%.17g", x)
    sy = np.char.mod("%.17g", y)
    sz = np.char.mod("%.17g", z)
    lines = np.char.add(np.char.add(np.char.add(sx, " "),
                                    np.char.add(sy, " ")), sz)
    return "\n".join(lines.tolist())


def from_xyz(text: str, srid: int = 0, nodata=None) -> Raster:
    """XYZ ASCII grid → single-band 64BF Raster. The grid geometry
    (origin, cell size, north-up row order) is derived from the
    coordinate sets; cells absent from the text are filled with
    `nodata` (NaN when None). Requires a regular axis-aligned grid."""
    vals = np.array(text.split(), dtype=np.float64)
    if len(vals) == 0 or len(vals) % 3:
        raise ValueError("XYZ grid: expected 'x y z' triples")
    trip = vals.reshape(-1, 3)
    xs = np.unique(trip[:, 0])
    ys = np.unique(trip[:, 1])
    sx = float(np.min(np.diff(xs))) if len(xs) > 1 else 1.0
    sy = float(np.min(np.diff(ys))) if len(ys) > 1 else 1.0
    # validate regularity: every coord must sit on the derived lattice
    ci = np.rint((trip[:, 0] - xs[0]) / sx).astype(np.int64)
    ri = np.rint((ys[-1] - trip[:, 1]) / sy).astype(np.int64)
    if (np.abs(xs[0] + ci * sx - trip[:, 0]) > 1e-9 * max(sx, 1.0)).any() \
            or (np.abs(ys[-1] - ri * sy - trip[:, 1])
                > 1e-9 * max(sy, 1.0)).any():
        raise ValueError("XYZ grid: irregular cell spacing")
    w = int(ci.max()) + 1
    h = int(ri.max()) + 1
    fill = np.nan if nodata is None else float(nodata)
    grid = np.full((h, w), fill, dtype=np.float64)
    grid[ri, ci] = trip[:, 2]
    return Raster([grid], [PT_64BF], [nodata],
                  scale_x=sx, scale_y=-sy,
                  ip_x=float(xs[0]) - sx / 2.0,
                  ip_y=float(ys[-1]) + sy / 2.0,
                  srid=srid)


def to_asciigrid(r: Raster, band: int = 0) -> str:
    """Raster band → ESRI ASCII grid (AAIGrid) text: the public GDAL/
    ArcInfo interchange format (ncols/nrows/xllcorner/yllcorner/
    cellsize header + north-up rows). Requires square, axis-aligned,
    north-up cells (cellsize is a single scalar in the format)."""
    if r.skew_x or r.skew_y:
        raise ValueError("asciigrid: rotated rasters not representable")
    if r.scale_y >= 0 or abs(abs(r.scale_x) - abs(r.scale_y)) > 1e-12:
        raise ValueError("asciigrid: requires square north-up cells")
    h, w = r.height, r.width
    cell = float(r.scale_x)
    nodata = r.nodata[band]
    z = np.asarray(r.bands[band], dtype=np.float64)
    if nodata is not None:
        z = np.where(np.isnan(z), float(nodata), z)
    nd = -9999.0 if nodata is None else float(nodata)
    head = (f"ncols {w}\nnrows {h}\n"
            f"xllcorner {r.ip_x:.17g}\n"
            f"yllcorner {r.ip_y + r.scale_y * h:.17g}\n"
            f"cellsize {cell:.17g}\n"
            f"NODATA_value {nd:.17g}\n")
    rows = np.char.mod("%.17g", z)
    return head + "\n".join(" ".join(row) for row in rows.tolist())


def from_asciigrid(text: str, srid: int = 0) -> Raster:
    """ESRI ASCII grid text → single-band 64BF Raster. Accepts
    xllcorner/yllcorner or xllcenter/yllcenter headers (case-
    insensitive, any order), optional NODATA_value. Values keep the
    declared nodata VALUE in the band (the nodata rides the raster
    metadata, matching the other codecs)."""
    toks = text.split()
    hdr: dict[str, float] = {}
    i = 0
    while i + 1 < len(toks):
        k = toks[i].lower()
        if k in ("ncols", "nrows", "xllcorner", "yllcorner",
                 "xllcenter", "yllcenter", "cellsize", "nodata_value"):
            hdr[k] = float(toks[i + 1])
            i += 2
        else:
            break
    for req in ("ncols", "nrows", "cellsize"):
        if req not in hdr:
            raise ValueError(f"asciigrid: missing header {req}")
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    cell = hdr["cellsize"]
    vals = np.array(toks[i:], dtype=np.float64)
    if len(vals) != w * h:
        raise ValueError(
            f"asciigrid: expected {w * h} values, got {len(vals)}")
    if "xllcorner" in hdr:
        xll = hdr["xllcorner"]
    elif "xllcenter" in hdr:
        xll = hdr["xllcenter"] - cell / 2.0
    else:
        raise ValueError("asciigrid: missing xllcorner/xllcenter")
    if "yllcorner" in hdr:
        yll = hdr["yllcorner"]
    elif "yllcenter" in hdr:
        yll = hdr["yllcenter"] - cell / 2.0
    else:
        raise ValueError("asciigrid: missing yllcorner/yllcenter")
    nodata = hdr.get("nodata_value")
    return Raster([vals.reshape(h, w)], [PT_64BF], [nodata],
                  scale_x=cell, scale_y=-cell,
                  ip_x=xll, ip_y=yll + h * cell, srid=srid)
