"""Slippy-map (Web-Mercator / XYZ) tile assignment, vectorized.

Standard OSM tile formulas; z=12 is the north-rule target. Matches the
closed-form SQL oracle:
  x = floor((lon + 180) / 360 * 2^z)
  y = floor((1 - ln(tan(lat) + sec(lat)) / pi) / 2 * 2^z)
with lat clamped to the Web-Mercator domain ±85.0511287798066.
"""

from __future__ import annotations

import numpy as np

DEFAULT_ZOOM = 12
MAX_LAT = 85.0511287798066


def lonlat_to_tile(lon, lat, z: int = DEFAULT_ZOOM):
    """Vectorized lon/lat → (x, y) tile indices at zoom z."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    n = float(1 << z)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int32)
    lat_r = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi)
                 / 2.0 * n).astype(np.int32)
    x = np.clip(x, 0, (1 << z) - 1)
    y = np.clip(y, 0, (1 << z) - 1)
    return x, y


def tile_bounds(x, y, z: int = DEFAULT_ZOOM):
    """Tile → (lon_min, lat_min, lon_max, lat_max)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = float(1 << z)
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0
    lat0 = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (y + 1) / n))))
    lat1 = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
    return lon0, lat0, lon1, lat1


def pack_tile(x, y, z: int = DEFAULT_ZOOM):
    """(z, x, y) → uint64 key for shuffles."""
    return ((np.uint64(z) << np.uint64(58))
            | (np.asarray(x).astype(np.uint64) << np.uint64(29))
            | np.asarray(y).astype(np.uint64))


def cover_boxes_tiles(xmin, ymin, xmax, ymax, z: int = DEFAULT_ZOOM):
    """All tiles intersecting each bbox → (row_idx, x, y) COO, vectorized
    with the same repeat/cumsum expansion as grid.cover_boxes."""
    x0, y1v = lonlat_to_tile(np.asarray(xmin), np.asarray(ymin), z)
    x1, y0v = lonlat_to_tile(np.asarray(xmax), np.asarray(ymax), z)
    nx = x1.astype(np.int64) - x0.astype(np.int64) + 1
    ny = y1v.astype(np.int64) - y0v.astype(np.int64) + 1
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(nx), dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    lx = local // np.repeat(ny, counts)
    ly = local % np.repeat(ny, counts)
    tx = (np.repeat(x0.astype(np.int64), counts) + lx).astype(np.int32)
    ty = (np.repeat(y0v.astype(np.int64), counts) + ly).astype(np.int32)
    return row_idx, tx, ty
