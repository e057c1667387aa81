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


def pyramid_counts(ds, x_col: str = "x", y_col: str = "y",
                   base_zoom: int = 12, zooms=(4, 6, 8, 10, 12)):
    """Per-tile point counts at every requested zoom — the map-tile
    heatmap pyramid, built hierarchically: ONE point-level groupby at
    ``base_zoom`` (the only shuffle that sees point-sized data), then
    parents derived from the base-tile AGGREGATES by integer
    right-shift (tile_x >> (base-z)) and re-summed in a second,
    tile-sized groupby. At 100 TB points >> tiles, so rolling up from
    counts instead of re-keying raw points per zoom cuts the shuffle
    volume by the point-to-tile ratio per extra level.

    Returns a Dataset (zoom, tile_x, tile_y, n_points). Every zoom
    must be <= base_zoom; shifts are exact integer ops (reproducible
    as ``>>`` in SQL)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    zooms = sorted(set(int(z) for z in zooms))
    if zooms and zooms[-1] > base_zoom:
        raise ValueError("every pyramid zoom must be <= base_zoom")

    def assign(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        tx, ty = lonlat_to_tile(x, y, base_zoom)
        return pa.table({"tile_x": pa.array(tx.astype(np.int64)),
                         "tile_y": pa.array(ty.astype(np.int64))})

    base = (ds.map_batches(assign, batch_format="pyarrow")
            .groupby(["tile_x", "tile_y"]).count())

    def expand(batch: pa.Table) -> pa.Table:
        if "tile_x" not in batch.schema.names or batch.num_rows == 0:
            return pa.table({"zoom": pa.array([], pa.int64()),
                             "tile_x": pa.array([], pa.int64()),
                             "tile_y": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        tx = batch.column("tile_x").to_numpy(zero_copy_only=False)
        ty = batch.column("tile_y").to_numpy(zero_copy_only=False)
        n = batch.column("count()").to_numpy(
            zero_copy_only=False).astype(np.int64)
        outs = []
        for z in zooms:
            s = base_zoom - z
            outs.append(pa.table({
                "zoom": np.full(len(tx), z, np.int64),
                "tile_x": (tx >> s).astype(np.int64),
                "tile_y": (ty >> s).astype(np.int64),
                "n": n}))
        return pa.concat_tables(outs)

    rolled = (base.map_batches(expand, batch_format="pyarrow")
              .groupby(["zoom", "tile_x", "tile_y"]).sum("n"))

    def rename(batch: pa.Table) -> pa.Table:
        if "zoom" not in batch.schema.names or batch.num_rows == 0:
            return pa.table({"zoom": pa.array([], pa.int64()),
                             "tile_x": pa.array([], pa.int64()),
                             "tile_y": pa.array([], pa.int64()),
                             "n_points": pa.array([], pa.int64())})
        return pa.table({"zoom": batch.column("zoom"),
                         "tile_x": batch.column("tile_x"),
                         "tile_y": batch.column("tile_y"),
                         "n_points": pc.cast(batch.column("sum(n)"),
                                             pa.int64())})

    return rolled.map_batches(rename, batch_format="pyarrow")


def tiles_to_quadkey(tx, ty, zoom: int):
    """Bing Maps quadkeys (published spec: digit i from the MSB is
    (ybit << 1) | xbit of tile coords at level i+1) — numpy 'U'
    strings assembled from a digit matrix, no per-row Python."""
    import numpy as np

    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    shifts = zoom - 1 - np.arange(zoom, dtype=np.int64)
    dig = (((ty[:, None] >> shifts[None, :]) & 1) << 1) \
        | ((tx[:, None] >> shifts[None, :]) & 1)
    cp = (dig + ord("0")).astype("<u4")
    import numpy as _np
    return _np.ascontiguousarray(cp).view(f"<U{zoom}").ravel()
