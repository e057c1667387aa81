"""GeoParquet (v1.0.0, OGC community spec) writer / reader.

Interop sink for the engine's native WKB geometry columns: any system
reading GeoParquet (GDAL/OGR >= 3.5, GeoPandas, DuckDB spatial, recent
warehouse engines) can consume the engine's partitioned parquet output
directly. Implements the published file-level contract: a ``geo``
key in the parquet schema metadata carrying JSON with ``version``,
``primary_column`` and per-column ``encoding``/``geometry_types``
(and optionally ``bbox`` and a PROJJSON ``crs``).

Scale shape: the metadata attach is a zero-copy schema replacement in
the write tasks; the optional dataset bbox is ONE streaming aggregate
over the envelope kernel (no materialization). Omitted ``crs`` means
OGC:CRS84 per spec — the engine's native lon/lat axis order. For
other CRSs a minimal PROJJSON identifier object (authority + code +
name from the embedded EPSG table) is written; full parameter-level
PROJJSON is out of scope and documented as such.
"""

from __future__ import annotations

import json

import pyarrow as pa

__all__ = ["geo_metadata", "write_geoparquet", "read_geoparquet"]


def geo_metadata(wkb_col: str = "geom_wkb", geometry_types=None,
                 bbox=None, epsg: int | None = None) -> dict:
    """The ``geo`` metadata dict per the GeoParquet 1.0.0 spec."""
    col: dict = {"encoding": "WKB",
                 "geometry_types": sorted(geometry_types or [])}
    if bbox is not None:
        col["bbox"] = [float(v) for v in bbox]
    if epsg is not None and epsg not in (4326,):
        name = f"EPSG:{epsg}"
        try:
            from ..geom.crswkt import crs_name  # may not expose; guard
            name = crs_name(epsg)
        except Exception:
            pass
        col["crs"] = {"type": "GeographicCRS" if epsg == 4979
                      else "ProjectedCRS",
                      "name": name,
                      "id": {"authority": "EPSG", "code": int(epsg)}}
    return {"version": "1.0.0", "primary_column": wkb_col,
            "columns": {wkb_col: col}}


def _dataset_bbox(ds, wkb_col: str):
    """(xmin, ymin, xmax, ymax) via one streaming min/max aggregate
    over the vectorized WKB header-scan bounds kernel."""
    import numpy as np
    import pyarrow.compute as pc

    def bounds(batch: pa.Table) -> pa.Table:
        from ..geom.wkb import wkb_bounds
        bs = wkb_bounds(batch.column(wkb_col).to_pylist())
        bs = bs[~np.isnan(bs[:, 0])] if len(bs) else bs
        if len(bs) == 0:
            return pa.table({"xmin": pa.array([], type=pa.float64()),
                             "ymin": pa.array([], type=pa.float64()),
                             "xmax": pa.array([], type=pa.float64()),
                             "ymax": pa.array([], type=pa.float64())})
        return pa.table({"xmin": [float(bs[:, 0].min())],
                         "ymin": [float(bs[:, 1].min())],
                         "xmax": [float(bs[:, 2].max())],
                         "ymax": [float(bs[:, 3].max())]})

    # one pass: per-batch extremes above, 4-double rows reduced at the
    # driver (bounded by block count, not data size)
    parts = [b for b in ds.map_batches(bounds, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return None
    import numpy as np
    xs = np.array([[b.column("xmin")[0].as_py(),
                    b.column("ymin")[0].as_py(),
                    b.column("xmax")[0].as_py(),
                    b.column("ymax")[0].as_py()] for b in parts])
    return (xs[:, 0].min(), xs[:, 1].min(), xs[:, 2].max(),
            xs[:, 3].max())


def write_geoparquet(ds, path: str, wkb_col: str = "geom_wkb",
                     geometry_types=None, epsg: int | None = None,
                     compute_bbox: bool = False):
    """Write ``ds`` as GeoParquet under ``path``. The ``geo`` schema
    metadata rides each block into its file (Ray's writer preserves
    Arrow schema metadata). compute_bbox=True adds the dataset bbox at
    the cost of one extra streaming pass over the geometry column."""
    bbox = _dataset_bbox(ds, wkb_col) if compute_bbox else None
    meta = {b"geo": json.dumps(
        geo_metadata(wkb_col, geometry_types, bbox, epsg)).encode()}

    def attach(batch: pa.Table) -> pa.Table:
        return batch.replace_schema_metadata(meta)

    ds.map_batches(attach, batch_format="pyarrow").write_parquet(path)
    return meta


def read_geoparquet(path: str, **read_kwargs):
    """(Dataset, geo-metadata dict | None). Detection reads ONE file's
    parquet schema footer; the data read is the normal streaming
    ``ray.data.read_parquet`` (Ray drops Arrow schema metadata across
    transforms, so the contract is returned out-of-band)."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray

    geo = None
    candidates = sorted(glob.glob(os.path.join(path, "*.parquet"))) \
        if os.path.isdir(path) else [path]
    for f in candidates[:1]:
        md = pq.read_schema(f).metadata or {}
        if b"geo" in md:
            geo = json.loads(md[b"geo"].decode())
    return ray.data.read_parquet(path, **read_kwargs), geo
