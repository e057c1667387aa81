"""GeoJSON sink kernel (SURVEY §2.1 engine-I/O row: 'GeoJSON writer as
a sink kernel'; the reference's result egress is
TripleStoreConnection.java's JSON writer).

`to_geojson_features` turns a Dataset with a WKB column into a Dataset
of GeoJSON Feature rows; `write_geojson` writes GeoJSONSeq
(newline-delimited Features) — one file per block, written inside the
map tasks (fully distributed), atomically (tmp+rename) and idempotently
(content-hash filenames: a re-run that produces the same block skips
the write — consistent with the engine's resumable-output layout)."""

from __future__ import annotations

import json

import pyarrow as pa


def to_geojson_features(ds, wkb_col="geom_wkb", prop_cols=None):
    """Dataset(wkb + columns) → Dataset of Feature rows (geometry as a
    GeoJSON string column + the property columns)."""

    def featurize(batch: pa.Table) -> pa.Table:
        from ..ops import get_op
        props = prop_cols if prop_cols is not None else \
            [c for c in batch.schema.names if c != wkb_col]
        gj = get_op("st_asgeojson").fn(batch.column(wkb_col))
        cols = {"type": pa.array(["Feature"] * batch.num_rows),
                "geometry": gj}
        for c in props:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(featurize, batch_format="pyarrow")


def write_geojson(ds, path, wkb_col="geom_wkb", prop_cols=None):
    """Write as GeoJSONSeq under `path/part-<hash>.geojsonl`. Returns
    the list of {file, rows} records (one per written block)."""

    feats = to_geojson_features(ds, wkb_col, prop_cols)

    def write_block(batch: pa.Table) -> pa.Table:
        import hashlib
        import os
        geom = batch.column("geometry").to_pylist()
        names = [c for c in batch.schema.names
                 if c not in ("type", "geometry")]
        lines = []
        for i in range(batch.num_rows):
            props = {c: batch.column(c)[i].as_py() for c in names}
            lines.append(json.dumps({
                "type": "Feature",
                "geometry": json.loads(geom[i]) if geom[i] else None,
                "properties": props}, sort_keys=True))
        data = "\n".join(lines) + "\n"
        h = hashlib.blake2b(data.encode(), digest_size=8).hexdigest()
        os.makedirs(path, exist_ok=True)
        final = os.path.join(path, f"part-{h}.geojsonl")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "w") as f:
                f.write(data)
            os.replace(tmp, final)
        return pa.table({"file": pa.array([final]),
                         "rows": pa.array([len(lines)], type=pa.int64())})

    return feats.map_batches(write_block,
                             batch_format="pyarrow").take_all()
