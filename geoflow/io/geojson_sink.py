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
import pyarrow.compute as pc


def _json_quote(col) -> pa.Array:
    """String column → JSON string literal per value (quoted, escaped;
    nulls propagate). Vectorized replace chain for the common escapes;
    a batch containing OTHER control chars (rare) falls back to
    per-value json.dumps for exactness."""
    s = pc.cast(col, pa.string())
    bad = pc.match_substring_regex(
        s, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]")
    if pc.any(pc.fill_null(bad, False)).as_py():
        return pa.array([None if v is None
                         else json.dumps(v, ensure_ascii=False)
                         for v in s.to_pylist()], type=pa.string())
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        s = pc.replace_substring(s, pattern=raw, replacement=esc)
    return pc.binary_join_element_wise(pa.scalar('"'), s,
                                       pa.scalar('"'), "")


def _json_value(col) -> pa.Array:
    """Column → JSON value text per row ("null" for nulls)."""
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        enc = _json_quote(col)
    elif pa.types.is_boolean(t) or pa.types.is_integer(t):
        enc = pc.cast(col, pa.string())
    elif pa.types.is_floating(t):
        enc = pc.cast(pc.cast(col, pa.float64()), pa.string())
        # Arrow spells non-finite floats nan/inf; python-json reads
        # NaN/Infinity (both are JSON extensions)
        for a, b in (("nan", "NaN"), ("-inf", "-Infinity"),
                     ("inf", "Infinity")):
            enc = pc.if_else(pc.equal(enc, a), pa.scalar(b), enc)
    else:  # uncommon property types: exact per-value fallback
        enc = pa.array([None if v is None else json.dumps(v)
                        for v in col.to_pylist()], type=pa.string())
    return pc.fill_null(enc, "null")


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
        # vectorized line assembly (no per-row json.dumps — r3 verdict):
        # one binary_join_element_wise concat per block; key order
        # matches json.dumps(sort_keys=True): geometry < properties
        # < type, property names sorted
        names = sorted(c for c in batch.schema.names
                       if c not in ("type", "geometry"))
        geom = pc.fill_null(pc.cast(batch.column("geometry"),
                                    pa.string()), "null")
        geom = pc.if_else(pc.equal(geom, ""), pa.scalar("null"), geom)
        pieces = [pa.scalar('{"geometry": '), geom,
                  pa.scalar(', "properties": {')]
        for i, c in enumerate(names):
            pre = ("" if i == 0 else ", ") + json.dumps(c) + ": "
            pieces.append(pa.scalar(pre))
            pieces.append(_json_value(batch.column(c)))
        pieces.append(pa.scalar('}, "type": "Feature"}'))
        lines = pc.binary_join_element_wise(*pieces, "")
        data = "\n".join(lines.to_pylist()) + "\n"
        h = hashlib.blake2b(data.encode(), digest_size=8).hexdigest()
        os.makedirs(path, exist_ok=True)
        final = os.path.join(path, f"part-{h}.geojsonl")
        if not os.path.exists(final):
            tmp = final + f".tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(data)
            os.replace(tmp, final)
        return pa.table({"file": pa.array([final]),
                         "rows": pa.array([len(lines)], type=pa.int64())})

    return feats.map_batches(write_block,
                             batch_format="pyarrow").take_all()
