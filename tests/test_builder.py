"""Pipeline-builder API (SURVEY §3.4's SPARQL-algebra replacement):
the documented example compiles to one lazy Dataset chain and matches
the flagship stages' results."""

import numpy as np
import pyarrow as pa

from geoflow.pipelines import (ApplyOp, CellIndex, DedupExact,
                               ExtractGeoms, FilterBatch, Pipeline,
                               SpatialJoin, TileAssign)


def test_survey_example_pipeline(ray_session):
    import ray
    from geoflow.io.synth import make_corpus_dataset, make_polygon_table
    corpus = make_corpus_dataset(1000, rows_per_block=250)
    polys = make_polygon_table(100)
    pipe = Pipeline([ExtractGeoms(),
                     CellIndex(h3=7),
                     SpatialJoin(pred="intersects", right=polys),
                     TileAssign(z=12)])
    out = pipe.compile(corpus)
    import ray.data
    assert isinstance(out, ray.data.Dataset)   # still lazy
    rows = out.take_all()
    assert rows, "join produced no rows"
    cols = set(rows[0].keys())
    assert {"url", "poly_id", "tile_x", "tile_y"} <= cols
    # repr is the readable plan
    assert "SpatialJoin" in repr(pipe) and "CellIndex(h3=7" in repr(pipe)


def test_cellindex_and_ops_stages(ray_session):
    import ray
    t = pa.table({"x": pa.array([2.0, 10.0]), "y": pa.array([48.0, 50.0]),
                  "doc_id": pa.array([1, 2])})
    ds = ray.data.from_arrow(t)
    out = Pipeline([CellIndex(h3=7, s2=13, grid=7)]).compile(ds).take_all()
    assert {"h3_7", "s2_13", "cell"} <= set(out[0].keys())
    # h3 values match the direct kernel
    from geoflow.cells import h3
    exp = h3.lonlat_to_cell(np.array([2.0]), np.array([48.0]), 7)[0]
    assert out[0]["h3_7"] == int(exp.view(np.int64))


def test_applyop_filter_dedup_stages(ray_session):
    import ray
    from geoflow.geom.wkt import from_wkt
    from geoflow.geom.wkb import to_wkb
    t = pa.table({
        "doc_id": pa.array([3, 1, 2]),
        "text": pa.array(["a", "a", "b"]),
        "geom_wkb": pa.array([
            to_wkb(from_wkt("POLYGON((0 0,2 0,2 2,0 2,0 0))")),
            to_wkb(from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0))")),
            to_wkb(from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))"))],
            type=pa.binary())})
    ds = ray.data.from_arrow(t)
    pipe = Pipeline([
        ApplyOp("st_area", in_cols=("geom_wkb",), out_col="area"),
        FilterBatch(lambda b: b.column("area").to_numpy(
            zero_copy_only=False) > 0.5),
        DedupExact(text_col="text", key_col="doc_id"),
    ])
    rows = pipe.compile(ds).take_all()
    kept = sorted(r["doc_id"] for r in rows)
    assert kept == [1, 2]        # min doc_id per distinct text, area > .5


def test_ops_ttl_export():
    """functions.ttl-style registry export (SURVEY §2.9 'ontology as
    data'): one geo2:Function individual per registered op, no broken
    quoting."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.export_ops_ttl import export_ttl
    import geoflow.ops as ops
    import geoflow.raster.ops  # noqa: F401
    t = export_ttl()
    assert t.count("a geo2:Function") == len(ops.REGISTRY)
    # every comment line is a single-line, closed triple
    for line in t.splitlines():
        if line.startswith("    rdfs:comment"):
            assert line.endswith('" .') and line.count('"') == 2
