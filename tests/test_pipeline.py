"""Flagship pipeline e2e invariants (FIXTURES.md §6, BASELINE.md):
byte-identical extracted text per url, join parity, tile parity,
aggregate parity."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.cells import tiles
from geoflow.io.synth import make_corpus_block, make_corpus_dataset, make_polygon_table


def test_corpus_deterministic():
    a = make_corpus_block(3, 100)
    b = make_corpus_block(3, 100)
    assert a.equals(b)
    c = make_corpus_block(4, 100)
    assert not a.equals(c)


def test_text_passthrough_byte_identical(ray_session):
    """Per-row invariant (input_hint): extracted text byte-identical per
    url across the extraction stage."""
    import ray
    from geoflow.extract import ExtractWkt
    corpus = make_corpus_block(0, 300)
    texts_by_url = dict(zip(corpus.column("url").to_pylist(),
                            corpus.column("text").to_pylist()))
    ds = ray.data.from_arrow(corpus)
    ex = ds.map_batches(ExtractWkt(keep_cols=("text",)),
                        batch_format="pyarrow")
    for r in ex.take_all():
        assert r["text"] == texts_by_url[r["url"]]
        assert r["wkt"] in r["text"]


def test_extraction_counts_match_regex_oracle(ray_session):
    import re
    import ray
    from geoflow.extract import ExtractWkt
    corpus = make_corpus_block(1, 300)
    pat = re.compile(r"\b(POINT|POLYGON)\s*\(")
    exp = sum(len(pat.findall(t)) for t in corpus.column("text").to_pylist())
    ds = ray.data.from_arrow(corpus)
    got = ds.map_batches(ExtractWkt(), batch_format="pyarrow").count()
    assert got == exp


def test_flagship_end_to_end(ray_session):
    import ray
    from geoflow.pipelines import run_flagship
    corpus = make_corpus_dataset(1200, rows_per_block=300)
    polys = make_polygon_table(150)
    res = run_flagship(corpus, polys, join_mode="broadcast")
    join_rows = res["join"].take_all()
    tile_rows = res["tiles"].take_all()
    assert len(join_rows) > 0 and len(tile_rows) > 0
    # tile parity vs the closed-form oracle, for point rows
    pts = {(r["url"], r["geom_idx"]): (r["x"], r["y"])
           for r in res["points"].take_all()}
    tmap = {}
    for r in tile_rows:
        tmap.setdefault((r["url"], r["geom_idx"]), set()).add((r["x"], r["y"]))
    for key, (x, y) in list(pts.items())[:200]:
        tx, ty = tiles.lonlat_to_tile(np.array([x]), np.array([y]), 12)
        assert (int(tx[0]), int(ty[0])) in tmap[key]


def test_cell_vs_broadcast_join_equal(ray_session):
    import ray
    from geoflow.pipelines import extract_geoms, to_points, run_flagship
    corpus = make_corpus_dataset(800, rows_per_block=200)
    polys = make_polygon_table(120)
    r1 = run_flagship(corpus, polys, join_mode="broadcast")
    s1 = {(r["url"], r["geom_idx"], r["poly_id"])
          for r in r1["join"].take_all()}
    corpus2 = make_corpus_dataset(800, rows_per_block=200)
    r2 = run_flagship(corpus2, polys, join_mode="cell")
    s2_ = {(r["url"], r["geom_idx"], r["poly_id"])
           for r in r2["join"].take_all()}
    assert s1 == s2_


def test_grouped_spatial_aggregate(ray_session):
    import ray
    from geoflow.ops.aggregates import avg_x, bounding_box, max_x, min_x
    from geoflow.geom.wkb import points_to_wkb
    rng = np.random.default_rng(7)
    n = 1000
    x = rng.uniform(-10, 10, n)
    y = rng.uniform(-5, 5, n)
    grp = rng.integers(0, 4, n)
    t = pa.table({"g": pa.array(grp), "geom_wkb": pa.array(points_to_wkb(x, y),
                                                           type=pa.binary())})
    ds = ray.data.from_arrow(t)
    out = ds.groupby("g").aggregate(avg_x(), min_x(), max_x(), bounding_box())
    rows = {r["g"]: r for r in out.take_all()}
    for g in range(4):
        m = grp == g
        assert rows[g]["avg_x"] == pytest.approx(x[m].mean(), rel=1e-12)
        assert rows[g]["min_x"] == x[m].min()
        assert rows[g]["max_x"] == x[m].max()
        assert repr(x[m].min()) in rows[g]["bounding_box"]


def test_avg_distinct(ray_session):
    import ray
    from geoflow.ops.aggregates import avg_x
    from geoflow.geom.wkb import points_to_wkb
    x = np.array([1.0, 1.0, 3.0])
    y = np.zeros(3)
    t = pa.table({"g": pa.array([0, 0, 0]),
                  "geom_wkb": pa.array(points_to_wkb(x, y), type=pa.binary())})
    ds = ray.data.from_arrow(t)
    out = ds.groupby("g").aggregate(avg_x(distinct=True)).take_all()
    assert out[0]["avg_x"] == 2.0  # distinct {1,3} → 2 (AvgXDistinct.java:7)


def test_geojson_sink(ray_session, tmp_path):
    """GeoJSONSeq sink: distributed per-block writes, valid Features,
    idempotent re-run (content-hash filenames)."""
    import glob
    import json
    import ray
    import pyarrow as pa
    from geoflow.geom.wkb import to_wkb
    from geoflow.geom.wkt import from_wkt
    from geoflow.io import write_geojson
    t = pa.table({
        "doc_id": pa.array([1, 2]),
        "geom_wkb": pa.array([
            to_wkb(from_wkt("POINT(1 2)")),
            to_wkb(from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))"))],
            type=pa.binary())})
    out = str(tmp_path / "gj")
    recs = write_geojson(ray.data.from_arrow(t), out)
    assert sum(r["rows"] for r in recs) == 2
    files = sorted(glob.glob(out + "/part-*.geojsonl"))
    assert files
    feats = []
    for fp in files:
        for line in open(fp):
            feats.append(json.loads(line))
    assert {f["properties"]["doc_id"] for f in feats} == {1, 2}
    kinds = {f["geometry"]["type"] for f in feats}
    assert kinds == {"Point", "Polygon"}
    # idempotent: second run adds no new files
    write_geojson(ray.data.from_arrow(t), out)
    assert sorted(glob.glob(out + "/part-*.geojsonl")) == files


def test_geojson_sink_escaping_and_types(ray_session, tmp_path):
    """Vectorized line assembly: string escaping, control-char
    fallback, int/float/bool/null properties, null geometry."""
    import glob
    import json
    import math
    import ray
    import pyarrow as pa
    from geoflow.geom.wkb import to_wkb
    from geoflow.geom.wkt import from_wkt
    from geoflow.io import write_geojson
    t = pa.table({
        "s": pa.array(['quote " back \\ nl \n tab \t done',
                       "ctrl \x0c char", None]),
        "i": pa.array([1, None, -7], type=pa.int64()),
        "f": pa.array([1.5, float("nan"), None], type=pa.float64()),
        "b": pa.array([True, False, None]),
        "geom_wkb": pa.array([to_wkb(from_wkt("POINT(1 2)")),
                              None,
                              to_wkb(from_wkt("POINT(3 4)"))],
                             type=pa.binary())})
    out = str(tmp_path / "gj2")
    recs = write_geojson(ray.data.from_arrow(t), out)
    assert sum(r["rows"] for r in recs) == 3
    feats = []
    for fp in sorted(glob.glob(out + "/part-*.geojsonl")):
        for line in open(fp):
            feats.append(json.loads(line))
    by_i = {f["properties"]["i"]: f for f in feats}
    f1 = by_i[1]
    assert f1["properties"]["s"] == 'quote " back \\ nl \n tab \t done'
    assert f1["properties"]["f"] == 1.5 and f1["properties"]["b"] is True
    assert f1["geometry"]["type"] == "Point"
    fn = by_i[None]
    assert fn["properties"]["s"] == "ctrl \x0c char"
    assert math.isnan(fn["properties"]["f"])
    assert fn["geometry"] is None
    fm = by_i[-7]
    assert fm["properties"]["s"] is None and fm["properties"]["b"] is None
    assert fm["properties"]["f"] is None
