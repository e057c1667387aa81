"""N-Triples source/sink tests (reference ingest-format parity —
TripleStoreConnection.java loads RDF files; SURVEY §2.1)."""

import os

import pyarrow as pa
import pytest

from geoflow.io.ntriples import (WKT_LITERAL, format_ntriples_batch,
                                 parse_ntriples_batch, read_ntriples,
                                 triples_to_geoms, write_ntriples)

FIXTURE = [
    '<http://ex/a> <http://ex/p> <http://ex/b> .',
    '# comment line',
    '',
    '_:b0 <http://ex/p> "plain literal" .',
    '<http://ex/c> <http://ex/n> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://ex/d> <http://ex/t> "hallo"@de .',
    f'<http://ex/e> <http://www.opengis.net/ont/geosparql#asWKT> "POINT(1.5 2.5)"^^<{WKT_LITERAL}> .',
    '<http://ex/f> <http://ex/t> "esc \\"q\\" \\\\ nl\\n tab\\t acc\\u00e9" .',
    '  <http://ex/g> <http://ex/p> _:bn1 .',
]


def test_parse_fields():
    t = parse_ntriples_batch(pa.array(FIXTURE))
    rows = {r["s"]: r for r in t.to_pylist()}
    assert t.num_rows == 7  # comment + blank dropped
    assert rows["http://ex/a"]["o_kind"] == "iri"
    assert rows["_:b0"]["o"] == "plain literal"
    assert rows["http://ex/c"]["o"] == "42"
    assert rows["http://ex/c"]["o_datatype"].endswith("integer")
    assert rows["http://ex/d"]["o_lang"] == "de"
    assert rows["http://ex/e"]["o_datatype"] == WKT_LITERAL
    assert rows["http://ex/f"]["o"] == 'esc "q" \\ nl\n tab\t accé'
    assert rows["http://ex/g"]["o_kind"] == "bnode"


def test_parse_rejects_turtle():
    with pytest.raises(ValueError, match="Turtle"):
        parse_ntriples_batch(pa.array(["@prefix ex: <http://ex/> ."]))
    with pytest.raises(ValueError):
        parse_ntriples_batch(pa.array(["<a> <b> 'bad quotes' ."]))


def test_format_parse_roundtrip():
    t = parse_ntriples_batch(pa.array(FIXTURE))
    lines = format_ntriples_batch(t)
    assert parse_ntriples_batch(lines).equals(t)


def test_read_write_ntriples(ray_session, tmp_path):
    import ray
    src = tmp_path / "in.nt"
    src.write_text("\n".join(FIXTURE) + "\n")
    ds = read_ntriples(str(src))
    t = ds.take_all()
    assert len(t) == 7
    out_dir = str(tmp_path / "out")
    manifest = write_ntriples(read_ntriples(str(src)), out_dir)
    assert sum(m["rows"] for m in manifest) == 7
    files = [f for f in os.listdir(out_dir) if f.endswith(".nt")]
    assert files
    # reread what we wrote: identical triple set
    back = sorted(map(tuple, (
        (r["s"], r["p"], r["o"], r["o_kind"], r["o_datatype"], r["o_lang"])
        for r in read_ntriples(out_dir).take_all())))
    orig = sorted(map(tuple, (
        (r["s"], r["p"], r["o"], r["o_kind"], r["o_datatype"], r["o_lang"])
        for r in t)))
    assert back == orig
    # idempotent: second write produces no new files
    write_ntriples(read_ntriples(str(src)), out_dir)
    assert sorted(os.listdir(out_dir)) == sorted(
        f for f in os.listdir(out_dir))


def test_triples_to_geoms(ray_session, tmp_path):
    import ray
    src = tmp_path / "g.nt"
    src.write_text("\n".join(FIXTURE) + "\n")
    g = triples_to_geoms(read_ntriples(str(src))).take_all()
    assert len(g) == 1
    assert g[0]["s"] == "http://ex/e"
    assert g[0]["wkt"] == "POINT(1.5 2.5)"
    from geoflow.geom import from_wkb
    geom = from_wkb(g[0]["geom_wkb"])
    import numpy as np
    assert np.asarray(geom.coords).ravel()[:2].tolist() == [1.5, 2.5]


# ---------------------------------------------------------------------------
# GeoParquet interop (io/geoparquet.py)
# ---------------------------------------------------------------------------

def test_geoparquet_roundtrip(ray_session, tmp_path):
    import json
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    from geoflow.io.geoparquet import read_geoparquet, write_geoparquet
    from geoflow.ops import get_op

    wkb = get_op("st_geomfromtext").fn(pa.array(
        ["POINT(1 2)", "POINT(-10 5)", "LINESTRING(0 0, 3 4)"]))
    t = pa.table({"fid": pa.array([1, 2, 3], type=pa.int64()),
                  "geom_wkb": wkb})
    out = str(tmp_path / "gpq")
    write_geoparquet(ray.data.from_arrow(t), out,
                     geometry_types=["Point", "LineString"],
                     compute_bbox=True)
    # file-level contract: geo key present, spec fields populated
    import glob
    f = glob.glob(out + "/*.parquet")[0]
    md = pq.read_schema(f).metadata
    geo = json.loads(md[b"geo"].decode())
    assert geo["version"] == "1.0.0"
    assert geo["primary_column"] == "geom_wkb"
    col = geo["columns"]["geom_wkb"]
    assert col["encoding"] == "WKB"
    assert col["geometry_types"] == ["LineString", "Point"]
    assert col["bbox"] == [-10.0, 0.0, 3.0, 5.0]
    # reader returns data + contract
    ds, geo2 = read_geoparquet(out)
    assert geo2 == geo
    assert sorted(r["fid"] for r in ds.take_all()) == [1, 2, 3]


def test_geoparquet_crs_and_plain_read(ray_session, tmp_path):
    import json
    import ray
    from geoflow.io.geoparquet import read_geoparquet, write_geoparquet
    from geoflow.ops import get_op

    wkb = get_op("st_geomfromtext").fn(pa.array(["POINT(500000 4649776)"]))
    t = pa.table({"geom_wkb": wkb})
    out = str(tmp_path / "gpq_crs")
    write_geoparquet(ray.data.from_arrow(t), out, epsg=32633)
    _, geo = read_geoparquet(out)
    assert geo["columns"]["geom_wkb"]["crs"]["id"] == \
        {"authority": "EPSG", "code": 32633}
    # non-geo parquet: reader degrades to (ds, None)
    plain = str(tmp_path / "plain")
    ray.data.from_arrow(pa.table({"x": [1]})).write_parquet(plain)
    _, geo_none = read_geoparquet(plain)
    assert geo_none is None


# ---------------------------------------------------------------------------
# WARC source (io/warc.py)
# ---------------------------------------------------------------------------

def _warc_fixture_bytes():
    from geoflow.io.warc import make_warc_bytes
    return make_warc_bytes([
        ("http://ex.com/a", "2024-01-01T00:00:00Z", 200, "text/html",
         "<html>alpha page</html>"),
        ("http://ex.com/b", "2024-01-01T00:00:01Z", 404, "text/html",
         "not found"),
        ("http://ex.com/c", "2024-01-01T00:00:02Z", 200,
         "text/plain; charset=utf-8", "café content"),
    ])


def test_parse_warc_records():
    from geoflow.io.warc import parse_warc_bytes
    recs = parse_warc_bytes(_warc_fixture_bytes())
    assert [r["warc_type"] for r in recs] == \
        ["warcinfo", "response", "response", "response"]
    assert recs[1]["target_uri"] == "http://ex.com/a"
    assert recs[1]["payload"].startswith(b"HTTP/1.1 200")
    assert recs[1]["content_length"] == len(recs[1]["payload"])


def test_warc_read_responses_docs(ray_session, tmp_path):
    import gzip
    from geoflow.io.warc import (read_warc, responses_to_docs,
                                 warc_responses)
    raw = _warc_fixture_bytes()
    (tmp_path / "a.warc").write_bytes(raw)
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(raw))
    ds = read_warc([str(tmp_path / "a.warc"),
                    str(tmp_path / "b.warc.gz")])
    recs = ds.take_all()
    assert len(recs) == 8  # both files parse identically
    resp = warc_responses(ds).take_all()
    assert len(resp) == 6
    assert {r["http_status"] for r in resp} == {200, 404}
    assert all(r["http_content_type"] for r in resp)
    docs = responses_to_docs(warc_responses(ds)).take_all()
    # 2xx only; utf-8 decoded
    assert sorted({r["url"] for r in docs}) == \
        ["http://ex.com/a", "http://ex.com/c"]
    texts = {r["url"]: r["text"] for r in docs}
    assert texts["http://ex.com/c"] == "café content"


def test_parse_warc_truncation_errors():
    import pytest as _pt
    from geoflow.io.warc import parse_warc_bytes
    good = _warc_fixture_bytes()
    with _pt.raises(ValueError, match="truncated record payload"):
        parse_warc_bytes(good[:-20])
    # trailing junk after final record parses cleanly (stops at junk)
    recs = parse_warc_bytes(good + b"random trailing bytes")
    assert len(recs) == 4


# ---------------------------------------------------------------------------
# end-to-end web-corpus pipeline (pipelines/webcorpus.py)
# ---------------------------------------------------------------------------

def test_run_webcorpus_end_to_end(ray_session, tmp_path):
    from geoflow.io.warc import make_warc_bytes
    from geoflow.pipelines.webcorpus import run_webcorpus
    body = ("<html><body><p>the quick brown fox jumps over the lazy "
            "dog again and again in this perfectly ordinary test "
            "document with enough words</p></body></html>")
    raw = make_warc_bytes([
        ("http://ex.com/a?utm_source=x", "2024-01-01T00:00:00Z", 200,
         "text/html", body),
        ("http://ex.com/a", "2024-01-01T00:00:01Z", 200,
         "text/html", body),                       # url dup after canon
        ("http://ex.com/b", "2024-01-01T00:00:02Z", 200,
         "text/html", "<p>tiny</p>"),              # low quality
        ("http://ex.com/c", "2024-01-01T00:00:03Z", 404,
         "text/html", body),                       # non-2xx dropped
        ("http://ex.com/d", "2024-01-01T00:00:04Z", 200, "text/html",
         "<html><body><p>a completely different long and reasonable "
         "document about nothing in particular but with plenty of "
         "words to pass the filter</p></body></html>"),
    ])
    (tmp_path / "crawl.warc").write_bytes(raw)
    out = run_webcorpus(str(tmp_path / "crawl.warc"), languages=None,
                        min_quality=0.5, near_dup=False).take_all()
    urls = sorted(r["url"] for r in out)
    # canon-identical pair deduped to one row; tiny + 404 gone
    assert urls == ["http://ex.com/a", "http://ex.com/d"]
    assert all("quick brown fox" in r["text"] or "completely" in
               r["text"] for r in out)
    assert all("<" not in r["text"] for r in out)
