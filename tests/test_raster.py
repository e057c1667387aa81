"""Raster subsystem tests — codec fixtures from SampleRasters.java,
map algebra, attributes, envelope relations."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.raster import Raster, from_hexwkb, from_wkb, to_hexwkb, to_wkb
from geoflow.ops import get_op

# SampleRasters.java:27-41 — field-by-field documented fixture
MINWKB = ("01" "0000" "0100" "000000000000F03F" "0000000000000040"
          "0000000000000840" "0000000000001040" "0000000000001440"
          "0000000000001840" "0A000000" "0100" "0100" "40" "00" "01")

# SampleRasters.java:47-58 — 3x2 16BSI big-endian
WKB3 = ("00000000013FF00000000000004000000000000000400800000000000040100000"
        "0000000040140000000000004018000000000000000010E6"
        "0003" "0002" "05" "FFFF" "FFFF" "0000" "FFF0" "007F" "000A" "0002")


def test_min_fixture_fields():
    r = from_hexwkb(MINWKB)
    assert (r.scale_x, r.scale_y, r.ip_x, r.ip_y) == (1.0, 2.0, 3.0, 4.0)
    assert (r.skew_x, r.skew_y) == (5.0, 6.0)
    assert r.srid == 10 and (r.width, r.height) == (1, 1)
    assert r.num_bands == 1 and r.nodata[0] == 0
    assert r.bands[0][0, 0] == 1


def test_min_fixture_roundtrip():
    assert to_hexwkb(from_hexwkb(MINWKB)) == MINWKB.upper()


def test_bigendian_16bsi_fixture():
    r = from_hexwkb(WKB3)
    assert (r.width, r.height) == (3, 2)
    assert np.array_equal(r.bands[0], [[-1, 0, -16], [127, 10, 2]])
    # re-encode little-endian, re-read: same values
    r2 = from_wkb(to_wkb(r))
    assert np.array_equal(r2.bands[0], r.bands[0])
    assert r2.srid == r.srid


def _col(*rasters):
    return pa.array([to_wkb(r) for r in rasters], type=pa.binary())


@pytest.fixture
def simple():
    return Raster([np.array([[1, 2], [3, 4]], dtype=np.int16)],
                  [5], [None], 1.0, -1.0, 10.0, 20.0, 0.0, 0.0, 4326)


def test_map_algebra(simple):
    col = _col(simple)
    add = from_wkb(get_op("rast_add").fn(col, col).to_pylist()[0])
    assert np.array_equal(add.bands[0], [[2, 4], [6, 8]])
    mc = from_wkb(get_op("rast_multconst").fn(col, 10).to_pylist()[0])
    assert np.array_equal(mc.bands[0], [[10, 20], [30, 40]])
    binz = from_wkb(get_op("rast_binarize").fn(col, 3).to_pylist()[0])
    assert np.array_equal(binz.bands[0], [[0, 0], [1, 1]])
    div = from_wkb(get_op("rast_div").fn(col, col).to_pylist()[0])
    assert np.array_equal(div.bands[0], [[1, 1], [1, 1]])


def test_filters_and_dct(simple):
    col = _col(simple)
    mx = from_wkb(get_op("rast_maxfilter").fn(col, 3).to_pylist()[0])
    assert mx.bands[0].max() == 4 and mx.bands[0][0, 0] == 4
    d = get_op("rast_dct").fn(col).to_pylist()[0]
    rec = from_wkb(get_op("rast_idct").fn(pa.array([d], type=pa.binary()))
                   .to_pylist()[0])
    assert np.allclose(rec.bands[0], simple.bands[0])


def test_attributes(simple):
    col = _col(simple)
    assert get_op("rast_width").fn(col).to_pylist() == [2]
    assert get_op("rast_height").fn(col).to_pylist() == [2]
    assert get_op("rast_numbands").fn(col).to_pylist() == [1]
    assert get_op("rast_maxvalue").fn(col, 0).to_pylist() == [4.0]
    assert get_op("rast_minvalue").fn(col, 0).to_pylist() == [1.0]
    assert get_op("rast_value").fn(col, 0, 1, 0).to_pylist() == [2.0]
    stats = get_op("rast_summarystats").fn(col, 0).to_pylist()[0]
    assert stats["count"] == 4 and stats["sum"] == 10.0
    assert stats["mean"] == 2.5


def test_nodata_excluded():
    r = Raster([np.array([[0, 5], [0, 7]], dtype=np.int16)], [5], [0])
    col = _col(r)
    assert get_op("rast_minvalue").fn(col, 0).to_pylist() == [5.0]
    s = get_op("rast_summarystats").fn(col, 0).to_pylist()[0]
    assert s["count"] == 2 and s["mean"] == 6.0


def test_georef_coords(simple):
    col = _col(simple)
    w = get_op("rast_rastertoworldcoord").fn(col, 1, 1).to_pylist()[0]
    assert (w["x"], w["y"]) == (11.0, 19.0)
    p = get_op("rast_worldtorastercoord").fn(col, 11.5, 18.5).to_pylist()[0]
    assert (p["col"], p["row"]) == (1, 1)


def test_envelope_and_relations(simple):
    from geoflow.geom import from_wkb as g_from_wkb
    col = _col(simple)
    env = g_from_wkb(get_op("rast_envelope").fn(col).to_pylist()[0])
    assert env.bounds() == (10.0, 18.0, 12.0, 20.0)
    other = Raster([np.ones((2, 2), dtype=np.int16)], [5], [None],
                   1.0, -1.0, 11.0, 19.5, 0.0, 0.0, 4326)
    assert get_op("rast_intersects").fn(col, _col(other)).to_pylist() == [True]
    far = Raster([np.ones((2, 2), dtype=np.int16)], [5], [None],
                 1.0, -1.0, 100.0, 100.0, 0.0, 0.0, 4326)
    assert get_op("rast_disjoint").fn(col, _col(far)).to_pylist() == [True]
    # DistanceTest.java:42-47: distance(r, r) == 0
    assert get_op("rast_distance").fn(col, col).to_pylist() == [0.0]


def test_resize_and_crop(simple):
    col = _col(simple)
    r2 = from_wkb(get_op("rast_resize").fn(col, 4, 4).to_pylist()[0])
    assert (r2.width, r2.height) == (4, 4)
    assert r2.scale_x == 0.5  # extent preserved
    c = from_wkb(get_op("rast_crop").fn(col, 1, 0, 2, 2).to_pylist()[0])
    assert (c.width, c.height) == (1, 2)
    assert np.array_equal(c.bands[0], [[2], [4]])
    assert c.ip_x == 11.0


def test_samealignment(simple):
    col = _col(simple)
    shifted = Raster(simple.bands, simple.pixtypes, simple.nodata,
                     1.0, -1.0, 13.0, 17.0, 0.0, 0.0, 4326)
    off = Raster(simple.bands, simple.pixtypes, simple.nodata,
                 1.0, -1.0, 10.5, 20.0, 0.0, 0.0, 4326)
    assert get_op("rast_sameal").fn(col, _col(shifted)).to_pylist() == [True]
    assert get_op("rast_sameal").fn(col, _col(off)).to_pylist() == [False]


def test_rast_reproject_roundtrip():
    """4326 → 3857 → 4326 nearest-neighbor reprojection: georeference
    maps to the web-mercator bbox and the value grid survives the round
    trip exactly at matching pixel counts."""
    import pyarrow as pa
    from geoflow.geom.crs import lonlat_to_webmercator
    from geoflow.ops import get_op
    from geoflow.raster import Raster, from_wkb as rfw, to_wkb as rtw
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    r = Raster([px], [4], [None], 1.0, -1.0, 0.0, 44.0, 0.0, 0.0, 4326)
    out = get_op("rast_reproject").fn(pa.array([rtw(r)], type=pa.binary()),
                                      3857)
    r2 = rfw(out[0].as_py())
    assert r2.srid == 3857 and (r2.width, r2.height) == (4, 4)
    mx0, my1 = lonlat_to_webmercator(np.array([0.0]), np.array([44.0]))
    assert abs(r2.ip_x - mx0[0]) < 1e-6 and abs(r2.ip_y - my1[0]) < 1e-6
    back = get_op("rast_reproject").fn(pa.array([rtw(r2)], type=pa.binary()),
                                       4326)
    r3 = rfw(back[0].as_py())
    assert r3.srid == 4326
    assert np.array_equal(r3.bands[0], px)


def test_raster_tail_ops():
    """Tiling/memory metadata + value-window relations + geo editors
    (raster class tail)."""
    import pyarrow as pa
    from geoflow.ops import get_op
    from geoflow.raster import Raster, from_wkb as rfw, to_wkb as rtw
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    r = Raster([px], [4], [None], 1.0, -1.0, 0.0, 4.0, 0.0, 0.0, 4326)
    c = pa.array([rtw(r)], type=pa.binary())
    assert get_op("rast_memsize").fn(c)[0].as_py() == 16
    assert get_op("rast_numxtiles").fn(c)[0].as_py() == 1
    assert get_op("rast_tilewidth").fn(c)[0].as_py() == 4
    assert get_op("rast_bandpixeltype").fn(c, 0)[0].as_py() == "8BUI"
    assert get_op("rast_hasnoband").fn(c, 2)[0].as_py()
    assert not get_op("rast_hasnoband").fn(c, 0)[0].as_py()
    assert get_op("rast_nearestvalue").fn(c, 0, 1, 2)[0].as_py() == 9.0
    tiles = get_op("rast_retile").fn(c, 2, 2)[0].as_py()
    assert len(tiles) == 4
    t0 = rfw(tiles[0])
    assert t0.bands[0].ravel().tolist() == [0, 1, 4, 5]
    assert get_op("rast_rasterequals").fn(c, c)[0].as_py()
    # value-window relations vs a raster strictly inside
    r2 = Raster([np.full((2, 2), 5, dtype=np.uint8)], [4], [None],
                1.0, -1.0, 1.0, 3.0, 0.0, 0.0, 4326)
    c2 = pa.array([rtw(r2)], type=pa.binary())
    assert get_op("rast_smallerintersects").fn(c, c2, 0, 100.0)[0].as_py()
    assert not get_op("rast_greaterintersects").fn(c, c2, 0, 100.0)[0].as_py()
    assert get_op("rast_valueintersects").fn(c, c2, 0, 5.0)[0].as_py()
    assert not get_op("rast_valueintersects").fn(c, c2, 0, 200.0)[0].as_py()
    assert get_op("rast_containsproperly").fn(c, c2)[0].as_py()
    assert not get_op("rast_containsproperly").fn(c2, c)[0].as_py()
    # median(=mean±1) of the overlap window [5,6,9,10] is 7.5 → true at 7
    assert get_op("rast_medianintersects").fn(c, c2, 0, 7.0)[0].as_py()
    t = rfw(get_op("rast_translate").fn(c, 10.0, 20.0)[0].as_py())
    assert (t.ip_x, t.ip_y) == (10.0, 24.0)
    s = rfw(get_op("rast_setupperleft").fn(c, 7.0, 8.0)[0].as_py())
    assert (s.ip_x, s.ip_y) == (7.0, 8.0)
    assert get_op("rast_summary").fn(c)[0].as_py().startswith(
        "Raster of 4x4")


def test_covjson_roundtrip():
    """CovJSON codec: Coverage/Grid document round-trips georeference,
    srid and band values exactly."""
    import pyarrow as pa
    from geoflow.ops import get_op
    from geoflow.raster import Raster, from_wkb as rfw, to_wkb as rtw
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    r = Raster([px], [4], [None], 1.0, -1.0, 0.0, 4.0, 0.0, 0.0, 4326)
    c = pa.array([rtw(r)], type=pa.binary())
    cj = get_op("rast_ascoveragejson").fn(c)
    import json
    doc = json.loads(cj[0].as_py())
    assert doc["type"] == "Coverage"
    assert doc["domain"]["domainType"] == "Grid"
    assert doc["ranges"]["band0"]["shape"] == [4, 4]
    back = rfw(get_op("rast_fromcoveragejson").fn(cj)[0].as_py())
    assert back.shape == (4, 4) and back.srid == 4326
    assert np.array_equal(back.bands[0], px.astype(np.float64))
    assert back.envelope() == r.envelope()


def test_raster_codec_roundtrip_fuzz():
    """Random rasters (mixed pixel types, nodata, skew, multiband)
    survive the WKB and hex-WKB codecs exactly."""
    import pyarrow as pa
    from geoflow.raster import Raster, from_wkb as rfw, to_wkb as rtw
    from geoflow.raster.rastwkb import from_hexwkb, to_hexwkb
    rng = np.random.default_rng(99)
    for _ in range(25):
        h, w = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        nb = int(rng.integers(1, 4))
        bands, pts, nod = [], [], []
        for _b in range(nb):
            pt = int(rng.choice([4, 5, 7, 10, 11]))
            dt = {4: np.uint8, 5: np.int16, 7: np.int32,
                  10: np.float32, 11: np.float64}[pt]
            if np.issubdtype(dt, np.integer):
                arr = rng.integers(0, 100, size=(h, w)).astype(dt)
            else:
                arr = rng.standard_normal((h, w)).astype(dt)
            bands.append(arr)
            pts.append(pt)
            nod.append(None if rng.random() < 0.5 else float(
                rng.integers(0, 10)))
        r = Raster(bands, pts, nod,
                   float(rng.uniform(0.1, 2)), -float(rng.uniform(0.1, 2)),
                   float(rng.uniform(-100, 100)), float(rng.uniform(-80, 80)),
                   float(rng.uniform(-0.1, 0.1)), float(rng.uniform(-0.1, 0.1)),
                   4326)
        r2 = rfw(rtw(r))
        assert r2.shape == r.shape and len(r2.bands) == nb
        for bi in range(nb):
            assert np.array_equal(r2.bands[bi], r.bands[bi])
            assert r2.pixtypes[bi] == r.pixtypes[bi]
        assert (r2.scale_x, r2.scale_y, r2.ip_x, r2.ip_y,
                r2.skew_x, r2.skew_y, r2.srid) == \
               (r.scale_x, r.scale_y, r.ip_x, r.ip_y,
                r.skew_x, r.skew_y, r.srid)
        r3 = from_hexwkb(to_hexwkb(r))
        assert np.array_equal(r3.bands[0], r.bands[0])


def test_zonal_stats_semantics(ray_session):
    import ray

    from geoflow.geom import Geometry
    from geoflow.geom.wkb import to_wkb as geom_to_wkb
    from geoflow.raster import Raster, to_wkb, zonal_stats

    # two 4x4 tiles side by side, scale (1, -1) like real imagery
    # (ip at top-left, rows go DOWN); values = tile*16 + idx; nodata=7
    tiles = []
    for t in range(2):
        v = (np.arange(16) + t * 16).reshape(4, 4).astype(np.float64)
        tiles.append(to_wkb(Raster([v], [10], [7.0], 1.0, -1.0,
                                   t * 4.0, 4.0, 0.0, 0.0, 4326)))
    # zone 0: rectangle covering the right half of tile 0 and the
    # left half of tile 1: x in (2, 6), y in (0, 4)
    ring = np.array([[2.0, 0.0], [6.0, 0.0], [6.0, 4.0], [2.0, 4.0],
                     [2.0, 0.0]])
    zones = pa.table({
        "zone_id": pa.array([0], type=pa.int64()),
        "geom_wkb": pa.array([geom_to_wkb(Geometry(3, rings=[ring],
                                                   srid=4326))],
                             type=pa.binary())})
    ds = ray.data.from_arrow(pa.table({
        "rast": pa.array(tiles, type=pa.binary())}))
    out = zonal_stats(ds, zones).take_all()
    assert len(out) == 1
    r = out[0]
    # brute force: pixel (row, col) of tile t has center
    # x = t*4 + col + 0.5, y = 4 - row - 0.5; value = t*16 + row*4+col
    exp = []
    for t in range(2):
        for row in range(4):
            for col in range(4):
                x, y = t * 4 + col + 0.5, 4 - row - 0.5
                v = t * 16 + row * 4 + col
                if 2 < x < 6 and 0 < y < 4 and v != 7:
                    exp.append(v)
    assert r["px_count"] == len(exp)
    assert r["px_sum"] == sum(exp)
    assert r["px_min"] == min(exp) and r["px_max"] == max(exp)
    assert abs(r["px_mean"] - sum(exp) / len(exp)) < 1e-12


def test_zonal_stats_disjoint_zone_absent(ray_session):
    import ray

    from geoflow.geom import Geometry
    from geoflow.geom.wkb import to_wkb as geom_to_wkb
    from geoflow.raster import Raster, to_wkb, zonal_stats
    v = np.ones((2, 2))
    t = to_wkb(Raster([v], [10], [None], 1.0, -1.0, 0.0, 2.0,
                      0.0, 0.0, 4326))
    far = np.array([[100.0, 100.0], [101.0, 100.0], [101.0, 101.0],
                    [100.0, 101.0], [100.0, 100.0]])
    zones = pa.table({
        "zone_id": pa.array([5], type=pa.int64()),
        "geom_wkb": pa.array([geom_to_wkb(Geometry(3, rings=[far],
                                                   srid=4326))],
                             type=pa.binary())})
    ds = ray.data.from_arrow(pa.table({"rast": pa.array([t],
                                                        type=pa.binary())}))
    assert zonal_stats(ds, zones).take_all() == []


def test_rast_clip_crop_and_mask():
    from geoflow.geom import Geometry
    from geoflow.geom.wkb import to_wkb as geom_to_wkb
    from geoflow.ops.registry import get_op
    from geoflow.raster import Raster, from_wkb, to_wkb
    v = np.arange(16, dtype=np.float64).reshape(4, 4)
    rast = to_wkb(Raster([v], [10], [None], 1.0, -1.0, 0.0, 4.0,
                         0.0, 0.0, 4326))
    # triangle over the upper-left area
    tri = np.array([[0.0, 4.0], [3.0, 4.0], [0.0, 1.0], [0.0, 4.0]])
    gw = geom_to_wkb(Geometry(3, rings=[tri], srid=4326))
    out = get_op("rast_clip").fn(pa.array([rast], type=pa.binary()),
                                 gw, -1.0)
    r = from_wkb(out[0].as_py())
    # crop window = bbox pixel window: cols 0..2, rows 0..2
    assert (r.height, r.width) == (3, 3)
    assert (r.ip_x, r.ip_y) == (0.0, 4.0)
    b = r.bands[0]
    # centers (x=c+0.5, y=3.5-r) inside x+ (4-y) <= 3 i.e. c <= 2-r
    exp = np.full((3, 3), -1.0)
    for row in range(3):
        for colm in range(3):
            if colm + row <= 2:
                exp[row, colm] = v[row, colm]
    assert np.array_equal(b, exp)
    assert r.nodata[0] == -1.0


def test_rast_clip_disjoint_empty():
    from geoflow.geom import Geometry
    from geoflow.geom.wkb import to_wkb as geom_to_wkb
    from geoflow.ops.registry import get_op
    from geoflow.raster import Raster, from_wkb, to_wkb
    rast = to_wkb(Raster([np.ones((2, 2))], [10], [None], 1.0, -1.0,
                         0.0, 2.0, 0.0, 0.0, 4326))
    far = np.array([[50.0, 50.0], [51.0, 50.0], [51.0, 51.0],
                    [50.0, 50.0]])
    gw = geom_to_wkb(Geometry(3, rings=[far], srid=4326))
    out = get_op("rast_clip").fn(pa.array([rast], type=pa.binary()), gw)
    r = from_wkb(out[0].as_py())
    assert r.is_empty


class TestNetCDF:
    def _raster(self):
        import numpy as np
        from geoflow.raster.rastwkb import (PT_8BUI, PT_16BSI, PT_32BF,
                                            Raster)
        return Raster(
            [np.arange(12, dtype=np.uint8).reshape(3, 4) * 20,
             np.array([[-5, 300], [7, -32768], [0, 1]],
                      dtype=np.int16).repeat(2, axis=1),
             np.linspace(-1, 1, 12, dtype=np.float32).reshape(3, 4)],
            [PT_8BUI, PT_16BSI, PT_32BF], [255.0, None, -1.0],
            scale_x=0.5, scale_y=-0.5, ip_x=10.0, ip_y=20.0, srid=4326)

    def test_roundtrip_bands_types_georef(self):
        import numpy as np
        from geoflow.raster.netcdfio import nc_decode, nc_encode
        r = self._raster()
        r2 = nc_decode(nc_encode(r))
        assert len(r2.bands) == 3
        for a, b in zip(r.bands, r2.bands):
            assert np.array_equal(a, b) and a.dtype == b.dtype
        assert r2.pixtypes == r.pixtypes
        assert r2.nodata == r.nodata
        assert (r2.scale_x, r2.scale_y, r2.ip_x, r2.ip_y, r2.srid) == \
            (0.5, -0.5, 10.0, 20.0, 4326)

    def test_header_spec_anchors(self):
        """Byte-level anchors from the Unidata classic spec: magic,
        dim-list tag 0x0A, attr tag 0x0C, var tag 0x0B, big-endian."""
        import struct
        from geoflow.raster.netcdfio import nc_encode
        buf = nc_encode(self._raster())
        assert buf[:4] == b"CDF\x01"
        assert struct.unpack_from(">i", buf, 4)[0] == 0  # numrecs
        assert struct.unpack_from(">ii", buf, 8) == (0x0A, 2)  # 2 dims
        # dim 0: name "y" (len 1, padded to 4) then size 3
        assert struct.unpack_from(">i", buf, 16)[0] == 1
        assert buf[20:21] == b"y"
        assert struct.unpack_from(">i", buf, 24)[0] == 3

    def test_record_variable_and_cdf2_decode(self):
        """Hand-crafted CDF-2 file with one record variable exercises
        the general-reader paths our encoder never writes (64-bit
        begin offsets, unlimited dimension, per-record layout)."""
        import struct
        import numpy as np
        from geoflow.raster.netcdfio import nc_parse
        hdr = [b"CDF\x02", struct.pack(">i", 2)]          # 2 records
        hdr.append(struct.pack(">ii", 0x0A, 2))           # dims
        hdr.append(struct.pack(">i", 4) + b"time" +
                   struct.pack(">i", 0))                  # record dim
        hdr.append(struct.pack(">i", 1) + b"x\x00\x00\x00" +
                   struct.pack(">i", 3))
        hdr.append(struct.pack(">ii", 0, 0))              # no gatts
        hdr.append(struct.pack(">ii", 0x0B, 1))           # 1 var
        hdr.append(struct.pack(">i", 1) + b"v\x00\x00\x00")
        hdr.append(struct.pack(">ii", 2, 0) +
                   struct.pack(">i", 1))                  # dims time,x
        hdr.append(struct.pack(">ii", 0, 0))              # no vatts
        hdr.append(struct.pack(">ii", 4, 12))             # NC_INT vsize
        head = b"".join(hdr)
        begin = len(head) + 8
        blob = head + struct.pack(">q", begin) + \
            np.arange(6, dtype=">i4").tobytes()
        dims, gatts, nvars = nc_parse(blob)
        assert dims == [("time", 0), ("x", 3)]
        v = nvars[0]
        assert v["name"] == "v" and v["data"].shape == (2, 3)
        assert v["data"].tolist() == [[0, 1, 2], [3, 4, 5]]

    def test_rejects_non_netcdf(self):
        import pytest
        from geoflow.raster.netcdfio import nc_decode
        with pytest.raises(ValueError):
            nc_decode(b"nope")
        with pytest.raises(ValueError):
            nc_decode(b"CDF\x05xxxx")


class TestGMLCOV:
    def test_roundtrip(self):
        import numpy as np
        from geoflow.raster.gmlcovio import gmlcov_decode, gmlcov_encode
        from geoflow.raster.rastwkb import PT_8BUI, PT_64BF, Raster
        r = Raster([np.arange(6, dtype=np.uint8).reshape(2, 3),
                    np.array([[0.5, -1.25, 3.0], [9.0, 0.0, 2.5]])],
                   [PT_8BUI, PT_64BF], [255.0, None],
                   scale_x=2.0, scale_y=-2.0, ip_x=100.0, ip_y=200.0,
                   srid=3857)
        r2 = gmlcov_decode(gmlcov_encode(r))
        for a, b in zip(r.bands, r2.bands):
            assert np.array_equal(a, b) and a.dtype == b.dtype
        assert r2.pixtypes == r.pixtypes and r2.nodata == r.nodata
        assert (r2.scale_x, r2.scale_y, r2.ip_x, r2.ip_y, r2.srid) == \
            (2.0, -2.0, 100.0, 200.0, 3857)

    def test_foreign_namespace_prefixes(self):
        """Decoder matches local names — a differently-prefixed,
        attribute-less external coverage still parses."""
        from geoflow.raster.gmlcovio import gmlcov_decode
        xml = """<cov:RectifiedGridCoverage
            xmlns:cov="http://www.opengis.net/gmlcov/1.0"
            xmlns:g="http://www.opengis.net/gml/3.2">
          <g:domainSet><g:RectifiedGrid dimension="2">
            <g:limits><g:GridEnvelope>
              <g:low>0 0</g:low><g:high>1 1</g:high>
            </g:GridEnvelope></g:limits>
            <g:origin><g:Point
              srsName="urn:ogc:def:crs:EPSG::4326">
              <g:pos>5 6</g:pos></g:Point></g:origin>
            <g:offsetVector>1 0</g:offsetVector>
            <g:offsetVector>0 -1</g:offsetVector>
          </g:RectifiedGrid></g:domainSet>
          <g:rangeSet><g:DataBlock><g:rangeParameters/>
            <g:tupleList>1 2 3 4</g:tupleList>
          </g:DataBlock></g:rangeSet>
        </cov:RectifiedGridCoverage>"""
        r = gmlcov_decode(xml)
        assert r.bands[0].tolist() == [[1.0, 2.0], [3.0, 4.0]]
        assert r.srid == 4326 and (r.ip_x, r.ip_y) == (5.0, 6.0)

    def test_registered_ops_roundtrip(self):
        import numpy as np
        import pyarrow as pa
        from geoflow.ops import get_op
        from geoflow.raster.rastwkb import (PT_8BUI, Raster, from_wkb,
                                            to_wkb)
        r = Raster([np.arange(4, dtype=np.uint8).reshape(2, 2)],
                   [PT_8BUI], [None], 1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0)
        col = pa.array([to_wkb(r), None], type=pa.binary())
        for enc, dec in (("rast_asnetcdf", "rast_fromnetcdf"),
                         ("rast_asgmlcov", "rast_fromgmlcov")):
            o = get_op(dec).fn(get_op(enc).fn(col))
            assert np.array_equal(from_wkb(o[0].as_py()).bands[0],
                                  r.bands[0])
            assert o[1].as_py() is None


class TestAsciiGrid:
    def test_roundtrip_values_and_georef(self):
        import numpy as np
        from geoflow.raster.rastwkb import (PT_64BF, Raster,
                                            from_asciigrid, to_asciigrid)
        r = Raster([np.array([[1.5, 2.0], [3.0, -9999.0]])],
                   [PT_64BF], [-9999.0], scale_x=2.0, scale_y=-2.0,
                   ip_x=10.0, ip_y=20.0, srid=4326)
        r2 = from_asciigrid(to_asciigrid(r), srid=4326)
        assert np.array_equal(r2.bands[0], r.bands[0])
        assert (r2.scale_x, r2.scale_y, r2.ip_x, r2.ip_y) == \
            (2.0, -2.0, 10.0, 20.0)
        assert r2.nodata[0] == -9999.0

    def test_center_variant_and_case(self):
        from geoflow.raster.rastwkb import from_asciigrid
        r = from_asciigrid(
            "NCOLS 2\nNROWS 1\nXLLCENTER 1.0\nYLLCENTER 1.0\n"
            "cellsize 2\n5 6")
        assert (r.ip_x, r.ip_y) == (0.0, 2.0)
        assert r.bands[0].tolist() == [[5.0, 6.0]]

    def test_rejects_bad_grids(self):
        import numpy as np
        import pytest
        from geoflow.raster.rastwkb import (PT_64BF, Raster,
                                            from_asciigrid, to_asciigrid)
        with pytest.raises(ValueError):
            from_asciigrid("ncols 2\nnrows 2\nxllcorner 0\n"
                           "yllcorner 0\ncellsize 1\n1 2 3")  # 3 != 4
        rect = Raster([np.zeros((2, 2))], [PT_64BF], [None],
                      scale_x=2.0, scale_y=-1.0, ip_x=0.0, ip_y=2.0)
        with pytest.raises(ValueError):
            to_asciigrid(rect)  # non-square cells

    def test_registered_ops_roundtrip(self):
        import numpy as np
        import pyarrow as pa
        from geoflow.ops import get_op
        from geoflow.raster.rastwkb import (PT_64BF, Raster, from_wkb,
                                            to_wkb)
        r = Raster([np.array([[7.0, 8.0]])], [PT_64BF], [None],
                   1.0, -1.0, 0.0, 1.0, 0.0, 0.0, 0)
        col = pa.array([to_wkb(r), None], type=pa.binary())
        o = get_op("rast_fromasciigrid").fn(
            get_op("rast_asasciigrid").fn(col))
        assert np.array_equal(from_wkb(o[0].as_py()).bands[0], r.bands[0])
        assert o[1].as_py() is None
