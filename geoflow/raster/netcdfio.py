"""NetCDF-3 "classic" raster codec — pure stdlib/numpy.

Closes the reference's NetCDFDatatype surface
(datatype/raster/NetCDFDatatype.java:23 — a stub that throws
UnsupportedOperationException; Apache-SIS-backed by intent). Implemented
from the PUBLIC NetCDF classic format specification (Unidata, "The
NetCDF Classic Format Specification", CDF-1/CDF-2 magic 'CDF\\x01' /
'CDF\\x02'): big-endian header with dim/gatt/var lists, 4-byte value
padding, fixed-size variables at absolute offsets, record variables
interleaved per record.

Encoder writes one file per raster: dims (y, x), one variable per band
(``band1``..``bandN``), CF-style ``_FillValue`` per band,
``_Unsigned = "true"`` for unsigned pixel types (the classic format has
no unsigned integer types — the documented netCDF convention), and the
geoflow georeference as global attributes (scale_x/scale_y/ip_x/ip_y/
skew_x/skew_y/srid). Decoder is a general classic reader for numeric
non-record AND record variables (CDF-1 and CDF-2 offsets), mapping back
through the same conventions.
"""

from __future__ import annotations

import struct

import numpy as np

from .rastwkb import (PT_8BSI, PT_8BUI, PT_16BSI, PT_16BUI, PT_32BSI,
                      PT_32BF, PT_64BF, Raster)

__all__ = ["nc_encode", "nc_decode"]

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6

_NC_DTYPE = {NC_BYTE: ">i1", NC_CHAR: "S1", NC_SHORT: ">i2",
             NC_INT: ">i4", NC_FLOAT: ">f4", NC_DOUBLE: ">f8"}
_NC_SIZE = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4,
            NC_FLOAT: 4, NC_DOUBLE: 8}

# pixel type → (nc_type, unsigned?)
_PT_NC = {PT_8BSI: (NC_BYTE, False), PT_8BUI: (NC_BYTE, True),
          PT_16BSI: (NC_SHORT, False), PT_16BUI: (NC_SHORT, True),
          PT_32BSI: (NC_INT, False), PT_32BF: (NC_FLOAT, False),
          PT_64BF: (NC_DOUBLE, False)}
# (nc_type, unsigned?) → (pixel type, numpy view dtype)
_NC_PT = {(NC_BYTE, False): (PT_8BSI, "i1"), (NC_BYTE, True): (PT_8BUI, "u1"),
          (NC_SHORT, False): (PT_16BSI, "i2"),
          (NC_SHORT, True): (PT_16BUI, "u2"),
          (NC_INT, False): (PT_32BSI, "i4"),
          (NC_FLOAT, False): (PT_32BF, "f4"),
          (NC_DOUBLE, False): (PT_64BF, "f8")}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


def _w_name(out: list, name: str) -> None:
    b = name.encode("utf-8")
    out.append(struct.pack(">i", len(b)))
    out.append(b + b"\x00" * _pad4(len(b)))


def _w_att_values(out: list, nc_type: int, values) -> None:
    out.append(struct.pack(">i", nc_type))
    if nc_type == NC_CHAR:
        b = values.encode("utf-8") if isinstance(values, str) else bytes(values)
        out.append(struct.pack(">i", len(b)))
        out.append(b + b"\x00" * _pad4(len(b)))
    else:
        arr = np.asarray(values, dtype=_NC_DTYPE[nc_type]).ravel()
        out.append(struct.pack(">i", arr.size))
        raw = arr.tobytes()
        out.append(raw + b"\x00" * _pad4(len(raw)))


def _w_att_list(out: list, atts: list) -> None:
    """atts: [(name, nc_type, values), ...]"""
    if not atts:
        out.append(struct.pack(">ii", 0, 0))  # ABSENT
        return
    out.append(struct.pack(">ii", 0x0C, len(atts)))  # NC_ATTRIBUTE
    for name, t, v in atts:
        _w_name(out, name)
        _w_att_values(out, t, v)


def nc_encode(r: Raster) -> bytes:
    """Raster → NetCDF-3 classic (CDF-1) bytes."""
    h, w = r.height, r.width
    out: list = [b"CDF\x01", struct.pack(">i", 0)]  # numrecs = 0
    # dim_list: y, x (both fixed)
    out.append(struct.pack(">ii", 0x0A, 2))  # NC_DIMENSION
    _w_name(out, "y")
    out.append(struct.pack(">i", h))
    _w_name(out, "x")
    out.append(struct.pack(">i", w))
    # global attributes: georeference
    gatts = [("scale_x", NC_DOUBLE, r.scale_x),
             ("scale_y", NC_DOUBLE, r.scale_y),
             ("ip_x", NC_DOUBLE, r.ip_x), ("ip_y", NC_DOUBLE, r.ip_y),
             ("skew_x", NC_DOUBLE, r.skew_x),
             ("skew_y", NC_DOUBLE, r.skew_y),
             ("srid", NC_INT, r.srid),
             ("Conventions", NC_CHAR, "CF-1.0")]
    _w_att_list(out, gatts)
    # variable list (fixed-size; begin offsets patched after layout)
    nb = len(r.bands)
    if nb == 0:
        out.append(struct.pack(">ii", 0, 0))  # ABSENT var list
        return b"".join(out)
    out.append(struct.pack(">ii", 0x0B, nb))  # NC_VARIABLE
    payloads = []
    begin_slots = []
    for i, (band, pt) in enumerate(zip(r.bands, r.pixtypes)):
        if pt not in _PT_NC:
            raise ValueError(f"netcdf: pixel type {pt} unsupported "
                             f"(supported: {sorted(_PT_NC)})")
        nct, unsigned = _PT_NC[pt]
        _w_name(out, f"band{i + 1}")
        out.append(struct.pack(">iii", 2, 0, 1))  # ndims=2, dimids y,x
        vatts = []
        nod = r.nodata[i] if i < len(r.nodata) else None
        if nod is not None:
            # _FillValue rides in the DECODED value space; for an
            # unsigned band stored in a signed nc type, wrap it
            fv = nod
            if unsigned:
                bits = 8 * _NC_SIZE[nct]
                fv = int(nod) - (1 << bits) if nod >= (1 << (bits - 1)) \
                    else int(nod)
            vatts.append(("_FillValue", nct, fv))
        if unsigned:
            vatts.append(("_Unsigned", NC_CHAR, "true"))
        _w_att_list(out, vatts)
        # C-cast semantics: unsigned bands wrap into the signed nc
        # type (u1 255 → i1 -1) and unwrap via _Unsigned on decode
        data = np.ascontiguousarray(band).astype(_NC_DTYPE[nct])
        raw = data.tobytes() + b"\x00" * _pad4(band.size * _NC_SIZE[nct])
        payloads.append(raw)
        vsize = len(raw)
        out.append(struct.pack(">ii", nct, vsize))
        begin_slots.append(sum(len(p) for p in out))  # patch position
        out.append(struct.pack(">i", 0))  # begin placeholder
    header = b"".join(out)
    blob = bytearray(header)
    pos = len(header)
    for slot, raw in zip(begin_slots, payloads):
        struct.pack_into(">i", blob, slot, pos)
        pos += len(raw)
    return bytes(blob) + b"".join(payloads)


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.p = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.b, self.p)
        self.p += 4
        return v

    def u4(self) -> int:
        (v,) = struct.unpack_from(">I", self.b, self.p)
        self.p += 4
        return v

    def i8(self) -> int:
        (v,) = struct.unpack_from(">q", self.b, self.p)
        self.p += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.b[self.p:self.p + n].decode("utf-8")
        self.p += n + _pad4(n)
        return s

    def att_values(self):
        t = self.i4()
        n = self.i4()
        sz = n * _NC_SIZE[t]
        raw = self.b[self.p:self.p + sz]
        self.p += sz + _pad4(sz)
        if t == NC_CHAR:
            return raw.decode("utf-8", "replace")
        arr = np.frombuffer(raw, dtype=_NC_DTYPE[t])
        return arr[0] if n == 1 else arr

    def att_list(self) -> dict:
        tag = self.i4()
        n = self.i4()
        if tag == 0 and n == 0:
            return {}
        if tag != 0x0C:
            raise ValueError("netcdf: bad attribute-list tag")
        return {self.name(): self.att_values() for _ in range(n)}


def nc_parse(buf: bytes):
    """Parse classic NetCDF bytes → (dims, gatts, vars) where vars is
    [{name, dims, atts, nc_type, data(np.ndarray)}]. Handles CDF-1 and
    CDF-2 offsets, fixed and record variables."""
    if len(buf) < 8 or buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file (CDF-1/CDF-2)")
    version = buf[3]
    rd = _Reader(buf)
    rd.p = 4
    numrecs = rd.u4()  # 0xFFFFFFFF = streaming; resolved below
    tag = rd.i4()
    n = rd.i4()
    dims = []
    if tag == 0x0A:
        dims = [(rd.name(), rd.i4()) for _ in range(n)]
    elif not (tag == 0 and n == 0):
        raise ValueError("netcdf: bad dimension-list tag")
    gatts = rd.att_list()
    tag = rd.i4()
    n = rd.i4()
    raw_vars = []
    if tag == 0x0B:
        for _ in range(n):
            nm = rd.name()
            nd = rd.i4()
            dimids = [rd.i4() for _ in range(nd)]
            atts = rd.att_list()
            nct = rd.i4()
            vsize = rd.u4()
            begin = rd.i8() if version == 2 else rd.u4()
            raw_vars.append((nm, dimids, atts, nct, vsize, begin))
    elif not (tag == 0 and n == 0):
        raise ValueError("netcdf: bad variable-list tag")
    rec_vars = [v for v in raw_vars if v[1] and dims[v[1][0]][1] == 0]
    recsize = sum(v[4] for v in rec_vars)
    if numrecs == 0xFFFFFFFF:  # streaming: infer from file length
        first = min((v[5] for v in rec_vars), default=len(buf))
        numrecs = (len(buf) - first) // recsize if recsize else 0
    out_vars = []
    for nm, dimids, atts, nct, vsize, begin in raw_vars:
        shape = [dims[d][1] for d in dimids]
        is_rec = bool(dimids) and shape[0] == 0
        dt = np.dtype(_NC_DTYPE[nct])
        if is_rec:
            per_rec = int(np.prod(shape[1:], dtype=np.int64))
            rows = []
            # special case (spec): a SINGLE record variable is packed
            # contiguously without per-record padding
            step = recsize if len(rec_vars) > 1 else \
                per_rec * _NC_SIZE[nct]
            for rec in range(numrecs):
                off = begin + rec * step
                rows.append(np.frombuffer(
                    buf, dtype=dt, count=per_rec, offset=off))
            data = (np.stack(rows).reshape([numrecs] + shape[1:])
                    if rows else np.empty([0] + shape[1:], dt))
            shape = [numrecs] + shape[1:]
        else:
            cnt = int(np.prod(shape, dtype=np.int64)) if shape else 1
            data = np.frombuffer(buf, dtype=dt, count=cnt,
                                 offset=begin).reshape(shape)
        out_vars.append({"name": nm, "dims": [dims[d][0] for d in dimids],
                         "atts": atts, "nc_type": nct, "data": data})
    return dims, gatts, out_vars


def nc_decode(buf: bytes) -> Raster:
    """Classic NetCDF bytes → Raster: every 2-D numeric variable
    becomes a band (geoflow encoder conventions honored; arbitrary
    classic files accepted as long as one 2-D numeric var exists)."""
    dims, gatts, nvars = nc_parse(buf)

    def g(name, default):
        v = gatts.get(name)
        return default if v is None else (
            float(v) if name != "srid" else int(v))

    bands, pixtypes, nodata = [], [], []
    for v in nvars:
        if v["nc_type"] == NC_CHAR or v["data"].ndim != 2:
            continue
        unsigned = str(v["atts"].get("_Unsigned", "")).lower() == "true"
        key = (v["nc_type"], unsigned)
        if key not in _NC_PT:
            continue
        pt, view = _NC_PT[key]
        arr = v["data"].astype(v["data"].dtype.newbyteorder("="))
        if unsigned:
            arr = arr.view(view)
        bands.append(arr)
        pixtypes.append(pt)
        fv = v["atts"].get("_FillValue")
        if fv is None:
            nodata.append(None)
        else:
            f = float(fv)
            if unsigned and f < 0:
                f += float(1 << (8 * _NC_SIZE[v["nc_type"]]))
            nodata.append(f)
    if not bands:
        raise ValueError("netcdf: no 2-D numeric variable found")
    return Raster(bands, pixtypes, nodata,
                  g("scale_x", 1.0), g("scale_y", -1.0),
                  g("ip_x", 0.0), g("ip_y", 0.0),
                  g("skew_x", 0.0), g("skew_y", 0.0),
                  int(gatts.get("srid", 0)))
