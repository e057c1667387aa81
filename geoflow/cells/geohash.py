"""Geohash cells (Niemeyer 2008, public domain spec): base-32 strings
whose bits interleave longitude (first/even positions from the MSB)
and latitude over recursive bisection of [-180,180]×[-90,90].

Encoding here is the closed integer form: with 5·precision bits split
as ceil/floor between lon/lat,

    ix = clamp(floor((lon+180)/360 · 2^nlon), 0, 2^nlon − 1)
    iy = clamp(floor((lat+ 90)/180 · 2^nlat), 0, 2^nlat − 1)
    V  = interleave(ix@odd, iy@even)        # lon at the MSB
    char_i = ALPHABET[(V >> (5·(precision−1−i))) & 31]

Both floor expressions are single IEEE double chains written
identically in numpy and DuckDB (the tile_z12 parity lever), and the
interleave is pure bit arithmetic, so geohashes hash-match the SQL
oracle char-for-char. Verified against the published test vector
(ezs42) and neighbor-prefix semantics in tests.

Shape: one stateless map_batches pass; strings are assembled as an
(n × precision) codepoint matrix viewed as numpy 'U' strings — no
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ops.spacecurve import morton_key

__all__ = ["geohash_encode", "geohash_cells", "geohash_oracle_sql",
           "ALPHABET"]

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_CODES = np.frombuffer(ALPHABET.encode("utf-32-le"), dtype=np.uint32)


def geohash_encode(lon: np.ndarray, lat: np.ndarray,
                   precision: int = 8):
    """(geohash U-strings, int64 cell key V) for double arrays."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    ix = np.floor((np.asarray(lon) + 180.0) / 360.0 * float(1 << nlon))
    iy = np.floor((np.asarray(lat) + 90.0) / 180.0 * float(1 << nlat))
    ix = np.clip(ix, 0, (1 << nlon) - 1).astype(np.int64)
    iy = np.clip(iy, 0, (1 << nlat) - 1).astype(np.int64)
    # lon occupies the leading (MSB) bit of the 5·precision stream:
    # even precision → lon bits land at odd LSB positions (2b+1);
    # odd precision → lon bits land at even LSB positions (2b)
    if nlon == nlat:
        v = morton_key(iy, ix, bits=nlon)
    else:
        v = morton_key(ix, iy, bits=nlon)
    shifts = 5 * (precision - 1 - np.arange(precision, dtype=np.int64))
    mat = ((v[:, None] >> shifts[None, :]) & 31).astype(np.int64)
    cp = _CODES[mat]
    gh = np.ascontiguousarray(cp).view(f"<U{precision}").ravel()
    return gh, v


def geohash_cells(ds, precision: int = 8, x_col: str = "x",
                  y_col: str = "y", id_col: str = "doc_id"):
    """(doc_id, geohash, cell_key) — one stateless map pass."""
    def assign(b: pa.Table) -> pa.Table:
        x = b.column(x_col).to_numpy(zero_copy_only=False)
        y = b.column(y_col).to_numpy(zero_copy_only=False)
        gh, v = geohash_encode(x, y, precision)
        return pa.table({id_col: b.column(id_col),
                         "geohash": pa.array(gh, pa.string()),
                         "cell_key": pa.array(v, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


def geohash_oracle_sql(points_sql: str, precision: int = 8,
                       id_col: str = "doc_id") -> str:
    """DuckDB oracle generated from the same constants: the floor/clamp
    chains written op-for-op and the interleave unrolled as arithmetic
    terms; characters picked from the alphabet literal by substr."""
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    # even precision: lon bit b at LSB position 2b+1, lat at 2b;
    # odd precision: lon at 2b, lat at 2b+1 (lon always leads the MSB)
    lon_off, lat_off = (1, 0) if nlon == nlat else (0, 1)
    terms = [f"((ix // {1 << b}) % 2) * {1 << (2 * b + lon_off)}"
             for b in range(nlon)]
    terms += [f"((iy // {1 << b}) % 2) * {1 << (2 * b + lat_off)}"
              for b in range(nlat)]
    chars = " || ".join(
        f"substr('{ALPHABET}', CAST((v // {1 << (5 * (precision - 1 - i))}) % 32 AS INT) + 1, 1)"
        for i in range(precision))
    return f"""
WITH p AS MATERIALIZED (
  SELECT {id_col},
         CAST(LEAST(GREATEST(floor((x + 180.0)/360.0 * {float(1 << nlon)!r}), 0), {(1 << nlon) - 1}) AS BIGINT) AS ix,
         CAST(LEAST(GREATEST(floor((y + 90.0)/180.0 * {float(1 << nlat)!r}), 0), {(1 << nlat) - 1}) AS BIGINT) AS iy
  FROM ({points_sql})),
vt AS (SELECT {id_col}, {" + ".join(terms)} AS v FROM p)
SELECT {id_col}, {chars} AS geohash, CAST(v AS BIGINT) AS cell_key
FROM vt"""
