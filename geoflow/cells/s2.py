"""S2 cell ids, pure numpy, vectorized.

Implements the public S2 quadtree scheme (faces → quadratic s/t projection →
leaf i/j → Hilbert-curve position; constants and table construction follow
the published S2 geometry design). Used for the north-rule's S2-level-13
point bucketing (spatial joins key on cells; kNN ring expansion uses
neighbor cells).

All hot functions (`lonlat_to_cell`, `cell_parent`, `cell_to_lonlat`) are
vectorized over numpy uint64 arrays — suitable for `map_batches` kernels
over millions of points per block.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

# position→(i,j) sub-cell order for each orientation, and the orientation
# change at each position (standard S2 Hilbert tables)
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)


def _build_tables():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)

    def init(level, i, j, orig_orient, pos, orient):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orient]
        for k in range(4):
            init(level, i + (r[k] >> 1), j + (r[k] & 1), orig_orient,
                 pos + k, orient ^ _POS_TO_ORIENT[k])

    for o in range(4):
        init(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_tables()


def lonlat_to_xyz(lon, lat):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + 3 * (np.select([face == 0, face == 1], [x, y], z) < 0)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            u[m], v[m] = y[m] / x[m], z[m] / x[m]
        elif f == 1:
            u[m], v[m] = -x[m] / y[m], z[m] / y[m]
        elif f == 2:
            u[m], v[m] = -x[m] / z[m], -y[m] / z[m]
        elif f == 3:
            u[m], v[m] = z[m] / x[m], y[m] / x[m]
        elif f == 4:
            u[m], v[m] = z[m] / y[m], -x[m] / y[m]
        else:
            u[m], v[m] = -y[m] / z[m], -x[m] / z[m]
    return face.astype(np.int64), u, v


def _uv_to_st(u):
    # S2 quadratic projection; sqrt(1+3|u|) form avoids evaluating the
    # negative branch (np.where computes both sides)
    s = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0, s, 1.0 - s)


def _st_to_uv(s):
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _st_to_ij(s):
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0,
                   (1 << MAX_LEVEL) - 1)


def face_ij_to_cell(face, i, j):
    """(face, i, j) leaf coords -> uint64 leaf cell id, vectorized."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(60)
    bits = face & np.uint64(_SWAP)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        sh = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> sh) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> sh) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return n * np.uint64(2) + np.uint64(1)


def cell_to_face_ij(cell):
    """uint64 leaf cell id -> (face, i, j, orientation), vectorized."""
    cell = np.asarray(cell, dtype=np.uint64)
    face = (cell >> np.uint64(61)).astype(np.int64)
    bits = (face & _SWAP).astype(np.uint64)
    i = np.zeros_like(cell)
    j = np.zeros_like(cell)
    for k in range(7, -1, -1):
        nbits = _LOOKUP_BITS if k != 7 else (MAX_LEVEL - 7 * _LOOKUP_BITS)
        pos_mask = np.uint64((1 << (2 * nbits)) - 1)
        bits += ((cell >> np.uint64(k * 2 * _LOOKUP_BITS + 1)) & pos_mask) << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i += (bits >> np.uint64(_LOOKUP_BITS + 2)) << np.uint64(k * _LOOKUP_BITS)
        j += ((bits >> np.uint64(2)) & np.uint64((1 << _LOOKUP_BITS) - 1)) << np.uint64(k * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return face, i.astype(np.int64), j.astype(np.int64), bits.astype(np.int64)


def lonlat_to_cell(lon, lat, level=MAX_LEVEL):
    """lon/lat degrees -> uint64 S2 cell id at `level`, vectorized."""
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = face_ij_to_cell(face, i, j)
    if level >= MAX_LEVEL:
        return leaf
    return cell_parent(leaf, level)


def cell_lsb(level):
    return np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))


def cell_parent(cell, level):
    """Ancestor of `cell` at `level`, vectorized."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell_lsb(level)
    return (cell & ~(lsb - np.uint64(1))) | lsb


def cell_level(cell):
    """Level of each cell id (position of lowest set bit)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb_pos = np.zeros(cell.shape, dtype=np.int64)
    c = cell.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (np.uint64(1) << np.uint64(shift)) - np.uint64(1)
        zero_low = (c & mask) == 0
        lsb_pos += np.where(zero_low, shift, 0)
        c = np.where(zero_low, c >> np.uint64(shift), c)
    return MAX_LEVEL - lsb_pos // 2


def cell_to_lonlat(cell):
    """Center lon/lat of (any-level) cells, vectorized."""
    cell = np.asarray(cell, dtype=np.uint64)
    # promote to leaf center: id + (lsb >> 1) would overflow at leaf; the
    # canonical leaf for a cell's center is (id & ~(lsb-1)) | lsb already —
    # decode ij of the leaf whose bits equal the cell with lsb replaced
    face, i, j, _ = cell_to_face_ij(cell)
    # ij from cell_to_face_ij are the leaf coords of the cell's min corner
    # region; recover center by adding half the cell extent
    lvl = cell_level(cell)
    half = np.where(lvl < MAX_LEVEL, (np.int64(1) << (MAX_LEVEL - lvl - 1)), 0)
    si = (2 * i + 2 * half + 1) / float(1 << (MAX_LEVEL + 1))
    tj = (2 * j + 2 * half + 1) / float(1 << (MAX_LEVEL + 1))
    u = _st_to_uv(si)
    v = _st_to_uv(tj)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        if f == 0:
            x[m], y[m], z[m] = 1.0, u[m], v[m]
        elif f == 1:
            x[m], y[m], z[m] = -u[m], 1.0, v[m]
        elif f == 2:
            x[m], y[m], z[m] = -u[m], -v[m], 1.0
        elif f == 3:
            x[m], y[m], z[m] = -1.0, -v[m], -u[m]
        elif f == 4:
            x[m], y[m], z[m] = v[m], -1.0, -u[m]
        else:
            x[m], y[m], z[m] = v[m], u[m], -1.0
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lon, lat


def cell_token(cell):
    """Hex token (trailing zeros stripped) for display, per S2 convention."""
    cell = np.asarray(cell, dtype=np.uint64)
    out = []
    for c in cell.ravel():
        h = format(int(c), "016x").rstrip("0")
        out.append(h if h else "X")
    return np.array(out)
