"""Deterministic synthetic web-page corpus generator (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
  url:string  warc_ts:timestamp[us]  html:large_binary  text:large_string
  lang:string

`text` embeds 0–3 WKT literals per row (~70% points, ~20% convex polygons,
~10% none), coordinates formatted with repr(float) for reproducible
extract→parse→unparse. Generation is block-parallel and seeded: block b of
a run with seed s uses numpy PCG64(s, b) so any block can be regenerated
independently (resumable, deterministic across cluster sizes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LANGS = ("en", "de", "fr", "es")
_FILLER = ("the quick brown fox jumps over the lazy dog near",
           "coordinates observed at the station around",
           "survey marker recorded as", "geo reference found here",
           "map excerpt with boundary")


def make_corpus_block(block_id: int, rows: int, seed: int = 42,
                      start_id: int | None = None) -> pa.Table:
    """One deterministic corpus block; `start_id` defaults to
    block_id*rows (contiguous global ids)."""
    rng = np.random.default_rng(np.random.PCG64(seed + 1_000_003 * block_id))
    base = block_id * rows if start_id is None else start_id
    ids = np.arange(base, base + rows, dtype=np.int64)

    urls = [f"https://example.org/page/{i:08d}" for i in ids]
    ts = pa.array((1735689600_000_000 + ids * 1_000_000),
                  type=pa.timestamp("us"))  # 2025-01-01 + i seconds
    langs = [LANGS[int(i) % len(LANGS)] for i in ids]

    n_geoms = rng.choice([0, 1, 2, 3], size=rows, p=[0.10, 0.55, 0.25, 0.10])
    texts = []
    for r in range(rows):
        parts = [_FILLER[int(ids[r]) % len(_FILLER)]]
        for _ in range(int(n_geoms[r])):
            if rng.random() < 0.78:
                lon = float(rng.uniform(-180.0, 180.0))
                lat = float(rng.uniform(-85.0, 85.0))
                parts.append(f"POINT({lon!r} {lat!r})")
            else:
                cx = float(rng.uniform(-170.0, 170.0))
                cy = float(rng.uniform(-75.0, 75.0))
                nv = int(rng.integers(4, 13))
                ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
                # doc-embedded polygons are neighborhood-scale: ≤ ~0.3°
                # (a 2° polygon would cover ~2000 z12 tiles each and the
                # tile table would dwarf the corpus)
                rad = rng.uniform(0.01, 0.3)
                xs = cx + rad * np.cos(ang)
                ys = cy + rad * np.sin(ang)
                ring = ", ".join(f"{x!r} {y!r}" for x, y in zip(xs, ys))
                first = f"{xs[0]!r} {ys[0]!r}"
                parts.append(f"POLYGON(({ring}, {first}))")
            parts.append(_FILLER[int(rng.integers(0, len(_FILLER)))])
        texts.append(" ".join(parts))

    html = [b"<html><body>" + t.encode() + b"</body></html>" for t in texts]
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": ts,
        "html": pa.array(html, type=pa.large_binary()),
        "text": pa.array(texts, type=pa.large_string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def make_corpus_dataset(total_rows: int, rows_per_block: int = 4096,
                        seed: int = 42):
    """ray.data.Dataset of the synthetic corpus, generated *inside* tasks
    (driver never materializes the corpus — scales to arbitrary row counts)."""
    import ray
    import ray.data

    n_blocks = (total_rows + rows_per_block - 1) // rows_per_block
    sizes = [(b, min(rows_per_block, total_rows - b * rows_per_block))
             for b in range(n_blocks)]
    # one Ray block per corpus block → generation parallelism == n_blocks
    ds = ray.data.from_items([{"block_id": b, "rows": r} for b, r in sizes],
                             override_num_blocks=n_blocks)

    def gen(batch):
        tables = [make_corpus_block(int(b), int(r), seed)
                  for b, r in zip(batch["block_id"], batch["rows"])]
        return pa.concat_tables(tables)

    return ds.map_batches(gen, batch_size=1, batch_format="numpy")


def make_polygon_table(n_polys: int, seed: int = 7,
                       hot_cell_frac: float = 0.2) -> pa.Table:
    """Synthetic admin-style convex polygon corpus (join right side;
    FIXTURES.md §2). A fraction is concentrated in one hot area to
    exercise salting."""
    from ..geom import Geometry, to_wkb
    rng = np.random.default_rng(np.random.PCG64(seed))
    ids = np.arange(n_polys, dtype=np.int64)
    wkbs = []
    bounds = np.empty((n_polys, 4))
    n_hot = int(n_polys * hot_cell_frac)
    for i in range(n_polys):
        if i < n_hot:  # hot cluster near (10, 50) — one dense cell
            cx = 10.0 + float(rng.uniform(-0.12, 0.12))
            cy = 50.0 + float(rng.uniform(-0.12, 0.12))
            rad = float(rng.uniform(0.01, 0.1))
        else:
            cx = float(rng.uniform(-170.0, 170.0))
            cy = float(rng.uniform(-75.0, 75.0))
            rad = float(rng.uniform(0.1, 3.0))
        nv = int(rng.integers(4, 10))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        xs = cx + rad * np.cos(ang)
        ys = cy + rad * np.sin(ang)
        ring = np.column_stack([xs, ys])
        ring = np.vstack([ring, ring[:1]])
        g = Geometry.polygon([ring])
        wkbs.append(to_wkb(g))
        bounds[i] = g.bounds()
    return pa.table({
        "poly_id": pa.array(ids),
        "geom_wkb": pa.array(wkbs, type=pa.binary()),
        "name": pa.array([f"admin_{i}" for i in ids]),
        "xmin": pa.array(bounds[:, 0]),
        "ymin": pa.array(bounds[:, 1]),
        "xmax": pa.array(bounds[:, 2]),
        "ymax": pa.array(bounds[:, 3]),
    })
