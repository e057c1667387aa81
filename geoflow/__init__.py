"""geoflow — a Ray-Data-native geospatial data-processing engine.

A from-scratch reimplementation of the query surface of the reference
``analyticservicedev/jena-geo`` (a Jena/ARQ GeoSPARQL + PostGIS-function
extension, see /root/reference) as vectorized Arrow/numpy kernels driven by
``ray.data.Dataset`` pipelines.  No JVM, no GEOS, no external geo libs —
the geometry core (WKT/WKB codecs, predicates, STRtree, S2 cells,
great-circle math) is implemented here in pure numpy/python.

Layout (see SURVEY.md §7):
  geom/      geometry model + codecs + computational geometry + STRtree
  cells/     S2 cell ids, lat/lon grid cells, slippy-map tiles, coverings
  extract/   WKT literal extraction from web-page text
  ops/       the st_* / geof: scalar-function surface as batch kernels
  join/      broadcast + cell-keyed spatial joins, kNN
  text/      dedup (exact / MinHash-LSH / SimHash), language-ID, quality
  vector/    embedding similarity search (brute-force + LSH-bucketed)
  io/        synthetic corpus generator, lineage records, checkpointed writes
  pipelines/ flagship extract→index→join→tile pipeline
"""

__version__ = "0.1.0"

# Vendored bugfix for Ray 2.49's hash-shuffle schema broadcast being
# swallowed by empty first blocks (chained Dataset.join poisoning) —
# version/signature-guarded no-op elsewhere. See geoflow/_rayfix.py.
from ._rayfix import apply_hash_shuffle_schema_fix as _apply_rayfix

RAY_SHUFFLE_FIX_ACTIVE = _apply_rayfix()
