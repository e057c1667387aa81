from .synth import make_corpus_block, make_corpus_dataset, make_polygon_table

__all__ = ["make_corpus_block", "make_corpus_dataset", "make_polygon_table"]
from .geojson_sink import to_geojson_features, write_geojson  # noqa: F401
