from .wkt_text import ExtractWkt, extract_first_point

__all__ = ["ExtractWkt", "extract_first_point"]
