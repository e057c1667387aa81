from . import ops  # noqa: F401  (registers rast_* operators)
from .rastwkb import Raster, from_hexwkb, from_wkb, to_hexwkb, to_wkb
from .zonal import zonal_stats

__all__ = ["Raster", "from_hexwkb", "from_wkb", "to_hexwkb", "to_wkb",
           "ops", "zonal_stats"]
