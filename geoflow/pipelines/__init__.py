from .flagship import (assign_tiles, extract_geoms, run_flagship,
                       run_flagship_fused, to_points)

__all__ = ["assign_tiles", "extract_geoms", "run_flagship",
           "run_flagship_fused", "to_points"]
from .builder import (ApplyOp, CellIndex, DedupExact, ExtractGeoms,  # noqa
                      FilterBatch, Pipeline, SpatialJoin, Stage,
                      TileAssign, ToPoints, WriteParquet)
