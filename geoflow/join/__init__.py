from .broadcast import BroadcastPIPJoin, PolygonIndex
from .celljoin import (cell_join, cell_join_groupby, cell_join_h3,
                       find_hot_cells,
                       prepare_point_side, prepare_polygon_side)
from .knn import KnnBroadcast, NeighborSet
from .knn_cell import knn_cell_join, knn_h3_join

__all__ = ["BroadcastPIPJoin", "PolygonIndex", "cell_join",
           "cell_join_h3",
           "cell_join_groupby", "find_hot_cells", "prepare_point_side",
           "prepare_polygon_side", "KnnBroadcast", "NeighborSet",
           "knn_cell_join", "knn_h3_join"]
