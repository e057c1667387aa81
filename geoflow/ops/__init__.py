from . import (aggregates, exporters, linestring, measures,  # noqa: F401
               predicates, setops, splitting, srid, temporal, tessellation,
               transforms, units)
from .registry import REGISTRY, get_op, list_ops, register_op

__all__ = ["REGISTRY", "get_op", "list_ops", "register_op", "aggregates",
           "measures", "predicates", "setops", "temporal", "transforms",
           "units"]
