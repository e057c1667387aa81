from . import (aggregates, attrs_ext, clustering, codecs_xml,  # noqa: F401
               editors_ext, exporters, linestring, measures, ops3d,
               predicates, setops, solids, splitting, srid, stub_surface,
               temporal, tessellation, topology, transforms, units)
from .registry import REGISTRY, get_op, list_ops, register_op

__all__ = ["REGISTRY", "get_op", "list_ops", "register_op", "aggregates",
           "measures", "predicates", "setops", "temporal", "transforms",
           "units"]
