"""Emit the op registry as a functions.ttl-style ontology document.

The reference publishes its function surface as data — one
`geo2:Function` individual per operator (functions.ttl:1-451, README
"GeoSPARQL Ontology extension") — so clients can discover the surface
without reading Java. This is the engine's parallel: one individual per
registered op with arity, category, and the kernel docstring's first
line as rdfs:comment.

    python tools/export_ops_ttl.py > /tmp/geoflow_functions.ttl
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_ttl() -> str:
    import geoflow.ops as ops
    import geoflow.raster.ops  # noqa: F401  (registers rast_*)
    lines = [
        "@prefix geof: <http://geoflow.local/function/> .",
        "@prefix geo2: <http://geoflow.local/ontology#> .",
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .",
        "",
    ]
    for name in sorted(ops.REGISTRY):
        spec = ops.REGISTRY[name]
        doc = (spec.doc or "").strip().splitlines()
        comment = doc[0].replace('"', "'") if doc else ""
        lines.append(f"geof:{name} a geo2:Function ;")
        lines.append(f"    geo2:arity {spec.arity} ;")
        lines.append(f'    geo2:category "{spec.category}" ;')
        lines.append(f'    rdfs:comment "{comment}" .')
        lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    sys.stdout.write(export_ttl())
