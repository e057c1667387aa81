"""Operator registry.

The reference wires 431 function-registry entries in
PostGISConfig.setup() (/root/reference/src/main/de/hsmainz/cs/semgis/arqextension/PostGISConfig.java:372-816).
Here an op is a named vectorized kernel over pyarrow arrays; pipelines
resolve ops by name and apply them inside `map_batches`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

REGISTRY: dict[str, "OpSpec"] = {}


@dataclass(frozen=True)
class OpSpec:
    name: str
    fn: Callable
    arity: int
    category: str
    doc: str = ""


def register_op(name: str, arity: int, category: str):
    def deco(fn):
        REGISTRY[name.lower()] = OpSpec(name.lower(), fn, arity, category,
                                        (fn.__doc__ or "").strip())
        return fn
    return deco


def get_op(name: str) -> OpSpec:
    return REGISTRY[name.lower()]


def list_ops(category: str | None = None):
    if category is None:
        return sorted(REGISTRY)
    return sorted(k for k, v in REGISTRY.items() if v.category == category)
