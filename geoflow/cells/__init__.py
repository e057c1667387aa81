from . import grid, s2, tiles

__all__ = ["grid", "s2", "tiles"]
