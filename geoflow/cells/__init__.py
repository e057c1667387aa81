from . import grid, h3, s2, tiles

__all__ = ["grid", "h3", "s2", "tiles"]
