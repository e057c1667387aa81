from .ann import BruteForceTopK, LshTopK, QuerySet, global_topk

__all__ = ["BruteForceTopK", "LshTopK", "QuerySet", "global_topk"]
