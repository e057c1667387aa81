from .ann import (BruteForceTopK, HyperplaneBucketer, LshTopK, QuerySet,
                  cosine_near_dup_pairs, global_topk)

__all__ = ["BruteForceTopK", "HyperplaneBucketer", "LshTopK", "QuerySet",
           "cosine_near_dup_pairs", "global_topk"]
