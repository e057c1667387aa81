from .ann import (BruteForceTopK, HyperplaneBucketer, IvfTopK, LshTopK,
                  QuerySet, cosine_near_dup_pairs, global_topk,
                  train_ivf_centroids)

__all__ = ["BruteForceTopK", "HyperplaneBucketer", "IvfTopK", "LshTopK",
           "QuerySet", "cosine_near_dup_pairs", "global_topk",
           "train_ivf_centroids"]
