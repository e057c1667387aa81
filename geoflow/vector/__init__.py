from .ann import (BruteForceTopK, HyperplaneBucketer, IvfTopK, LshTopK,
                  QuerySet, cosine_near_dup_pairs, global_topk,
                  train_ivf_centroids)
from .pq import PqEncoder, PqTopK, pq_topk, train_pq_codebooks

__all__ = ["BruteForceTopK", "HyperplaneBucketer", "IvfTopK", "LshTopK",
           "QuerySet", "cosine_near_dup_pairs", "global_topk",
           "train_ivf_centroids", "PqEncoder", "PqTopK", "pq_topk",
           "train_pq_codebooks"]
