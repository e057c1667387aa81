"""Graph algorithms over integer-keyed edge datasets (link analysis
for web corpora: PageRank, connected components)."""

from geoflow.graph.components import connected_components
from geoflow.graph.pagerank import (attach_outdegree, pagerank,
                                    pagerank_oracle_sql,
                                    synth_edges_batch)

__all__ = ["pagerank", "attach_outdegree", "synth_edges_batch",
           "pagerank_oracle_sql", "connected_components"]
