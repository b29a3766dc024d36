"""graph_mining_spark — a PySpark-native link-graph analytics engine.

A brand-new engine (NOT a port) with the query capabilities of
google/graph-mining's in-memory parallel graph library, re-expressed
Spark-first: one edge DataFrame ``(src: long, dst: long, weight: double)``
plus a vertex dictionary, with every algorithm a driver-side loop over
declarative join/groupBy supersteps; vectorized pandas/Arrow UDFs are used
only where DataFrame ops genuinely can't express the kernel.

Reference parity targets (file:line cites are to /root/reference):
  - connected components  : in_memory/connected_components/*
  - PageRank              : in_memory/pagerank/*
  - affinity clustering   : in_memory/clustering/affinity/* (label propagation)
  - triangle counting     : in_memory/clustering/triangle_counting/ (gbbs)
  - graph build semantics : in_memory/clustering/graph.h, gbbs_graph.h,
                            undirected_converter_graph.cc
"""

from graph_mining_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
