from graph_mining_spark.operators.connected_components import connected_components
from graph_mining_spark.operators.pagerank import pagerank
from graph_mining_spark.operators.triangles import triangle_counts
from graph_mining_spark.operators.affinity import affinity_cluster, AffinityConfig
from graph_mining_spark.operators.quick_cluster import quick_cluster
from graph_mining_spark.operators.shortest_paths import sssp
from graph_mining_spark.operators.similarity import pairwise_similarity

__all__ = [
    "connected_components",
    "pagerank",
    "triangle_counts",
    "affinity_cluster",
    "AffinityConfig",
    "quick_cluster",
    "sssp",
    "pairwise_similarity",
]
