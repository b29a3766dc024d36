from graph_mining_spark.operators.connected_components import connected_components
from graph_mining_spark.operators.pagerank import pagerank
from graph_mining_spark.operators.triangles import triangle_counts
from graph_mining_spark.operators.affinity import affinity_cluster, AffinityConfig
from graph_mining_spark.operators.correlation import (
    correlation_cluster,
    CorrelationConfig,
    modularity_cluster,
)
from graph_mining_spark.operators.coconductance import (
    coconductance_cluster,
    CoconductanceConfig,
)
from graph_mining_spark.operators.hac import parhac, ParHacConfig, flatten_dendrogram
from graph_mining_spark.operators.dynamic_hac import DynamicHac, UpdateStats
from graph_mining_spark.operators.terahac import terahac, TeraHacConfig
from graph_mining_spark.operators.label_propagation import label_propagation
from graph_mining_spark.operators.quick_cluster import quick_cluster
from graph_mining_spark.operators.shortest_paths import sssp
from graph_mining_spark.operators.similarity import pairwise_similarity
from graph_mining_spark.operators.size_constraint import (
    enforce_max_cluster_size,
    SizeConstraint,
)
from graph_mining_spark.operators.tiebreaking import best_neighbor_string_tiebreak
from graph_mining_spark.operators.clique_aggregator import (
    clique_aggregator,
    CliqueAggregatorConfig,
)
from graph_mining_spark.operators.parline import (
    parline,
    ParlineConfig,
    affinity_hierarchy_paths,
)
from graph_mining_spark.operators.minla import (
    minimum_linear_arrangement,
    MinlaConfig,
    minla_cost,
)

__all__ = [
    "connected_components",
    "pagerank",
    "triangle_counts",
    "affinity_cluster",
    "AffinityConfig",
    "correlation_cluster",
    "CorrelationConfig",
    "modularity_cluster",
    "coconductance_cluster",
    "CoconductanceConfig",
    "parhac",
    "ParHacConfig",
    "flatten_dendrogram",
    "DynamicHac",
    "UpdateStats",
    "terahac",
    "TeraHacConfig",
    "label_propagation",
    "quick_cluster",
    "sssp",
    "pairwise_similarity",
    "enforce_max_cluster_size",
    "SizeConstraint",
    "best_neighbor_string_tiebreak",
    "clique_aggregator",
    "CliqueAggregatorConfig",
    "parline",
    "ParlineConfig",
    "affinity_hierarchy_paths",
    "minimum_linear_arrangement",
    "MinlaConfig",
    "minla_cost",
]
