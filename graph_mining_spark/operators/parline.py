"""Parline — balanced graph partitioning via affinity-hierarchy linear
embedding (WSDM'16 linear embedding + balanced slicing).

Parity target: /root/reference/in_memory/clustering/parline/
parallel_line.cc:89-223 (slicing, cluster-count resolution),
affinity_hierarchy_embedder.cc:94-208 (hierarchy paths, lexicographic
embedding), parline.proto:22-66 (LinePartitionerConfig / EmbedderConfig).

Algorithm:
  1. Build an affinity hierarchy (SUM aggregation, weight threshold 0,
     size-constraint target_cluster_size=2 by default — the degree
     limiter, affinity_hierarchy_embedder.cc:49-50,72-85) with FRESH
     unit node weights at every level ("number of nodes" semantics,
     affinity_hierarchy_embedder.cc:106-115).
  2. Each node's hierarchy path = [vid, c₁, c₂, …]; a node stops
     extending at the first level where its current cluster is isolated
     (no incident edges), and never extends again
     (ExtendHierarchyPaths, affinity_hierarchy_embedder.cc:56-70).
     The loop tops out when the compressed graph has no edges, or at
     40 levels (kMaxAffinityLevels).
  3. Embed: sort nodes by (path length asc, REVERSED path
     lexicographic) — top-of-hierarchy ids compare first
     (EmbedGraph, affinity_hierarchy_embedder.cc:164-184).
  4. Slice the line into num_clusters contiguous intervals: node-count
     balanced within ±1 (ComputeClusterSizePrefixSum,
     parallel_line.cc:69-109), or by node-weight prefix sums with
     cluster = floor(prefix / cluster_weight)
     (SliceEmbeddingWeighted, parallel_line.cc:124-149).

The pairwise FM local-search improver (pairwise_improver.cc, fm_base.cc)
is a documented non-goal of this slice — the reference applies it only
when local_search_config is set; the initial slicing is the complete
default path.

Spark shape: the hierarchy is a driver loop of affinity rounds over a
geometrically shrinking cluster graph (depth ≈ log₂ n with the pair
target).  The embedding rank and weighted prefix sums use the same
two-phase range-partition + per-partition offsets trick as
``ingest.dense_vertex_ids`` — no single-partition global sort at any
scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_mining_spark.checkpoint import cut_lineage
from graph_mining_spark.graph import remove_self_loops, symmetrize, vertex_ids
from graph_mining_spark.operators.affinity import AffinityConfig, affinity_cluster
from graph_mining_spark.operators.size_constraint import SizeConstraint

_MAX_AFFINITY_LEVELS = 40  # kMaxAffinityLevels
_DEFAULT_TARGET_CLUSTER_SIZE = 2  # kDefaultTargetClusterSize


@dataclass
class ParlineConfig:
    """parline.proto:22-66.  Exactly one of num_clusters /
    cluster_weight must be set (cluster_weight converts via
    ceil(total_node_weight / cluster_weight), parallel_line.cc:152-179).
    ``imbalance`` parameterizes the (non-goal) local-search improver
    only; initial slicing is node-count ±1 / weight-floor balanced."""

    num_clusters: int | None = None
    cluster_weight: float | None = None
    imbalance: float = 0.05
    use_node_weights: bool = False
    # embedder knobs (EmbedderConfig → AffinityConfigWithDefaults)
    embedder_target_cluster_size: float = _DEFAULT_TARGET_CLUSTER_SIZE
    embedder_edge_aggregation: str = "sum"


def affinity_hierarchy_paths(edges: DataFrame) -> DataFrame:
    """Hierarchy paths (vid, path array<long>) per
    ComputeAffinityHierarchyPaths (affinity_hierarchy_embedder.cc:
    94-162); see module docstring for the stop rules."""
    return _hierarchy_paths(edges, ParlineConfig(num_clusters=2))


def _hierarchy_paths(edges: DataFrame, cfg: ParlineConfig) -> DataFrame:
    sym = cut_lineage(remove_self_loops(symmetrize(edges)))
    verts = vertex_ids(sym)
    paths = cut_lineage(
        verts.select("vid", F.array(F.col("vid")).alias("path"), F.lit(False).alias("stopped"))
    )
    cur_e = sym
    cur_map = cut_lineage(verts.select("vid", F.col("vid").alias("cid")))
    one_round = AffinityConfig(
        num_iterations=1,
        weight_threshold=0.0,
        edge_aggregation=cfg.embedder_edge_aggregation,
        size_constraint=SizeConstraint(
            target_cluster_size=float(cfg.embedder_target_cluster_size)
        ),
    )

    for _level in range(_MAX_AFFINITY_LEVELS):
        clusters = cur_map.select("cid").distinct()
        endpoints = (
            cur_e.select(F.col("src").alias("cid"))
            .unionByName(cur_e.select(F.col("dst").alias("cid")))
            .distinct()
            .withColumn("_live", F.lit(True))
        )
        labels = affinity_cluster(
            cur_e, one_round, vertices=clusters.select(F.col("cid").alias("vid"))
        ).select(F.col("vid").alias("cid"), F.col("label").alias("_nc"))
        labels = cut_lineage(labels)

        joined = (
            paths.join(cur_map, "vid")
            .join(labels, "cid")
            .join(endpoints, "cid", "left")
        )
        paths = cut_lineage(
            joined.select(
                "vid",
                F.when(
                    ~F.col("stopped") & F.col("_live").isNotNull(),
                    F.concat("path", F.array(F.col("_nc"))),
                )
                .otherwise(F.col("path"))
                .alias("path"),
                (F.col("stopped") | F.col("_live").isNull()).alias("stopped"),
            )
        )
        cur_map = cut_lineage(
            joined.select("vid", F.col("_nc").alias("cid"))
        )
        map_s = labels.select(F.col("cid").alias("src"), F.col("_nc").alias("_ns"))
        map_d = labels.select(F.col("cid").alias("dst"), F.col("_nc").alias("_nd"))
        cur_e = cut_lineage(
            cur_e.join(map_s, "src")
            .join(map_d, "dst")
            .select(F.col("_ns").alias("src"), F.col("_nd").alias("dst"), "weight")
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        if cur_e.isEmpty():
            break  # top reached: all compressed nodes isolated
    return paths.select("vid", "path")


def _ranked(df: DataFrame, partitions: int, weight_col: str | None):
    """rank (0-based, by (len(path) asc, reverse(path) lex asc)) and,
    when ``weight_col`` is given, the EXCLUSIVE prefix sum of that
    column in rank order.  Two-phase: range-partition by the sort key,
    per-partition window + broadcast partition offsets — the scalable
    form of one global sort."""
    keyed = (
        df.withColumn("_len", F.size("path"))
        .withColumn("_rev", F.reverse("path"))
        .repartitionByRange(partitions, "_len", "_rev")
        .withColumn("_pid", F.spark_partition_id())
    )
    keyed = keyed.persist()
    aggs = [F.count("*").alias("_cnt")]
    if weight_col:
        aggs.append(F.sum(weight_col).alias("_wsum"))
    stats = keyed.groupBy("_pid").agg(*aggs).collect()
    offs, c_acc, w_acc = [], 0, 0.0
    for row in sorted(stats, key=lambda r: r["_pid"]):
        offs.append((int(row["_pid"]), int(c_acc), float(w_acc)))
        c_acc += row["_cnt"]
        w_acc += float(row["_wsum"]) if weight_col else 0.0
    off_df = df.sparkSession.createDataFrame(
        offs or [(0, 0, 0.0)], "_pid int, _coff long, _woff double"
    )
    w = Window.partitionBy("_pid").orderBy("_len", "_rev")
    out = keyed.withColumn("_rn", F.row_number().over(w) - 1).join(
        F.broadcast(off_df), "_pid"
    )
    out = out.withColumn("rank", F.col("_rn") + F.col("_coff"))
    if weight_col:
        wsum = Window.partitionBy("_pid").orderBy("_len", "_rev").rowsBetween(
            Window.unboundedPreceding, -1
        )
        out = out.withColumn(
            "_prefix",
            F.coalesce(F.sum(weight_col).over(wsum), F.lit(0.0)) + F.col("_woff"),
        )
    return out, keyed


def parline(
    edges: DataFrame,
    config: ParlineConfig | None = None,
    node_weights: DataFrame | None = None,
    partitions: int = 32,
) -> DataFrame:
    """Balanced line partitioning.  Returns (vid, rank, cluster):
    ``rank`` = position on the embedded line, ``cluster`` = contiguous
    balanced interval index (ParallelLinePartitioner::Cluster,
    parallel_line.cc:205-223).

    ``node_weights``: optional (vid, node_weight), used only with
    ``config.use_node_weights`` (parallel_line.cc:111-120 defaults to
    node count when weights are absent).
    """
    cfg = config or ParlineConfig(num_clusters=2)
    if (cfg.num_clusters is None) == (cfg.cluster_weight is None):
        raise ValueError("exactly one of num_clusters / cluster_weight required")

    paths = _hierarchy_paths(edges, cfg)
    use_w = cfg.use_node_weights and node_weights is not None
    if use_w:
        paths = paths.join(
            node_weights.select("vid", F.col("node_weight").cast("double")), "vid", "left"
        ).fillna({"node_weight": 1.0})

    n_total = paths.count()
    if use_w:
        total_w = paths.agg(F.sum("node_weight")).first()[0] or 0.0
    else:
        total_w = float(n_total)

    if cfg.num_clusters is not None:
        k = int(cfg.num_clusters)
        if k <= 1:
            raise ValueError("num_clusters must be at least 2")
    else:
        cw = float(cfg.cluster_weight)
        if cw <= 0:
            raise ValueError("cluster_weight must be positive")
        if total_w <= cw:
            raise ValueError("cluster_weight must be less than total node weight")
        k = int(math.ceil(total_w / cw))

    ranked, keyed = _ranked(paths, partitions, "node_weight" if use_w else None)
    if use_w:
        cluster_weight = total_w / k
        out = ranked.select(
            "vid",
            "rank",
            F.floor(F.col("_prefix") / F.lit(cluster_weight)).cast("long").alias("cluster"),
        )
    else:
        size, rem = divmod(n_total, k)
        big = rem * (size + 1)
        cluster = F.when(F.col("rank") < big, F.floor(F.col("rank") / (size + 1))).otherwise(
            rem + F.floor((F.col("rank") - big) / F.greatest(F.lit(size), F.lit(1)))
        )
        out = ranked.select("vid", "rank", cluster.cast("long").alias("cluster"))
    out = cut_lineage(out)
    keyed.unpersist()
    return out
