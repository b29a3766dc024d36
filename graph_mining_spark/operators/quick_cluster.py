"""QuickCluster — Ailon–Charikar–Newman pivot correlation clustering.

Parity: /root/reference/in_memory/clustering/correlation/
quick_cluster.cc:44-93.  Semantics: walk a random permutation; each
still-unclustered node becomes a cluster CENTER and absorbs its
still-unclustered neighbors with positive rescaled weight

    w(c,u) - edge_weight_offset - resolution * nw(c) * nw(u) > 0.

Parallel emulation (dependence-resolution rounds, Blelloch–Fineman–
Shun'12 style): a node's outcome depends only on its positive
neighbors with SMALLER priority.  Per round, for each unresolved v let

    r(v) = min priority of an UNRESOLVED smaller positive neighbor
    c(v) = min priority of a CENTER     smaller positive neighbor

  - no smaller positive neighbors at all, or all resolved non-center
    (r=∞, c=∞)  → v becomes a CENTER;
  - c(v) < r(v) → v is CLAIMED by that center (every earlier neighbor
    is resolved non-center, so that center is exactly the first one
    whose turn reaches v in the sequential walk);
  - otherwise v waits (an unresolved earlier neighbor could still
    become a center before c(v)).

The fixpoint equals the sequential greedy with the same priorities —
asserted against a sequential Python oracle in tests.  Priorities are
seeded hashes with vid tie-break compared as structs, so no global
permutation materialization / single-partition sort, and the result is
partition-count invariant.  Each round resolves at least the globally
minimum unresolved node (expected O(log n) rounds on random
priorities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_mining_spark.checkpoint import cut_lineage
from graph_mining_spark.graph import remove_self_loops, symmetrize, vertex_ids


def quick_cluster(
    edges: DataFrame,
    edge_weight_offset: float = 0.0,
    resolution: float = 0.0,
    node_weights: DataFrame | None = None,
    seed: int = 42,
    max_rounds: int = 10_000,
    already_symmetric: bool = False,
) -> DataFrame:
    """Return ``(vid, label)``; label = the cluster center's vid.

    ``resolution`` and node weights must be nonnegative (reference
    CHECK, quick_cluster.cc:52-56).
    """
    if resolution < 0:
        raise ValueError("resolution must be nonnegative")
    sym = edges if already_symmetric else symmetrize(edges)
    verts = vertex_ids(sym)
    if node_weights is not None:
        nw = node_weights.select("vid", F.col("node_weight").cast("double"))
        neg = nw.filter(F.col("node_weight") < 0).count()
        if neg:
            raise ValueError(
                f"{neg} negative node weight(s): the reference CHECKs "
                "nonnegativity (quick_cluster.cc:52-56)"
            )
        # vertices missing from the caller's table default to 1.0
        # (SimpleUndirectedGraph's unset node weight) — a LEFT join, so
        # the inner joins below can never silently drop their edges
        nw = verts.join(nw, "vid", "left").select(
            "vid", F.coalesce("node_weight", F.lit(1.0)).alias("node_weight")
        )
    else:
        nw = verts.select("vid", F.lit(1.0).alias("node_weight"))
    nw_s = nw.select(F.col("vid").alias("src"), F.col("node_weight").alias("_ws"))
    nw_d = nw.select(F.col("vid").alias("dst"), F.col("node_weight").alias("_wd"))
    prio = lambda c: F.xxhash64(c, F.lit(seed))  # noqa: E731
    # static: positive edges oriented smaller-priority → larger
    positive = (
        remove_self_loops(sym)
        .join(nw_s, "src")
        .join(nw_d, "dst")
        .filter(
            F.col("weight") - F.lit(edge_weight_offset) - F.lit(resolution) * F.col("_ws") * F.col("_wd")
            > 0
        )
        .select("src", "dst", prio(F.col("src")).alias("_hs"), prio(F.col("dst")).alias("_hd"))
    )
    smaller_adj = (
        positive.filter(F.struct(F.col("_hs"), F.col("src")) < F.struct(F.col("_hd"), F.col("dst")))
        .select(F.col("dst").alias("vid"), F.col("src"), F.col("_hs"))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # status: 0 unknown, 1 center, 2 claimed; label valid when resolved
    state = cut_lineage(verts.select(
        "vid", F.lit(0).alias("status"), F.lit(None).cast("long").alias("label")
    ))

    for _ in range(max_rounds):
        st_src = state.select(F.col("vid").alias("src"), F.col("status").alias("_st"))
        agg = (
            smaller_adj.join(st_src, "src")
            .groupBy("vid")
            .agg(
                F.min(F.when(F.col("_st") == 0, F.struct(F.col("_hs"), F.col("src")))).alias("_r"),
                F.min(F.when(F.col("_st") == 1, F.struct(F.col("_hs"), F.col("src")))).alias("_c"),
            )
        )
        unknown = state.filter(F.col("status") == 0)
        resolved = state.filter(F.col("status") != 0)
        upd = unknown.join(agg, "vid", "left")
        becomes_center = F.col("_r").isNull() & F.col("_c").isNull()
        becomes_claimed = F.col("_c").isNotNull() & (F.col("_r").isNull() | (F.col("_c") < F.col("_r")))
        new_unknown = upd.select(
            "vid",
            F.when(becomes_center, F.lit(1)).when(becomes_claimed, F.lit(2)).otherwise(F.lit(0)).alias("status"),
            F.when(becomes_center, F.col("vid")).when(becomes_claimed, F.col("_c.src")).otherwise(F.lit(None).cast("long")).alias("label"),
        )
        # the unresolved count rides the checkpoint job (Observation)
        # instead of a dedicated isEmpty scan per round
        from pyspark.sql import Observation

        obs = Observation()
        state = cut_lineage(
            resolved.unionByName(new_unknown)
            .observe(obs, F.sum(F.when(F.col("status") == 0, 1).otherwise(0)).alias("n_unknown"))
        )
        if int(obs.get["n_unknown"] or 0) == 0:
            break

    smaller_adj.unpersist()
    return state.select("vid", "label")


def clusters_of(labels: DataFrame) -> DataFrame:
    """Nested Clustering form (reference vector<vector<NodeId>>)."""
    return labels.groupBy("label").agg(F.sort_array(F.collect_list("vid")).alias("members"))
