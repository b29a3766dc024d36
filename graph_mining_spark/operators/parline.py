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

The pairwise FM local-search improver (pairwise_improver.cc:80-132,
fm_base.cc:303-343, pairing_scheme.cc:45-102) is implemented too:
``num_improvement_iterations`` > 0 runs rounds of disjoint cluster
pairs (odd-even or distance scheme; with num_ids == num_clusters the
reference's random shift is Uniform(0,1) == 0, so the pairing is
deterministic), each pair refined by a Fiduccia–Mattheyses pass
(gain heaps, balance slack vs max_cluster_weight =
(1+imbalance)·W/k, move-history best-prefix rollback).  Pairs are
disjoint per round, so each round is ONE cogrouped applyInPandas over
(vertex-membership, pair-internal-edges) — the Spark shape of the
reference's parallel_for over pairs.

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
    # LocalSearchConfig / PairwiseImproverConfig (parline.proto:64-89):
    # 0 disables local search (the reference's default)
    num_improvement_iterations: int = 0
    pairing_method: str = "odd_even"  # or "distance"
    pairing_distance: int = 1


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
            cur_e, one_round, vertices=clusters.select(F.col("cid").alias("vid")),
            already_symmetric=True,
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


def compute_cut_ratio(edges: DataFrame, assignment: DataFrame) -> float:
    """ComputeCutRatio (cut_size.cc:61-84): C / W where C = summed
    weight of edges crossing clusters and W = total edge weight (both
    orientations, like the reference's reduceEdges).  ``assignment``:
    (vid, cluster).  Raises on zero total weight."""
    sym = remove_self_loops(symmetrize(edges))
    a_s = assignment.select(F.col("vid").alias("src"), F.col("cluster").alias("_cs"))
    a_d = assignment.select(F.col("vid").alias("dst"), F.col("cluster").alias("_cd"))
    row = (
        sym.join(a_s, "src")
        .join(a_d, "dst")
        .agg(
            F.sum(F.when(F.col("_cs") != F.col("_cd"), F.col("weight")).otherwise(0.0)).alias("c"),
            F.sum("weight").alias("w"),
        )
        .first()
    )
    total = float(row["w"] or 0.0)
    if total == 0.0:
        raise ValueError("Total edge weight in input graph is 0")
    return float(row["c"] or 0.0) / total


# ---------------- pairwise FM local search ----------------


def odd_even_pairs(k: int, step: int) -> list[tuple[int, int]]:
    """OddEvenPairingScheme::Next with num_ids == num_clusters
    (pairing_scheme.cc:45-66): cluster-id pairs (i+step, i+step+1 mod k)
    for even i; CycleSize = 2."""
    pairs = []
    for i in range(0, k - k % 2, 2):
        p1 = i + step
        p2 = (p1 + 1) % k
        pairs.append((p1, p2))
    return pairs


def distance_pairs(k: int, step: int, distance: int) -> list[tuple[int, int]]:
    """DistancePairingScheme::Next with num_ids == num_clusters
    (pairing_scheme.cc:75-102); CycleSize = 2·distance."""
    distance = min(k // 2, distance)
    d = distance - step // 2
    block_offset = 0 if k == 2 else (step % 2) * d
    pairs = []
    i = block_offset
    while i < k + block_offset:
        block = min(d, (k + block_offset - i) // 2)
        for j in range(block):
            p1 = (i + j) % k
            p2 = (p1 + block) % k
            pairs.append((p1, p2))
        i += 2 * d
    return pairs


def fm_improve_pair(nodes1, nodes2, adj, node_w, max_cluster_weight):
    """FMBase::Improve (fm_base.cc:303-343) on one cluster pair.

    ``nodes1``/``nodes2``: iterables of node ids; ``adj``: {node:
    [(nbr, w)]} — only pair-internal neighbors matter (gains ignore
    external edges, AddClusterToHeap fm_base.cc:171-200); ``node_w``:
    {node: weight}.  Returns (moves_1to2, moves_2to1, improvement).

    Deterministic replica of the reference: gain heaps ordered
    (gain desc, id asc), ChooseMove prefers RIGHT on gain ties
    (fm_base.cc:100-103), infeasible-both locks the HEAVIER top
    (fm_base.cc:271-279), best-prefix rollback takes the LATEST
    maximum (>=, fm_base.cc:204-217)."""
    from heapq import heappop, heappush

    s1, s2 = set(nodes1), set(nodes2)
    gain: dict = {}
    side: dict = {}
    for sid, (cluster, other) in enumerate(((s1, s2), (s2, s1))):
        for u in cluster:
            g = 0.0
            for v, w in adj.get(u, ()):
                if v == u:
                    continue
                if v in cluster:
                    g -= w
                elif v in other:
                    g += w
            gain[u] = g
            side[u] = sid
    weight = [sum(node_w[u] for u in s1), sum(node_w[u] for u in s2)]
    heaps = ([], [])
    version: dict = {u: 0 for u in gain}
    in_pq = {u: side[u] for u in gain}  # u -> pq index, absent = out

    def push(u):
        heappush(heaps[in_pq[u]], (-gain[u], u, version[u]))

    for u in gain:
        push(u)

    def top(p):
        h = heaps[p]
        while h:
            negg, u, ver = h[0]
            if in_pq.get(u) == p and version[u] == ver:
                return u
            heappop(h)
        return None

    def adjust(u, g):
        gain[u] = g
        version[u] += 1
        push(u)

    def pop_out(u):
        in_pq.pop(u, None)

    move_history: list[tuple[int, float]] = []  # (node, gain at move time)

    def make_move(u, frm, to):
        pop_out(u)
        w = node_w[u]
        weight[frm] -= w
        weight[to] += w
        move_history.append((u, gain[u]))
        for v, ew in adj.get(u, ()):
            if v == u:
                continue
            p = in_pq.get(v)
            if p == frm:
                adjust(v, gain[v] + 2 * ew)
            elif p == to:
                adjust(v, gain[v] - 2 * ew)

    def slack_after(u, frm, to):
        w = node_w[u]
        return max_cluster_weight - max(weight[to] + w, weight[frm] - w)

    while True:
        lu, ru = top(0), top(1)
        if lu is None or ru is None:
            break
        l_ok = slack_after(lu, 0, 1) >= 0.0
        r_ok = slack_after(ru, 1, 0) >= 0.0
        if l_ok and r_ok:
            # ChooseMove: LEFT only on strictly larger gain
            if gain[lu] > gain[ru]:
                make_move(lu, 0, 1)
            else:
                make_move(ru, 1, 0)
        elif r_ok:
            make_move(ru, 1, 0)
        elif l_ok:
            make_move(lu, 0, 1)
        else:
            # lock the heavier top (ties -> right, matching `>` there)
            if node_w[lu] > node_w[ru]:
                pop_out(lu)
            else:
                pop_out(ru)

    rem = 0 if top(0) is not None else 1
    other = 1 - rem
    while True:
        u = top(rem)
        if u is None:
            break
        if slack_after(u, rem, other) >= 0.0:
            make_move(u, rem, other)
        else:
            pop_out(u)

    best_cut, best_improvement, cur = -1, 0.0, 0.0
    for i, (_u, g) in enumerate(move_history):
        cur += g
        if cur >= best_improvement:
            best_cut, best_improvement = i, cur
    m12, m21 = set(), set()
    for u, _g in move_history[: best_cut + 1]:
        (m12 if side[u] == 0 else m21).add(u)
    return m12, m21, best_improvement


def improve_clusters_pairwise(
    edges: DataFrame,
    assignment: DataFrame,
    cfg: ParlineConfig,
    node_weights: DataFrame | None = None,
) -> DataFrame:
    """ImproveClustersPairwise (pairwise_improver.cc:80-132): rounds of
    disjoint cluster-pair FM refinements.  ``assignment``: (vid,
    cluster); returns the improved (vid, cluster).  One cogrouped
    applyInPandas per round — pairs are disjoint, so every pair is an
    independent group."""
    k_row = assignment.agg(F.max("cluster")).first()[0]
    if k_row is None:
        return assignment
    k = int(k_row) + 1
    if k < 2 or cfg.num_improvement_iterations <= 0:
        return assignment

    use_w = cfg.use_node_weights and node_weights is not None
    verts = assignment.select("vid", "cluster")
    if use_w:
        verts = verts.join(
            node_weights.select("vid", F.col("node_weight").cast("double")), "vid", "left"
        ).fillna({"node_weight": 1.0})
        total_w = verts.agg(F.sum("node_weight")).first()[0]
    else:
        verts = verts.withColumn("node_weight", F.lit(1.0))
        total_w = float(verts.count())
    max_cluster_weight = (1.0 + cfg.imbalance) * total_w / k

    sym = remove_self_loops(symmetrize(edges))
    spark = edges.sparkSession

    if cfg.pairing_method == "distance":
        cycle = 2 * min(k // 2, max(1, cfg.pairing_distance))
        pair_fn = lambda step: distance_pairs(k, step, cfg.pairing_distance)  # noqa: E731
    else:
        cycle = 2
        pair_fn = lambda step: odd_even_pairs(k, step)  # noqa: E731

    cur = cut_lineage(verts)
    total_rounds = cfg.num_improvement_iterations * cycle
    for rnd in range(total_rounds):
        pairs = pair_fn(rnd % cycle)
        if not pairs:
            continue
        pair_rows = [(int(c), int(i), int(a), int(b)) for i, (a, b) in enumerate(pairs) for c in (a, b)]
        pair_df = F.broadcast(
            spark.createDataFrame(pair_rows, "cluster int, pair int, c1 int, c2 int")
        )
        v = cur.join(pair_df, "cluster", "left")
        v_in = v.filter(F.col("pair").isNotNull())
        e_in = (
            sym.join(
                v_in.select(F.col("vid").alias("src"), F.col("pair").alias("_ps")), "src"
            )
            .join(
                v_in.select(F.col("vid").alias("dst"), F.col("pair").alias("_pd")), "dst"
            )
            .filter(F.col("_ps") == F.col("_pd"))
            .select(F.col("_ps").alias("pair"), "src", "dst", "weight")
        )

        mw = max_cluster_weight

        def run(key, vdf, edf):
            import pandas as pd

            c1 = int(vdf["c1"].iloc[0])
            nodes1 = [int(x) for x, c in zip(vdf["vid"], vdf["cluster"]) if int(c) == c1]
            nodes2 = [int(x) for x, c in zip(vdf["vid"], vdf["cluster"]) if int(c) != c1]
            node_w = {int(x): float(w) for x, w in zip(vdf["vid"], vdf["node_weight"])}
            adj: dict = {}
            for s, d, w in zip(edf["src"], edf["dst"], edf["weight"]):
                adj.setdefault(int(s), []).append((int(d), float(w)))
            m12, m21, _imp = fm_improve_pair(nodes1, nodes2, adj, node_w, mw)
            c2 = int(vdf["c2"].iloc[0])
            out = [
                (int(x), c2 if int(x) in m12 else (c1 if int(x) in m21 else int(c)))
                for x, c in zip(vdf["vid"], vdf["cluster"])
            ]
            return pd.DataFrame(out, columns=["vid", "cluster"])

        moved = (
            v_in.select("vid", "cluster", "node_weight", "pair", "c1", "c2")
            .groupBy("pair")
            .cogroup(e_in.groupBy("pair"))
            .applyInPandas(run, schema="vid long, cluster long")
        )
        untouched = v.filter(F.col("pair").isNull()).select("vid", "cluster", "node_weight")
        cur = cut_lineage(
            moved.join(cur.select("vid", "node_weight"), "vid").unionByName(untouched)
        )
    return cur.select("vid", "cluster")


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
        # clamp to k-1: a ZERO-weight node ranked last has exclusive
        # prefix == total_w, and floor(total_w / (total_w/k)) == k —
        # one past the valid 0..k-1 range (float round-up near the
        # boundary can do the same)
        out = ranked.select(
            "vid",
            "rank",
            F.least(
                F.floor(F.col("_prefix") / F.lit(cluster_weight)), F.lit(k - 1)
            ).cast("long").alias("cluster"),
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
    if cfg.num_improvement_iterations > 0:
        improved = improve_clusters_pairwise(
            edges, out.select("vid", "cluster"), cfg, node_weights=node_weights
        )
        out = cut_lineage(
            out.select("vid", "rank").join(improved, "vid")
            .select("vid", "rank", "cluster")
        )
    return out
