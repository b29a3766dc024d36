"""Correlation clustering / Louvain — local-search best moves + contraction.

Parity target: the reference's parallel correlation clusterer
(/root/reference/in_memory/clustering/correlation/parallel_correlation.cc,
parallel_correlation_util.cc:521-605, correlation_util.h:93-141,
correlation.proto).  Objective (correlation.proto:21-47): maximize

    sum_{u,v in same cluster} w'_uv,
    w'_uv = w_uv - edge_weight_offset - resolution * k_u * k_v   ({u,v} in E)
          = -resolution * k_u * k_v                              (otherwise)

Local search = Louvain (clustering_moves_method LOUVAIN,
correlation.proto:101-115): rounds of per-vertex best moves until no
move improves, then compress clusters into nodes (CompressGraph) and
repeat on the contracted graph.

Per-vertex best move (BestMove, parallel_correlation_util.cc:521-605;
BestMoveFromStats, correlation_util.h:93-141), for u in cluster A with
s_uC = Σ_{v∈C∩N(u)} (w_uv − offset) and K_C = Σ_{v∈C} k_v:

    delta(u→C)   = [s_uC − res·k_u·K_C] − [s_uA − res·k_u·(K_A − k_u)]
    delta(u→new) = −[s_uA − res·k_u·(K_A − k_u)]

best over {new} ∪ neighboring clusters; ties prefer "new", then the
smaller cluster id (correlation_util.h:133-137 — the reference's
`cluster < best_move.first` with nullopt initial); applied iff the
change is > 0 (parallel_correlation.cc:122,148).

Two move schedules (``CorrelationConfig.move_schedule``):
  * "sync" (use_synchronous = true, correlation.proto:117-126): every
    vertex computes its best move against the same snapshot and all
    positive moves apply at once — deterministic given the vertex
    ids, which is what lets a sequential Python oracle (tests) and a
    DuckDB SQL twin (driver gate) reproduce results exactly.
  * "block_async": the deterministic Spark analog of the reference's
    ASYNC default (use_synchronous = false — per the proto "up to
    2.50x faster (median of 1.21x) and ... a 1.29 -- 156.01% increase
    in objective").  Each round sweeps ``num_move_blocks`` vertex
    blocks (pmod(vid, B)) sequentially; a block's moves are computed
    snapshot-synchronously WITHIN the block but see the labels already
    updated by earlier blocks — block Gauss-Seidel.  This captures the
    mechanism behind async's advantage (fresher labels, fewer sync
    oscillations) while staying deterministic (gated by a sequential
    Python oracle replicating the exact schedule).  One sweep costs
    the same total edge-join work as one sync round: each block's
    candidate join prunes to its ~E/B incident-edge slice up front.

Documented non-goals (reference config surface we deliberately do not
implement, with the proto's own quality/speed numbers):
  * RACY asynchronous moves: the reference's async interleaves racy
    shared-memory label reads at per-vertex granularity; the exact
    interleaving is scheduler-dependent and non-deterministic
    (correlation.proto:117-126), which has no Spark superstep analog
    and would break both the DuckDB differential gate and the N-vs-4N
    equivalence requirement.  ``move_schedule="block_async"`` above is
    the deterministic stand-in.

Multi-level refinement (use_refinement, correlation.proto:128-135) IS
implemented — see :class:`CorrelationConfig.use_refinement`.

Scale shape: each round is one edges⋈labels join partitioned on dst,
one (u, cluster)-grouped partial-aggregated sum, two vertex-sized
joins (own cluster / cluster weights broadcast when small), and one
argmax via max_by — no windows over the edge table, no Python UDFs.
Contraction reuses CompressGraph (SUM linkage).  Cluster-weight
tables are cluster-count-sized, so late levels broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_mining_spark.checkpoint import cut_lineage
from graph_mining_spark.graph import remove_self_loops, symmetrize, vertex_ids
from graph_mining_spark.operators.affinity import compress_graph, flatten_clustering


@dataclass
class CorrelationConfig:
    """CorrelationClustererConfig analog (correlation.proto:68-158).

    ``louvain_num_iterations`` = outer levels (best moves + compress);
    ``louvain_num_inner_iterations`` = synchronous best-move rounds per
    level (LouvainConfig, correlation.proto:143-151; parallel Louvain
    bounds inner rounds because sync moves may oscillate).
    """

    resolution: float = 0.0
    edge_weight_offset: float = 0.0
    louvain_num_iterations: int = 10
    louvain_num_inner_iterations: int = 10
    # Bipartite objective (correlation.proto:141-157): missing edges
    # between same-part nodes are NOT penalized —
    #   w'_uv = w_uv − offset − res·k_u·k_v   ({u,v} ∈ E)
    #         = 0                              (non-edge, same part)
    #         = −res·k_u·k_v                   (non-edge, different part)
    # Requires a (vid, part) DataFrame with part ∈ {0, 1}
    # (graph_mining.Node.part semantics).
    use_bipartite_objective: bool = False
    # Move schedule (correlation.proto:117-126 use_synchronous):
    #   "sync"        — every vertex moves against one snapshot per
    #                   round (use_synchronous = true; the DuckDB-
    #                   oracle-gated default).
    #   "block_async" — deterministic Gauss-Seidel analog of the
    #                   reference's ASYNC default: each round sweeps
    #                   ``num_move_blocks`` vertex blocks
    #                   (pmod(vid, B)) sequentially, each block moving
    #                   against labels ALREADY UPDATED by earlier
    #                   blocks.  Captures what makes async better
    #                   (fresher labels -> fewer oscillations, the
    #                   proto quotes "up to 2.50x faster ... 1.29 --
    #                   156.01% increase in objective") while staying
    #                   deterministic and cluster-size-independent —
    #                   the racy shared-memory interleaving itself has
    #                   no Spark analog and remains a non-goal.
    #                   One sweep costs the same total edge-join work
    #                   as one sync round (each block prunes to its
    #                   ~E/B incident-edge slice), plus B-1 extra
    #                   cluster-count-sized aggregate rebuilds.
    move_schedule: str = "sync"
    num_move_blocks: int = 4
    # Multi-level refinement (correlation.proto:128-135 use_refinement;
    # reference walk parallel_correlation.cc:538-575): snapshot every
    # contracted level's (graph, node weights, local labels), then after
    # the coarsest level converges walk back down — seed each finer
    # level with its clustering flattened through the refined coarser
    # labels and re-run the inner best-move rounds on that level's
    # graph, finishing on the ORIGINAL graph.  The proto quotes a 1.12
    # -- 36.92% objective increase for a median 1.67x slowdown and a
    # 1.40 -- 23.68x memory overhead (here: each level's edge table
    # stays materialized until its refinement pass frees it).  One
    # deliberate delta: when the coarsest level makes no moves the
    # reference skips refining the level just below it
    # (parallel_correlation.cc:452-455 --iter); we still run that
    # level's rounds, which converge immediately in the common case and
    # can only improve the objective otherwise — the sequential oracle
    # replicates our schedule exactly.
    use_refinement: bool = False

    def __post_init__(self) -> None:
        if self.move_schedule not in ("sync", "block_async"):
            raise ValueError(f"unknown move_schedule: {self.move_schedule!r}")
        if self.num_move_blocks < 1:
            raise ValueError("num_move_blocks must be >= 1")


def best_moves(
    edges: DataFrame,
    labels: DataFrame,
    node_weights: DataFrame,
    resolution: float = 0.0,
    edge_weight_offset: float = 0.0,
    parts: DataFrame | None = None,
    block: tuple[int, int] | None = None,
) -> DataFrame:
    """One synchronous best-move round.  Returns the new ``(vid, label)``
    with every positive-delta move applied; a vertex whose best move is
    "new cluster" gets the fresh label ``-(vid+1)`` (unique, disjoint
    from the nonnegative input id space).

    ``edges`` must be symmetrized (both orientations) without the
    weights already offset; ``labels`` (vid, label); ``node_weights``
    (vid, node_weight).

    With ``parts`` (vid, part ∈ {0,1}) the BIPARTITE objective applies
    (BestMoveFromStatsForBipartiteGraph, correlation_util.h:168-240):
    the missing-edge penalty for u only counts the OPPOSITE-part weight
    of each cluster, K_X[1−p(u)] — same-part non-edges cost nothing —
    so  leave = s_uA − res·k_u·K_A[1−p]  (no −k_u correction: u is not
    in its opposite-part sum) and  gain(C) = s_uC − res·k_u·K_C[1−p].

    With ``block = (b, B)`` only vertices with ``pmod(vid, B) == b``
    are move candidates (their candidate-gain join prunes to the
    incident-edge slice up front, ~E/B of the edge table); every other
    vertex keeps its label with ``_moved = false``.  One sweep over
    all B blocks therefore costs the same total edge-join work as one
    unblocked round — this is the building block of the deterministic
    block-Gauss-Seidel schedule (``move_schedule="block_async"``).
    """
    res = float(resolution)
    off = float(edge_weight_offset)
    bip = parts is not None
    if block is not None:
        b_idx, b_cnt = block
        mover = F.pmod(F.col("vid"), F.lit(b_cnt)) == b_idx
        non_movers = labels.filter(~mover).select(
            "vid", "label", F.lit(False).alias("_moved")
        )
        edges = edges.filter(F.pmod(F.col("src"), F.lit(b_cnt)) == b_idx)
        mover_labels = labels.filter(mover)
    else:
        non_movers = None
        mover_labels = labels

    lab_nw = labels.join(node_weights, "vid")
    # cluster weights K_C and sizes — cluster-count-sized
    cw = lab_nw.groupBy("label").agg(
        F.sum("node_weight").alias("_K"), F.count("*").alias("_n")
    )

    # s_uC for every neighboring cluster C of u
    lab_dst = labels.select(F.col("vid").alias("dst"), F.col("label").alias("_C"))
    s_uc = (
        remove_self_loops(edges)
        .join(lab_dst, "dst")
        .groupBy(F.col("src").alias("vid"), "_C")
        .agg(F.sum(F.col("weight") - F.lit(off)).alias("_s"))
    )

    own = mover_labels.join(node_weights, "vid").select(
        "vid", F.col("label").alias("_A"), F.col("node_weight").alias("_k")
    ).join(
        cw.select(F.col("label").alias("_A"), F.col("_K").alias("_KA"), F.col("_n").alias("_nA")),
        "_A",
    )
    if bip:
        # per-(cluster, part) weights; each u penalizes with the
        # opposite-part slice of the target/current cluster
        cwp = (
            lab_nw.join(parts.select("vid", "part"), "vid")
            .groupBy("label", "part")
            .agg(F.sum("node_weight").alias("_Kp"))
        )
        own = (
            own.join(parts.select("vid", F.col("part").alias("_p")), "vid")
            .join(
                cwp.select(
                    F.col("label").alias("_A"),
                    (1 - F.col("part")).alias("_p"),
                    F.col("_Kp").alias("_KAopp"),
                ),
                ["_A", "_p"],
                "left",
            )
            .fillna({"_KAopp": 0.0})
        )

    cand = (
        s_uc.join(own, "vid")
        .join(
            cw.select(F.col("label").alias("_C"), F.col("_K").alias("_KC"), F.col("_n").alias("_nC")),
            "_C",
        )
    )
    if bip:
        cand = cand.join(
            cwp.select(
                F.col("label").alias("_C"),
                (1 - F.col("part")).alias("_p"),
                F.col("_Kp").alias("_KCopp"),
            ),
            ["_C", "_p"],
            "left",
        ).fillna({"_KCopp": 0.0})
    # synchronous-swap guard (deterministic symmetry breaking, cf.
    # Grappolo's singleton-swap heuristic, Lu–Halappanavar–Kalyanaraman
    # 2015): when BOTH the current and the target cluster are
    # singletons, only the vertex moving toward the SMALLER label may
    # move — otherwise two mutual singletons would swap labels forever
    # under simultaneous application.
    swap_blocked = (F.col("_nA") == 1) & (F.col("_nC") == 1) & (F.col("_C") > F.col("_A"))
    # objective u currently contributes to A (the "leave cost"); in
    # bipartite mode only the opposite-part weight penalizes
    gain_expr = F.col("_s") - F.lit(res) * F.col("_k") * (
        F.col("_KCopp") if bip else F.col("_KC")
    )
    group_keys = ["vid", "_A", "_k", "_KAopp"] if bip else ["vid", "_A", "_k", "_KA"]
    # per-u: s_uA (0 when u has no intra-cluster edge) via conditional agg
    per_u = cand.groupBy(*group_keys).agg(
        F.coalesce(
            F.sum(F.when(F.col("_C") == F.col("_A"), F.col("_s"))), F.lit(0.0)
        ).alias("_sA"),
        # argmax over eligible C ≠ A of (delta_gain, smaller C):
        # maximize the struct (gain, -C); gain(C) = s_uC − res·k_u·K_C
        F.max(
            F.when(
                (F.col("_C") != F.col("_A")) & ~swap_blocked,
                F.struct(gain_expr.alias("g"), (-F.col("_C")).alias("negc")),
            )
        ).alias("_best"),
    )
    leave = F.col("_sA") - F.lit(res) * F.col("_k") * (
        F.col("_KAopp") if bip else (F.col("_KA") - F.col("_k"))
    )
    delta_new = -leave
    delta_best = F.col("_best.g") - leave
    # ties prefer "new" (reference keeps the nullopt initial on equality)
    take_cluster = F.col("_best").isNotNull() & (delta_best > delta_new)
    moved = per_u.select(
        "vid",
        F.when(take_cluster & (delta_best > 0), -F.col("_best.negc"))
        .when(~take_cluster & (delta_new > 0), -(F.col("vid") + 1))
        .otherwise(F.col("_A"))
        .alias("label"),
        (F.when(take_cluster, delta_best).otherwise(delta_new) > 0).alias("_moved"),
    )
    # vertices with no incident edges never appear in s_uc: for them
    # delta_new = res·k_u·(K_A − k_u) — positive when sharing a cluster
    # with others (leaving a cluster you touch nothing in always helps
    # under resolution > 0); from singletons it is 0 (no move).
    # Bipartite: the shared-cluster penalty is only the opposite-part
    # weight, res·k_u·K_A[1−p].
    iso_gain = F.lit(res) * F.col("_k") * (
        F.col("_KAopp") if bip else (F.col("_KA") - F.col("_k"))
    )
    isolated = (
        mover_labels.join(s_uc.select("vid").distinct(), "vid", "left_anti")
        .join(own, "vid")
        .select(
            "vid",
            F.when(iso_gain > 0, -(F.col("vid") + 1)).otherwise(F.col("_A")).alias("label"),
            (iso_gain > 0).alias("_moved"),
        )
    )
    out = moved.unionByName(isolated)
    if non_movers is not None:
        out = out.unionByName(non_movers)
    return out


def _iterate_moves(
    edges: DataFrame,
    labels: DataFrame,
    node_weights: DataFrame,
    cfg: CorrelationConfig,
    n_blocks: int,
    parts: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """Up to ``louvain_num_inner_iterations`` best-move rounds (each a
    ``n_blocks``-block sweep under block_async), stopping early on a
    zero-move sweep — the reference's IterateBestMoves
    (parallel_correlation.cc:300-327) shape.  Returns (labels, moves)."""
    cur = labels
    total = 0
    for _ in range(cfg.louvain_num_inner_iterations):
        sweep_moved = 0
        for b in range(n_blocks):
            stepped = best_moves(
                edges, cur, node_weights, cfg.resolution,
                cfg.edge_weight_offset, parts=parts,
                block=(b, n_blocks) if n_blocks > 1 else None,
            )
            obs = Observation()
            cur = cut_lineage(
                stepped.observe(obs, F.sum(F.col("_moved").cast("long")).alias("n"))
                .select("vid", "label")
            )
            sweep_moved += int(obs.get["n"] or 0)
        total += sweep_moved
        if sweep_moved == 0:
            break
    return cur, total


def correlation_cluster(
    edges: DataFrame,
    config: CorrelationConfig | None = None,
    node_weights: DataFrame | None = None,
    already_symmetric: bool = False,
    parts: DataFrame | None = None,
) -> DataFrame:
    """Louvain local search for the correlation objective.  Returns
    ``(vid, label)`` canonicalized to label = min member vid.

    ``edges`` may be directed; symmetrized with MAX dedup first (the
    reference requires an undirected input graph,
    parallel_correlation.h:36-39).

    With ``config.use_bipartite_objective``, ``parts`` (vid, part ∈
    {0,1}) is required and the bipartite objective applies (see
    :class:`CorrelationConfig`); vertices missing from ``parts``
    default to part 0.
    """
    cfg = config or CorrelationConfig()
    if cfg.use_bipartite_objective:
        if parts is None:
            raise ValueError("use_bipartite_objective requires parts (vid, part)")
        return _correlation_cluster_bipartite(
            edges, cfg, node_weights, already_symmetric, parts
        )
    sym = edges if already_symmetric else symmetrize(edges)
    verts = vertex_ids(sym)
    nw = (
        node_weights.select("vid", F.col("node_weight").cast("double"))
        if node_weights is not None
        else verts.select("vid", F.lit(1.0).alias("node_weight"))
    )

    labels = cut_lineage(verts.select("vid", F.col("vid").alias("label")))
    cur_edges = sym.select("src", "dst", "weight").persist(StorageLevel.MEMORY_AND_DISK)
    cur_labels = labels  # labels over CURRENT level's vertex ids
    cur_nw = nw

    n_blocks = cfg.num_move_blocks if cfg.move_schedule == "block_async" else 1
    refine = cfg.use_refinement
    snaps: list[tuple[DataFrame, DataFrame, DataFrame]] = []
    for level in range(cfg.louvain_num_iterations):
        cur_labels, level_moved = _iterate_moves(
            cur_edges, cur_labels, cur_nw, cfg, n_blocks
        )
        if level_moved == 0:
            break
        labels = cut_lineage(flatten_clustering(labels, cur_labels))
        if level + 1 >= cfg.louvain_num_iterations:
            break
        new_edges, new_nw = compress_graph(cur_edges, cur_labels, cur_nw, agg="sum")
        old = cur_edges
        if refine:
            # keep this level's graph/weights/local labels materialized
            # for the walk back down (the proto's quoted memory
            # overhead, correlation.proto:131-134)
            snaps.append((old, cur_nw, cur_labels))
        cur_edges = cut_lineage(new_edges)
        if not refine:
            old.unpersist()
        cur_nw = cut_lineage(new_nw)
        cur_labels = cur_nw.select("vid", F.col("vid").alias("label"))
        if cur_edges.isEmpty():
            break

    if refine and snaps:
        # multi-level refinement walk (parallel_correlation.cc:538-575):
        # seed level i with its local clustering flattened through the
        # refined coarser labels (contracted node id == local label
        # value, so the flatten is a join on that id), re-run the inner
        # move rounds on level i's graph, finish on the original graph.
        refined = cur_labels
        for e_i, nw_i, loc_i in reversed(snaps):
            seed = cut_lineage(
                loc_i.select("vid", F.col("label").alias("_cn"))
                .join(
                    refined.select(
                        F.col("vid").alias("_cn"), F.col("label").alias("_rl")
                    ),
                    "_cn",
                )
                .select("vid", F.col("_rl").alias("label"))
            )
            refined, _ = _iterate_moves(e_i, seed, nw_i, cfg, n_blocks)
            e_i.unpersist()
        labels = refined

    # canonical relabel: min member vid (the reference remaps to a dense
    # [0, k) id space, parallel_correlation_util.cc — min-vid is the
    # relabel-invariant canonical form our oracles compare on)
    canon = labels.groupBy("label").agg(F.min("vid").alias("_c"))
    out = labels.join(canon, "label").select("vid", F.col("_c").alias("label"))
    cur_edges.unpersist()
    return out


def _correlation_cluster_bipartite(
    edges: DataFrame,
    cfg: CorrelationConfig,
    node_weights: DataFrame | None,
    already_symmetric: bool,
    parts: DataFrame,
) -> DataFrame:
    """Bipartite-objective Louvain.  The level structure mirrors the
    reference's bipartite path (parallel_correlation.cc:483-530,
    PrepareBipartiteGraphCompression): contraction groups by
    (cluster, part) — nodes of the same cluster but different parts are
    NOT merged, so every level node carries a part — and both part-nodes
    of a cluster START the next level co-clustered.  New node ids are
    2·L+part with L = min original member vid (pure arithmetic, keeps
    ids nonnegative and disjoint from fresh negative labels)."""
    sym = edges if already_symmetric else symmetrize(edges)
    verts = vertex_ids(sym)
    nw = (
        node_weights.select("vid", F.col("node_weight").cast("double"))
        if node_weights is not None
        else verts.select("vid", F.lit(1.0).alias("node_weight"))
    )
    p0 = parts.select("vid", F.col("part").cast("int").alias("part"))

    node_of = cut_lineage(verts.select("vid", F.col("vid").alias("node")))
    cur_labels = cut_lineage(verts.select("vid", F.col("vid").alias("label")))
    cur_edges = sym.select("src", "dst", "weight").persist(StorageLevel.MEMORY_AND_DISK)
    cur_nw = nw
    cur_parts = cut_lineage(
        verts.join(p0, "vid", "left").select("vid", F.coalesce("part", F.lit(0)).alias("part"))
    )

    n_blocks = cfg.num_move_blocks if cfg.move_schedule == "block_async" else 1
    refine = cfg.use_refinement
    snaps: list[tuple[DataFrame, DataFrame, DataFrame, DataFrame]] = []
    for level in range(cfg.louvain_num_iterations):
        cur_labels, level_moved = _iterate_moves(
            cur_edges, cur_labels, cur_nw, cfg, n_blocks, parts=cur_parts
        )
        if level_moved == 0 or level + 1 >= cfg.louvain_num_iterations:
            break

        # contraction by (cluster, part); canonical L = min orig member
        memb = node_of.join(
            cur_labels.select(F.col("vid").alias("node"), "label"), "node"
        )
        canon = memb.groupBy("label").agg(F.min("vid").alias("_L"))
        node_map = cut_lineage(
            cur_labels.select(F.col("vid").alias("node"), "label")
            .join(canon, "label")
            .join(cur_parts.select(F.col("vid").alias("node"), "part"), "node")
            .select(
                "node",
                (F.col("_L") * 2 + F.col("part")).alias("_nn"),
                "part",
                F.col("_L"),
            )
        )
        node_of = cut_lineage(
            node_of.join(node_map.select("node", "_nn"), "node")
            .select("vid", F.col("_nn").alias("node"))
        )
        map_s = node_map.select(F.col("node").alias("src"), F.col("_nn").alias("_ns"))
        map_d = node_map.select(F.col("node").alias("dst"), F.col("_nn").alias("_nd"))
        new_edges = (
            cur_edges.join(map_s, "src")
            .join(map_d, "dst")
            .select(F.col("_ns").alias("src"), F.col("_nd").alias("dst"), "weight")
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        new_nw = (
            cur_nw.join(node_map.select(F.col("node").alias("vid"), "_nn"), "vid")
            .groupBy(F.col("_nn").alias("vid"))
            .agg(F.sum("node_weight").alias("node_weight"))
        )
        old = cur_edges
        if refine:
            snaps.append(
                (old, cur_nw, cur_parts, node_map.select("node", "_nn"))
            )
        cur_edges = cut_lineage(new_edges)
        if not refine:
            old.unpersist()
        cur_nw = cut_lineage(new_nw)
        cur_parts = cut_lineage(node_map.select(F.col("_nn").alias("vid"), "part").distinct())
        cur_labels = cut_lineage(
            node_map.select(F.col("_nn").alias("vid"), (F.col("_L") * 2).alias("label")).distinct()
        )
        if cur_edges.isEmpty():
            break

    if refine and snaps:
        # bipartite refinement walk: the level-i -> level-(i+1) node
        # linkage is the stored node_map (node -> 2L+part, the
        # FlattenBipartiteClustering analog, parallel_correlation.cc:
        # 545-552); seed level i by reading the refined label of each
        # node's contracted id, then re-run the part-aware move rounds
        # on level i's graph.
        refined = cur_labels
        for e_i, nw_i, parts_i, map_i in reversed(snaps):
            seed = cut_lineage(
                map_i.select(F.col("node").alias("vid"), F.col("_nn").alias("_cn"))
                .join(
                    refined.select(
                        F.col("vid").alias("_cn"), F.col("label").alias("_rl")
                    ),
                    "_cn",
                )
                .select("vid", F.col("_rl").alias("label"))
            )
            refined, _ = _iterate_moves(e_i, seed, nw_i, cfg, n_blocks, parts=parts_i)
            e_i.unpersist()
        # level-0 nodes ARE the original vids
        out = refined
    else:
        out = node_of.join(
            cur_labels.select(F.col("vid").alias("node"), "label"), "node"
        ).select("vid", "label")
    canon = out.groupBy("label").agg(F.min("vid").alias("_c"))
    res = out.join(canon, "label").select("vid", F.col("_c").alias("label"))
    cur_edges.unpersist()
    return res


def modularity_cluster(
    edges: DataFrame,
    resolution: float = 1.0,
    config: CorrelationConfig | None = None,
    already_symmetric: bool = False,
) -> DataFrame:
    """ModularityClusterer analog (parallel_modularity.cc:84-118):
    correlation clustering with node weight = weighted degree and
    resolution scaled by 1 / total edge weight (Σ_v weighted_degree =
    2M on the both-orientations table), edge_weight_offset = 0.
    """
    sym = edges if already_symmetric else symmetrize(edges)
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    wdeg = sym.groupBy(F.col("src").alias("vid")).agg(F.sum("weight").alias("node_weight"))
    total = sym.agg(F.sum("weight")).first()[0] or 0.0
    eff = 0.0 if total == 0.0 else float(resolution) / float(total)
    cfg = config or CorrelationConfig()
    cfg = CorrelationConfig(
        resolution=eff,
        edge_weight_offset=0.0,
        louvain_num_iterations=cfg.louvain_num_iterations,
        louvain_num_inner_iterations=cfg.louvain_num_inner_iterations,
        move_schedule=cfg.move_schedule,
        num_move_blocks=cfg.num_move_blocks,
        use_refinement=cfg.use_refinement,
    )
    out = correlation_cluster(sym, cfg, node_weights=wdeg, already_symmetric=True)
    sym.unpersist()
    return out


def correlation_objective(
    edges: DataFrame,
    labels: DataFrame,
    node_weights: DataFrame | None = None,
    resolution: float = 0.0,
    edge_weight_offset: float = 0.0,
) -> float:
    """Evaluate the correlation objective of a clustering (for tests /
    quality comparisons).  ``edges`` symmetrized; each unordered pair
    counted once.

    objective = Σ_{intra edges} (w − offset) − res/2 · Σ_C (K_C² − Σ_{v∈C} k_v²)
    """
    res = float(resolution)
    off = float(edge_weight_offset)
    nw = (
        node_weights.select("vid", F.col("node_weight").cast("double"))
        if node_weights is not None
        else labels.select("vid", F.lit(1.0).alias("node_weight"))
    )
    lab_src = labels.select(F.col("vid").alias("src"), F.col("label").alias("_cs"))
    lab_dst = labels.select(F.col("vid").alias("dst"), F.col("label").alias("_cd"))
    intra = (
        remove_self_loops(edges)
        .join(lab_src, "src")
        .join(lab_dst, "dst")
        .filter(F.col("_cs") == F.col("_cd"))
        .agg((F.sum(F.col("weight") - F.lit(off)) / 2).alias("s"))
        .first()["s"]
        or 0.0
    )
    per_c = (
        labels.join(nw, "vid")
        .groupBy("label")
        .agg(F.sum("node_weight").alias("K"), F.sum(F.col("node_weight") ** 2).alias("k2"))
        .agg(F.sum((F.col("K") ** 2 - F.col("k2")) / 2).alias("pairs"))
        .first()["pairs"]
        or 0.0
    )
    return float(intra) - res * float(per_c)
