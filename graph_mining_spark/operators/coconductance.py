"""Coconductance clustering — Louvain local search for Σ_C ccond(C)^p.

Parity target: /root/reference/in_memory/clustering/coconductance/
(coconductance.proto:24-40 objective, coconductance.cc:95-210 Louvain
loop, coconductance_internal.cc:48-74 ObjectiveChangeAfterMove,
coconductance_internal.h:60-66 ClusterObjective).

Objective: for cluster C, vol(C) = Σ node weight (the proto's weighted
degree), E(C) = total weight of undirected edges inside C (self-loops
included), ccond(C) = 2·E(C)/vol(C); maximize Σ_C ccond(C)^p.
ClusterObjective returns 0 when vol < 1e-6.

Move delta for u: A→B (coconductance_internal.cc:60-73):

    [obj(E_A − e_uA − ℓ_u, W_A − w_u) + obj(E_B + e_uB + ℓ_u, W_B + w_u)]
  − [obj(E_A, W_A) + obj(E_B, W_B)]

with e_uC = edge weight from u into C (u's self-loop counts into
e_uA via the reference's neighbor scan) and ℓ_u = u's self-loop weight.
Moving to an empty cluster (reference EmptyClusters, coconductance.cc:
111-122) is the "fresh singleton" move, obj(ℓ_u, w_u).

Like the correlation clusterer, this runs the SYNCHRONOUS deterministic
variant (the reference shuffles a random permutation and applies moves
in sequence): all vertices compute deltas against the same snapshot,
positive moves apply at once, mutual-singleton swaps are broken toward
the smaller label, and tie-breaks prefer an existing cluster over a
fresh one (the reference tries empty clusters last and requires strict
improvement) then the smaller cluster id.  Levels compress with SUM
linkage while carrying each cluster's INTERNAL weight as node state —
the self-loop the reference's CompressGraph materializes.

Node weights default to the weighted degree (the proto's vol); pass
``node_weights`` to override, matching SimpleUndirectedGraph node
weights.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_mining_spark.checkpoint import cut_lineage
from graph_mining_spark.graph import remove_self_loops, symmetrize, vertex_ids
from graph_mining_spark.operators.affinity import flatten_clustering


@dataclass
class CoconductanceConfig:
    exponent: float = 1.0
    num_levels: int = 10
    num_inner_iterations: int = 10


def _obj(e, w, p: float):
    """ClusterObjective (coconductance_internal.h:60-66)."""
    return F.when(w < 1e-6, F.lit(0.0)).otherwise(F.pow(2.0 * e / w, F.lit(p)))


def coconductance_cluster(
    edges: DataFrame,
    config: CoconductanceConfig | None = None,
    node_weights: DataFrame | None = None,
    already_symmetric: bool = False,
) -> DataFrame:
    """Returns ``(vid, label)`` canonicalized to min member vid."""
    cfg = config or CoconductanceConfig()
    p = float(cfg.exponent)
    # input self-loops carry into the objective (reference
    # InitialState: cluster_edges[i] = EdgeWeight(i, i),
    # coconductance_internal.cc:43; vol = WeightedDegree counts the
    # self-loop entry ONCE, graph_utils.cc:33-40) — symmetrize drops
    # them, so extract ℓ_u from the raw input first (max-dedup of
    # duplicate rows, matching symmetrize's default edge dedup)
    loops = (
        edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("vid"))
        .agg(F.max(F.col("weight").cast("double")).alias("_loop"))
    )
    sym = edges if already_symmetric else symmetrize(edges)
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    # a vertex whose only edge is a self-loop still participates
    verts = vertex_ids(sym).unionByName(loops.select("vid")).distinct()
    if node_weights is not None:
        nw = node_weights.select("vid", F.col("node_weight").cast("double"))
    else:
        # proto objective: vol = weighted degree (self-loop once)
        nw = remove_self_loops(sym).groupBy(F.col("src").alias("vid")).agg(
            F.sum("weight").alias("node_weight")
        )
        nw = (
            verts.join(nw, "vid", "left")
            .join(loops, "vid", "left")
            .select(
                "vid",
                (
                    F.coalesce("node_weight", F.lit(0.0)) + F.coalesce("_loop", F.lit(0.0))
                ).alias("node_weight"),
            )
        )

    labels = cut_lineage(verts.select("vid", F.col("vid").alias("label")))
    cur_edges = cut_lineage(remove_self_loops(sym).select("src", "dst", "weight"))
    # node state: weight w and internal (self-loop) weight ℓ
    cur_state = cut_lineage(
        nw.join(loops, "vid", "left").select(
            "vid", "node_weight", F.coalesce("_loop", F.lit(0.0)).alias("internal")
        )
    )
    cur_labels = cur_state.select("vid", F.col("vid").alias("label"))

    for level in range(cfg.num_levels):
        # fresh-singleton labels must NEVER collide with an existing
        # cluster id — neither a current vid (which can be negative at
        # level >= 1: fresh labels survive contraction as node ids) nor
        # a fresh label minted in an EARLIER inner iteration (a vacated
        # one may have been re-occupied by a mover).  Per-iteration
        # disjoint blocks below everything: iteration it mints
        #   fresh(u) = base - 1 - it*span - (u - min_vid)
        # with base = min(0, min_vid) and span = max_vid - min_vid + 1,
        # so blocks are pairwise disjoint and all < base <= every
        # pre-existing id.  (One vertex-sized agg per level.)
        _b = cur_labels.agg(
            F.min("vid").alias("mn"), F.max("vid").alias("mx")
        ).first()
        if _b["mn"] is None:
            break
        _min_vid = int(_b["mn"])
        _span = int(_b["mx"]) - _min_vid + 1
        _base = min(0, _min_vid)
        level_moved = 0
        for _it in range(cfg.num_inner_iterations):
            _fresh = (
                F.lit(_base - 1 - _it * _span) - (F.col("vid") - F.lit(_min_vid))
            )
            lab_nw = cur_labels.join(cur_state, "vid")
            cw = lab_nw.groupBy("label").agg(
                F.sum("node_weight").alias("_W"),
                F.sum("internal").alias("_I"),
                F.count("*").alias("_n"),
            )
            lab_dst = cur_labels.select(F.col("vid").alias("dst"), F.col("label").alias("_C"))
            s_uc = (
                cur_edges.join(lab_dst, "dst")
                .groupBy(F.col("src").alias("vid"), "_C")
                .agg(F.sum("weight").alias("_s"))
            )
            own = lab_nw.select(
                "vid", F.col("label").alias("_A"), F.col("node_weight").alias("_w"),
                F.col("internal").alias("_l"),
            )
            # E_C = I_C + (Σ_{u∈C} e_uA)/2
            intra = (
                s_uc.join(own.select("vid", "_A"), "vid")
                .filter(F.col("_C") == F.col("_A"))
                .groupBy(F.col("_A").alias("label"))
                .agg((F.sum("_s") / 2).alias("_intra"))
            )
            cstats = cw.join(intra, "label", "left").select(
                "label", "_W", "_n",
                (F.col("_I") + F.coalesce("_intra", F.lit(0.0))).alias("_E"),
            )
            own2 = own.join(
                cstats.select(
                    F.col("label").alias("_A"), F.col("_W").alias("_WA"),
                    F.col("_E").alias("_EA"), F.col("_n").alias("_nA"),
                ),
                "_A",
            )
            cand = s_uc.join(own2, "vid").join(
                cstats.select(
                    F.col("label").alias("_C"), F.col("_W").alias("_WC"),
                    F.col("_E").alias("_EC"), F.col("_n").alias("_nC"),
                ),
                "_C",
            )
            swap_blocked = (
                (F.col("_nA") == 1) & (F.col("_nC") == 1) & (F.col("_C") > F.col("_A"))
            )
            per_u = cand.groupBy("vid", "_A", "_w", "_l", "_WA", "_EA").agg(
                F.coalesce(
                    F.sum(F.when(F.col("_C") == F.col("_A"), F.col("_s"))), F.lit(0.0)
                ).alias("_sA"),
            )
            # the argmax is by DELTA, which needs per-u s_uA — so deltas
            # are computed in a second pass over the (u, C) rows
            obj_A = _obj(F.col("_EA"), F.col("_WA"), p)
            obj_A_minus = _obj(
                F.col("_EA") - F.col("_sA") - F.col("_l"), F.col("_WA") - F.col("_w"), p
            )
            delta_expr = (
                obj_A_minus
                + _obj(F.col("_EC") + F.col("_s") + F.col("_l"), F.col("_WC") + F.col("_w"), p)
                - obj_A
                - _obj(F.col("_EC"), F.col("_WC"), p)
            )
            sA_of_u = per_u.select("vid", "_sA")
            cand2 = (
                cand.join(sA_of_u, "vid")
                .filter((F.col("_C") != F.col("_A")) & ~swap_blocked)
                .select(
                    "vid", "_A", "_w", "_l", "_WA", "_EA", "_sA", "_C",
                    delta_expr.alias("_delta"),
                )
            )
            best_c = cand2.groupBy("vid").agg(
                F.max(F.struct(F.col("_delta").alias("d"), (-F.col("_C")).alias("negc"))).alias("_b")
            )
            base_u = per_u.select("vid", "_A", "_w", "_l", "_WA", "_EA", "_sA")
            delta_new = (
                obj_A_minus + _obj(F.col("_l"), F.col("_w"), p) - obj_A
            )
            stepped = (
                base_u.join(best_c, "vid", "left")
                .withColumn("_dnew", delta_new)
                .select(
                    "vid",
                    # reference tries empty clusters LAST with strict
                    # improvement: ties prefer the existing cluster
                    F.when(
                        F.col("_b").isNotNull()
                        & (F.col("_b.d") >= F.col("_dnew"))
                        & (F.col("_b.d") > 0),
                        -F.col("_b.negc"),
                    )
                    .when(F.col("_dnew") > 0, _fresh)
                    .otherwise(F.col("_A"))
                    .alias("label"),
                    (
                        F.when(
                            F.col("_b").isNotNull() & (F.col("_b.d") >= F.col("_dnew")),
                            F.col("_b.d"),
                        ).otherwise(F.col("_dnew"))
                        > 0
                    ).alias("_moved"),
                )
            )
            # vertices with no inter-cluster candidates still get a row
            # via base_u (left join) — isolated-vertex handling: never
            # appear in s_uc at all → union them unchanged
            missing = cur_labels.join(base_u.select("vid"), "vid", "left_anti").select(
                "vid", "label", F.lit(False).alias("_moved")
            )
            obs = Observation()
            cur_labels = cut_lineage(
                stepped.unionByName(missing)
                .observe(obs, F.sum(F.col("_moved").cast("long")).alias("n"))
                .select("vid", "label")
            )
            n_moved = int(obs.get["n"] or 0)
            level_moved += n_moved
            if n_moved == 0:
                break
        if level_moved == 0:
            break
        labels = cut_lineage(flatten_clustering(labels, cur_labels))
        if level + 1 >= cfg.num_levels:
            break
        # compress: SUM inter edges; node state (w, internal=E_C) per cluster
        lab_nw = cur_labels.join(cur_state, "vid")
        lab_dst = cur_labels.select(F.col("vid").alias("dst"), F.col("label").alias("_cd"))
        lab_src = cur_labels.select(F.col("vid").alias("src"), F.col("label").alias("_cs"))
        relabeled = cur_edges.join(lab_src, "src").join(lab_dst, "dst")
        new_edges = (
            relabeled.filter(F.col("_cs") != F.col("_cd"))
            .groupBy(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
            .agg(F.sum("weight").alias("weight"))
        )
        intra_by_c = (
            relabeled.filter(F.col("_cs") == F.col("_cd"))
            .groupBy(F.col("_cs").alias("vid"))
            .agg((F.sum("weight") / 2).alias("_intra"))
        )
        new_state = (
            lab_nw.groupBy(F.col("label").alias("vid"))
            .agg(F.sum("node_weight").alias("node_weight"), F.sum("internal").alias("_i"))
            .join(intra_by_c, "vid", "left")
            .select(
                "vid", "node_weight",
                (F.col("_i") + F.coalesce("_intra", F.lit(0.0))).alias("internal"),
            )
        )
        cur_edges = cut_lineage(new_edges)
        cur_state = cut_lineage(new_state)
        cur_labels = cur_state.select("vid", F.col("vid").alias("label"))
        if cur_edges.isEmpty():
            break

    canon = labels.groupBy("label").agg(F.min("vid").alias("_c"))
    out = labels.join(canon, "label").select("vid", F.col("_c").alias("label"))
    sym.unpersist()
    return out


def coconductance_objective(
    edges: DataFrame, labels: DataFrame, exponent: float = 1.0,
    node_weights: DataFrame | None = None,
) -> float:
    """Σ_C (2·E(C)/vol(C))^p — evaluation helper (CoconductanceObjective,
    coconductance_internal.cc).  Input self-loops count once into both
    E(C) and the default vol (WeightedDegree semantics)."""
    loops = (
        edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("vid"))
        .agg(F.max(F.col("weight").cast("double")).alias("_loop"))
    )
    sym = symmetrize(edges)
    if node_weights is None:
        nw = remove_self_loops(sym).groupBy(F.col("src").alias("vid")).agg(
            F.sum("weight").alias("node_weight")
        )
        nw = (
            labels.select("vid")
            .join(nw, "vid", "left")
            .join(loops, "vid", "left")
            .select(
                "vid",
                (
                    F.coalesce("node_weight", F.lit(0.0)) + F.coalesce("_loop", F.lit(0.0))
                ).alias("node_weight"),
            )
        )
    else:
        nw = node_weights.select("vid", F.col("node_weight").cast("double"))
    lab_src = labels.select(F.col("vid").alias("src"), F.col("label").alias("_cs"))
    lab_dst = labels.select(F.col("vid").alias("dst"), F.col("label").alias("_cd"))
    per = (
        remove_self_loops(sym)
        .join(lab_src, "src")
        .join(lab_dst, "dst")
        .filter(F.col("_cs") == F.col("_cd"))
        .groupBy(F.col("_cs").alias("label"))
        .agg((F.sum("weight") / 2).alias("E"))
    )
    loop_e = labels.join(loops, "vid").groupBy("label").agg(F.sum("_loop").alias("_LE"))
    per = (
        per.join(loop_e, "label", "full")
        .select(
            "label",
            (F.coalesce("E", F.lit(0.0)) + F.coalesce("_LE", F.lit(0.0))).alias("E"),
        )
    )
    vol = labels.join(nw, "vid").groupBy("label").agg(F.sum("node_weight").alias("W"))
    row = (
        vol.join(per, "label", "left")
        .select(_obj(F.coalesce("E", F.lit(0.0)), F.col("W"), float(exponent)).alias("o"))
        .agg(F.sum("o"))
        .first()
    )
    return float(row[0] or 0.0)
