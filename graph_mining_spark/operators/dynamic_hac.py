"""Dynamic HAC — incremental insert/remove with delta-driven re-clustering.

Parity target: /root/reference/in_memory/clustering/dynamic/hac/hac.h
(DynamicHacClusterer: Insert/Remove/FlatCluster/Dendrogram/UpdateStats),
dynamic_hac.proto (epsilon + required weight_threshold),
dynamic_dendrogram.h, dynamic_clustered_graph.h.

The reference maintains a shared-memory incremental structure: updates
mark DIRTY partitions (color-based) and re-run subgraph HAC only on
those, keeping everything else cached (hac.cc, dynamic_hac_updater.cc).
The honest Spark analog — no shared mutable state across executors —
is DELTA-DRIVEN RE-CLUSTERING at component granularity:

  * state = edge table + per-component cached dendrogram/labels
    (DataFrames, lineage-cut per update);
  * an insert/remove batch marks the touched components dirty
    (endpoints of new edges, removed nodes and their old neighbors,
    plus any components they connect to);
  * connected components are recomputed ONLY over the dirty subgraph
    (old dirty components can merge via new edges or split via
    removals);
  * ParHac (same ε / weight_threshold semantics) re-runs on the dirty
    subgraph only; cached results of clean components are untouched;
  * UpdateStats reports dirty partitions/nodes/edges like the
    reference's (hac.h:68-88).

Work per update is proportional to the total size of dirty components
— the same asymptotic contract as the reference (whose dirty unit is a
partition rather than a component).  The correctness contract is
equivalence with from-scratch ParHac on the current graph, asserted at
ε=0 (exact HAC) after arbitrary update sequences in
tests/test_dynamic_hac.py.

``dirty_unit="cluster"`` switches to the FINER unit a giant-component
graph needs (mirroring the bounded dirty regions of the reference's
color partitions, dynamic/hac/color_utils.h:28-76): the dirty unit is
the FLAT CLUSTER at the linkage threshold — every dendrogram tree is
one flat cluster (merges stop below the threshold), so cluster-granular
invalidation replaces exactly the affected trees while the rest of a
giant component stays cached.  Re-clustering runs the TeraHac subgraph
kernel over the dirty clusters' vertices with 1-hop FROZEN boundary
neighbors contracted to their cached clusters (weight = summed cross
weight, size = cached cluster size — the exact similarity landscape of
the cached fixpoint), then EXPANDS the dirty set and repeats whenever a
re-clustered cluster's similarity to a frozen neighbor cluster reaches
the threshold (removals can shrink clusters and push cross-cluster
similarities back above it).  Per-update work is bounded by the touched
clusters plus actual cascades, never the component.  The expansion loop
provably terminates in at most #flat-clusters rounds: every flagged
cluster is outside the current dirty set (its vertices survive the
anti-join on the dirty region), so each non-final round strictly grows
the dirty set — the worst case is an adversarial removal chain pulling
in one frozen neighbor per round (``UpdateStats.expansion_rounds``
reports the realized cascade depth; each round is a constant number of
Spark jobs over dirty-region-sized data).  Average-linkage
reducibility makes insert-only sequences exactly scratch-equal at ε=0
(cross-cluster similarities only fall as clusters grow, so frozen
boundaries are sound); removal cascades re-converge through expansion
and are scratch-equal on every tested sequence, with the same (1+ε)
contract as the reference's partition-granular updater in general.

Internal dendrogram node ids: each update re-keys the new merges into a
fresh id range above everything allocated before (``_next_internal``),
so cached rows from clean components never collide; parent > child
holds within every component's subtree.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_mining_spark.checkpoint import cut_lineage
from graph_mining_spark.operators.connected_components import connected_components
from graph_mining_spark.operators.hac import ParHacConfig, flatten_dendrogram, parhac
from graph_mining_spark.operators.minla import _rank_partitions, _two_phase_rank


@dataclass
class UpdateStats:
    """hac.h:68-88."""

    dirty_partitions: int = 0
    dirty_nodes: int = 0
    dirty_edges: int = 0
    nodes_ignored: int = 0
    #: cluster-mode expansion rounds this update took (cascade depth;
    #: 1 = no cascade — the first re-cluster flagged nothing)
    expansion_rounds: int = 0


_EMPTY_EDGES = "src long, dst long, weight double"
_EMPTY_DENDRO = "comp long, node_id long, parent_id long, merge_similarity double"
_EMPTY_LABELS = "vid long, label long, comp long"


class DynamicHac:
    """DynamicHacClusterer analog.  ``weight_threshold`` is required
    (dynamic_hac.proto via hac.h:54-59); ``epsilon`` defaults 0."""

    def __init__(
        self,
        spark: SparkSession,
        weight_threshold: float,
        epsilon: float = 0.0,
        dirty_unit: str = "component",
    ):
        if weight_threshold is None:
            raise ValueError("weight_threshold is required")
        if dirty_unit not in ("component", "cluster"):
            raise ValueError("dirty_unit must be 'component' or 'cluster'")
        self.spark = spark
        self.epsilon = float(epsilon)
        self.weight_threshold = float(weight_threshold)
        # "component": exact scratch-equivalent re-clustering of whole
        # dirty components.  "cluster": flat-cluster-granular dirtiness
        # with frozen boundaries + expansion (module docstring) — the
        # giant-component scale path; labels.comp then holds the
        # cluster label (the dirty-unit id).
        self.dirty_unit = dirty_unit
        # canonical undirected edges, src < dst
        self.edges = spark.createDataFrame([], _EMPTY_EDGES)
        # (vid, label, comp): flat cluster + component per vertex
        self.labels = spark.createDataFrame([], _EMPTY_LABELS)
        # (comp, node_id, parent_id, merge_similarity)
        self.dendro = spark.createDataFrame([], _EMPTY_DENDRO)
        self._next_internal = 1 << 40  # above any realistic vid

    # ---------------- public surface ----------------

    def insert(self, new_edges: DataFrame, new_nodes: DataFrame | None = None) -> UpdateStats:
        """Insert nodes with incident edges (Insert, hac.h:100-110).
        ``new_edges``: (src, dst, weight); ``new_nodes``: optional
        (vid,) for isolated insertions."""
        delta = (
            new_edges.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                F.col("weight").cast("double"),
            )
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )
        touched = (
            delta.select(F.col("src").alias("vid"))
            .unionByName(delta.select(F.col("dst").alias("vid")))
            .distinct()
        )
        if new_nodes is not None:
            touched = touched.unionByName(new_nodes.select("vid")).distinct()
        new_edge_table = cut_lineage(
            self.edges.unionByName(delta)
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )
        return self._reconcile(new_edge_table, touched, int(delta.count()))

    def remove(self, nodes: DataFrame) -> UpdateStats:
        """Remove nodes and their incident edges (Remove, hac.h:113-116)."""
        rm = nodes.select("vid").distinct()
        rm_s = rm.select(F.col("vid").alias("src"))
        rm_d = rm.select(F.col("vid").alias("dst"))
        dropped = self.edges.join(rm_s, "src", "left_semi").unionByName(
            self.edges.join(rm_d, "dst", "left_semi")
        )
        # neighbors of removed nodes are the dirty seeds; the removed
        # nodes themselves leave the graph
        touched = (
            dropped.select(F.col("src").alias("vid"))
            .unionByName(dropped.select(F.col("dst").alias("vid")))
            .distinct()
            .join(rm, "vid", "left_anti")
        )
        n_dropped = int(dropped.select("src", "dst").distinct().count())
        new_edge_table = cut_lineage(
            self.edges.join(rm_s, "src", "left_anti").join(rm_d, "dst", "left_anti")
        )
        # comps of the removed vertices must go dirty even when the
        # vertex was isolated (no surviving neighbor to mark them)
        rm_comps = self.labels.join(rm, "vid", "left_semi").select("comp").distinct()
        self.labels = cut_lineage(self.labels.join(rm, "vid", "left_anti"))
        return self._reconcile(new_edge_table, touched, n_dropped, extra_dirty=rm_comps)

    def flat_cluster(self, cut_threshold: float | None = None) -> DataFrame:
        """FlatCluster (hac.h:91-92): flatten the maintained dendrogram
        at ``cut_threshold`` (default: the state's weight_threshold,
        i.e. the cached labels)."""
        if cut_threshold is None:
            return self.labels.select("vid", "label")
        flat = flatten_dendrogram(
            self.dendro.select("node_id", "parent_id", "merge_similarity"), cut_threshold
        )
        # singletons with no dendrogram presence
        missing = self.labels.select("vid").join(
            flat.select(F.col("vid")), "vid", "left_anti"
        )
        return flat.unionByName(missing.select("vid", F.col("vid").alias("label")))

    def dendrogram(self) -> DataFrame:
        """Dendrogram (hac.h:96): (node_id, parent_id, merge_similarity)."""
        return self.dendro.select("node_id", "parent_id", "merge_similarity")

    # ---------------- delta reconciliation ----------------

    def _reconcile(
        self,
        new_edge_table: DataFrame,
        touched: DataFrame,
        delta_edges: int,
        extra_dirty: DataFrame | None = None,
    ) -> UpdateStats:
        if self.dirty_unit == "cluster":
            return self._reconcile_clusters(new_edge_table, touched, delta_edges, extra_dirty)
        return self._reconcile_components(new_edge_table, touched, delta_edges, extra_dirty)

    def _reconcile_clusters(
        self,
        new_edge_table: DataFrame,
        touched: DataFrame,
        delta_edges: int,
        extra_dirty: DataFrame | None = None,
    ) -> UpdateStats:
        """Flat-cluster-granular reconcile with frozen boundaries and
        expansion (module docstring).  ``labels.comp`` == cluster label
        in this mode, so ``extra_dirty`` (comp,) rows are cluster ids."""
        from graph_mining_spark.operators.terahac import _subgraph_hac_kernel

        theta = self.weight_threshold
        eps = self.epsilon
        prune = theta / (1.0 + eps)
        labels = self.labels
        csize = cut_lineage(labels.groupBy("label").agg(F.count("*").alias("_csz")))

        dirty = labels.join(touched, "vid", "left_semi").select("label").distinct()
        if extra_dirty is not None:
            dirty = dirty.unionByName(extra_dirty.select(F.col("comp").alias("label"))).distinct()
        new_verts = cut_lineage(touched.join(labels.select("vid"), "vid", "left_anti"))
        sym = new_edge_table.unionByName(
            new_edge_table.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )

        def run(pdf):
            return _subgraph_hac_kernel(pdf, eps, theta)

        # Expansion fixpoint.  TERMINATION IS PROVABLE, not a timeout:
        # a flagged label comes from a cross edge whose dst survived
        # the left-anti join on D, and D contains every vertex of every
        # dirty label — so a flagged label is NEVER already dirty, and
        # each non-final round strictly grows ``dirty`` by at least one
        # frozen cluster.  Rounds are therefore bounded by the number
        # of flat clusters (the worst case is a removal chain that
        # drags in one frozen neighbor per round — see
        # tests/test_dynamic_hac.py::test_adversarial_removal_cascade).
        # The loop runs un-counted for the first 1000 rounds (no extra
        # Spark job); past that we pay one cluster-sized count() for
        # the true bound and only raise beyond it (a genuine bug, since
        # strict progress makes the bound unreachable).
        _cluster_bound = None
        _round = 0
        while True:
            dirty = cut_lineage(dirty)
            D = cut_lineage(
                labels.join(dirty, "label", "left_semi")
                .select("vid")
                .unionByName(new_verts)
                .distinct()
            )
            internal = cut_lineage(
                sym.join(D.withColumnRenamed("vid", "src"), "src", "left_semi")
                .join(D.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            )
            # cross edges leave D; contract the frozen side to its
            # cached cluster (summed weight, cached size)
            cross = cut_lineage(
                sym.join(D.withColumnRenamed("vid", "src"), "src", "left_semi")
                .join(D.withColumnRenamed("vid", "dst"), "dst", "left_anti")
                .join(
                    labels.select(F.col("vid").alias("dst"), F.col("label").alias("_fl")),
                    "dst",
                )
                .groupBy("src", "_fl")
                .agg(F.sum("weight").alias("weight"))
            )
            piece = connected_components(
                internal, vertices=D, already_symmetric=True
            ).select(F.col("vid").alias("src"), F.col("label").alias("_piece"))
            inf = float("inf")
            rows_int = internal.join(piece, "src").select(
                F.col("_piece").alias("part"),
                F.col("src").alias("u"),
                F.col("dst").alias("v"),
                F.col("weight").alias("w"),
                F.lit(1.0).alias("su"),
                F.lit(1.0).alias("sv"),
                F.lit(inf).alias("mu"),
                F.lit(inf).alias("mv"),
                F.lit(True).alias("act_v"),
            )
            rows_cross = (
                cross.join(piece, "src")
                .join(csize.withColumnRenamed("label", "_fl"), "_fl")
                .select(
                    F.col("_piece").alias("part"),
                    F.col("src").alias("u"),
                    F.col("_fl").alias("v"),
                    F.col("weight").alias("w"),
                    F.lit(1.0).alias("su"),
                    F.col("_csz").cast("double").alias("sv"),
                    F.lit(inf).alias("mu"),
                    F.lit(inf).alias("mv"),
                    F.lit(False).alias("act_v"),
                )
            )
            kout = cut_lineage(
                rows_int.unionByName(rows_cross)
                .groupBy("part")
                .applyInPandas(
                    run,
                    schema="part long, vid long, label long, sim double, "
                    "new_mm double, new_size double, into long, seq long",
                )
            )
            newlab = kout.select("vid", "label")
            # expansion: a re-clustered cluster whose similarity to a
            # frozen cached cluster reaches the pruning threshold pulls
            # that cluster into the dirty set (removals shrink clusters
            # and can push cross-cluster sims back above threshold)
            nsz = newlab.groupBy("label").agg(F.count("*").alias("_nsz"))
            flagged = (
                cross.join(newlab.withColumnRenamed("vid", "src"), "src")
                .groupBy("label", "_fl")
                .agg(F.sum("weight").alias("_w"))
                .join(nsz, "label")
                .join(csize.select(F.col("label").alias("_fl"), "_csz"), "_fl")
                .filter(F.col("_w") / (F.col("_nsz") * F.col("_csz")) >= prune)
                .select(F.col("_fl").alias("label"))
                .distinct()
            )
            n_flagged = flagged.count()
            _round += 1
            if n_flagged == 0:
                break
            if _round >= 1000:
                if _cluster_bound is None:
                    _cluster_bound = int(csize.count()) + 2
                if _round >= _cluster_bound:
                    raise RuntimeError(
                        "dynamic HAC expansion exceeded the cluster-count "
                        "bound — strict-progress invariant violated"
                    )
            dirty = dirty.unionByName(flagged).distinct()

        # ---- rebuild labels ----
        singletons = D.join(newlab.select("vid"), "vid", "left_anti").select(
            "vid", F.col("vid").alias("label")
        )
        newlab_full = newlab.unionByName(singletons)
        new_labels = newlab_full.select("vid", "label", F.col("label").alias("comp"))

        # ---- rebuild dendrogram rows (participation-lag parent array,
        # same construction as terahac's builder).  Internal-id
        # assignment uses the two-phase range-partition ranking — a
        # first insert or a large cascade makes every vertex dirty, so
        # a single-partition window here would be exactly the
        # giant-component straggler this mode exists to avoid. ----
        from pyspark.sql import Window

        m = kout.filter(F.col("vid") != F.col("label")).select(
            "part", "seq", F.col("vid").alias("gone"), "into", "sim",
            F.col("label").alias("_root"),
        )
        base = self._next_internal
        m, n_new = _two_phase_rank(
            m, ["part", "seq"], _rank_partitions(self.spark), return_count=True
        )
        m = m.withColumn("pid", F.col("_rank") + F.lit(base)).drop("_rank")
        self._next_internal = base + n_new
        partic = m.select(
            F.col("gone").alias("cluster"), "part", "seq", "pid", "sim", "_root"
        ).unionByName(
            m.select(F.col("into").alias("cluster"), "part", "seq", "pid", "sim", "_root")
        )
        w_ch = Window.partitionBy("cluster").orderBy("part", "seq")
        children = partic.select(
            F.col("_root").alias("comp"),
            F.coalesce(F.lag("pid").over(w_ch), F.col("cluster")).alias("node_id"),
            F.col("pid").alias("parent_id"),
            F.col("sim").alias("merge_similarity"),
        )
        roots = (
            partic.filter(F.col("cluster") == F.col("_root"))
            .groupBy(F.col("cluster").alias("comp"))
            .agg(F.max("pid").alias("node_id"))
            .select(
                "comp", "node_id",
                F.lit(None).cast("long").alias("parent_id"),
                F.lit(None).cast("double").alias("merge_similarity"),
            )
        )
        new_dendro = children.unionByName(roots)

        dirty_c = dirty.select(F.col("label").alias("comp"))
        clean_labels = labels.join(dirty_c, "comp", "left_anti")
        clean_dendro = self.dendro.join(dirty_c, "comp", "left_anti")
        n_dirty_nodes = int(D.count())
        n_dirty_units = int(dirty.count())
        self.labels = cut_lineage(clean_labels.unionByName(new_labels))
        self.dendro = cut_lineage(clean_dendro.unionByName(new_dendro))
        self.edges = new_edge_table
        return UpdateStats(
            dirty_partitions=n_dirty_units,
            dirty_nodes=n_dirty_nodes,
            dirty_edges=delta_edges,
            nodes_ignored=0,
            expansion_rounds=_round,
        )

    def _reconcile_components(
        self,
        new_edge_table: DataFrame,
        touched: DataFrame,
        delta_edges: int,
        extra_dirty: DataFrame | None = None,
    ) -> UpdateStats:
        """Recompute components + HAC for the dirty region only."""
        # dirty old components: any component containing a touched vertex
        dirty_comps = (
            self.labels.join(touched, "vid", "left_semi").select("comp").distinct()
        )
        if extra_dirty is not None:
            dirty_comps = dirty_comps.unionByName(extra_dirty).distinct()
        dirty_comps = cut_lineage(dirty_comps)
        # dirty vertex set = members of dirty comps + brand-new vertices
        dirty_members = self.labels.join(dirty_comps, "comp", "left_semi").select("vid")
        new_verts = touched.join(self.labels.select("vid"), "vid", "left_anti")
        dirty_verts = cut_lineage(dirty_members.unionByName(new_verts).distinct())

        # dirty subgraph: edges with BOTH endpoints dirty (an edge with a
        # clean endpoint cannot exist: edges never cross components, and
        # a component touching the delta is dirty by construction)
        sub = cut_lineage(
            new_edge_table.join(
                dirty_verts.withColumnRenamed("vid", "src"), "src", "left_semi"
            ).join(dirty_verts.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        )
        n_dirty_nodes = int(dirty_verts.count())
        n_dirty_comps = int(dirty_comps.count())

        # components over the dirty subgraph
        sym = sub.unionByName(
            sub.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
        comp = connected_components(sym, vertices=dirty_verts, already_symmetric=True)

        # HAC on the dirty subgraph
        if sub.isEmpty():
            new_dendro = self.spark.createDataFrame([], _EMPTY_DENDRO)
            new_labels = comp.select(
                "vid", F.col("vid").alias("label"), F.col("label").alias("comp")
            )
        else:
            dend, labels = parhac(
                sym,
                ParHacConfig(
                    epsilon=self.epsilon, linkage_threshold=self.weight_threshold
                ),
                already_symmetric=True,
            )
            # re-key internal ids into a fresh global range (above every
            # id allocated by earlier updates; vids must stay < 2^40)
            ids = (
                dend.select("node_id")
                .unionByName(
                    dend.select(F.col("parent_id").alias("node_id")).filter(
                        F.col("parent_id").isNotNull()
                    )
                )
                .distinct()
            )
            leaf_ids = comp.select(F.col("vid").alias("node_id"))
            internal_ids = ids.join(leaf_ids, "node_id", "left_anti")
            # component-mode rebuilds can touch a vertex-scale id set, so
            # the remap rank is the two-phase range-partition one; its
            # offset pass doubles as the allocation count
            base = self._next_internal
            remap, n_remap = _two_phase_rank(
                internal_ids, ["node_id"], _rank_partitions(self.spark), return_count=True
            )
            remap = remap.withColumn("new_id", F.col("_rank") + F.lit(base)).drop("_rank")
            self._next_internal = base + n_remap
            d = (
                dend.join(remap, "node_id", "left")
                .select(
                    F.coalesce("new_id", "node_id").alias("node_id"),
                    "parent_id",
                    "merge_similarity",
                )
                .join(
                    remap.select(
                        F.col("node_id").alias("parent_id"), F.col("new_id").alias("_pn")
                    ),
                    "parent_id",
                    "left",
                )
                .select(
                    "node_id",
                    F.coalesce("_pn", "parent_id").alias("parent_id"),
                    "merge_similarity",
                )
            )
            # attach components: CC over the (remapped) child→parent
            # edges labels every dendrogram tree; each tree contains a
            # leaf, which knows its graph component
            tree2 = connected_components(
                d.filter(F.col("parent_id").isNotNull()).select(
                    F.col("node_id").alias("src"),
                    F.col("parent_id").alias("dst"),
                    F.lit(1.0).alias("weight"),
                )
            ).select(F.col("vid").alias("node_id"), F.col("label").alias("_tree"))
            tree_to_comp = (
                tree2.join(
                    comp.select(F.col("vid").alias("node_id"), F.col("label").alias("comp")),
                    "node_id",
                )
                .select("_tree", "comp")
                .distinct()
            )
            # leaves take their component directly; internal nodes take
            # their tree's component (total: every tree has a leaf, and
            # singleton roots with no merges ARE leaves)
            leafc = comp.select(F.col("vid").alias("node_id"), F.col("label").alias("_lc"))
            with_comp = (
                d.join(tree2, "node_id", "left")
                .join(tree_to_comp, "_tree", "left")
                .join(leafc, "node_id", "left")
                .select(
                    "node_id", "parent_id", "merge_similarity",
                    F.coalesce("_lc", "comp").alias("comp"),
                )
            )
            new_dendro = with_comp.select("comp", "node_id", "parent_id", "merge_similarity")
            new_labels = (
                comp.select("vid", F.col("label").alias("comp"))
                .join(labels, "vid", "left")
                .select("vid", F.coalesce("label", "vid").alias("label"), "comp")
            )

        # merge: clean state survives, dirty comps replaced
        clean_labels = self.labels.join(dirty_comps, "comp", "left_anti")
        clean_dendro = self.dendro.join(dirty_comps, "comp", "left_anti")
        self.labels = cut_lineage(clean_labels.unionByName(new_labels))
        self.dendro = cut_lineage(clean_dendro.unionByName(new_dendro))
        self.edges = new_edge_table
        return UpdateStats(
            dirty_partitions=n_dirty_comps,
            dirty_nodes=n_dirty_nodes,
            dirty_edges=delta_edges,
            nodes_ignored=0,
        )
