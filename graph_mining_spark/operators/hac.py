"""ParHac — bucketed (1+ε)-approximate hierarchical agglomerative
clustering with parent-array dendrogram output.

Parity target: /root/reference/in_memory/clustering/hac/parhac.h:40-79
(ParHacClusterer; the ParHac paper its comments reference), dendrogram format
/root/reference/in_memory/clustering/dendrogram.h:29-97, flat-cluster
extraction parhac.cc:46-150.  TeraHac (terahac.h:40-66,
arXiv:2308.03578) shares this bucketed-round shape — the trillion-edge
variant differs in running whole SUBGRAPHS per round; this operator is
the Spark-native round structure both build on.

Semantics (average linkage): cluster similarity
    sim(A, B) = W(A, B) / (|A| · |B|)
with W = summed raw inter-cluster edge weight — exactly the
DEFAULT_AVERAGE contraction the affinity CompressGraph already
implements.  Per round:

  1. W_max = max current similarity; stop when < linkage_threshold;
  2. bucket = edges with sim ≥ max(W_max / (1+ε), linkage_threshold);
  3. merge a deterministic MUTUAL-BEST matching inside the bucket
     (each cluster's best incident bucket edge by (sim desc, id asc);
     keep edges picked from both sides).  Average-linkage similarity
     of an edge is untouched by merges of DISJOINT pairs, so batch
     merging a matching equals some sequential merge order, and every
     merge is within (1+ε) of W_max at its merge time — the same
     (1+ε)²-closeness contract ParHac guarantees.  (The reference's
     inner routine is randomized, ProcessHacBucketRandomized; the
     deterministic matching keeps results reproducible and
     oracle-checkable.)
  4. each matched pair becomes a dendrogram internal node: ids are
     n, n+1, ... assigned in (sim desc, child id asc) order within a
     round — parent_id > child ids and ids < 2n−1, the parent-array
     contract (dendrogram.h:75-96).

With ε = 0 and distinct similarities the algorithm IS sequential
average-linkage HAC (each round merges exactly the argmax edge) — the
pytest oracle asserts exact merge-sequence parity there.

Scale shape: edges live distributed keyed by cluster id; each round is
one max-agg, one per-src window for best picks, a self-join for
mutuality, and one contraction groupBy — all shuffle-bounded by the
shrinking cluster graph.  The per-round matched set is cluster-count-
sized; its id assignment uses the two-phase range-partition rank
(minla._two_phase_rank), so no stage funnels a vertex-scale table
through a single task.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_mining_spark.checkpoint import cut_lineage
from graph_mining_spark.graph import remove_self_loops, symmetrize, vertex_ids
from graph_mining_spark.operators.minla import _rank_partitions, _two_phase_rank


@dataclass
class ParHacConfig:
    epsilon: float = 0.1
    # merges below this similarity never happen (reference
    # linkage_threshold / HacConfig weight_threshold)
    linkage_threshold: float = 1e-9
    max_rounds: int = 10_000


def parhac(
    edges: DataFrame,
    config: ParHacConfig | None = None,
    already_symmetric: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Run bucketed approximate HAC.  Returns ``(dendrogram, labels)``:

    dendrogram: (node_id, parent_id, merge_similarity) — one row per
    dendrogram node (leaves = original vids, internal ≥ n); parent_id
    null for roots (DendrogramNode.kNoParentId analog).
    labels: (vid, label) — flat clustering at the linkage threshold
    (each leaf's dendrogram root), label = min member vid.
    """
    cfg = config or ParHacConfig()
    if cfg.epsilon < 0:
        raise ValueError("epsilon must be >= 0")
    spark = edges.sparkSession
    sym = edges if already_symmetric else symmetrize(edges)
    verts = vertex_ids(sym)
    n = verts.agg(F.max("vid")).first()[0]
    n = int(n) + 1 if n is not None else 0

    # cluster state: edge table over cluster ids with RAW summed weight,
    # sizes (cluster id -> member count); cluster id IS its dendrogram id
    cur = cut_lineage(
        remove_self_loops(sym).groupBy("src", "dst").agg(F.sum("weight").alias("w"))
    )
    sizes = cut_lineage(verts.select(F.col("vid").alias("cid"), F.lit(1).cast("long").alias("sz")))
    # leaf -> current cluster id (for the flat labels at the end)
    leaf_of = verts.select("vid", F.col("vid").alias("cid"))
    dendro_rows: list[DataFrame] = []
    next_id = n

    for _ in range(cfg.max_rounds):
        sz_s = sizes.select(F.col("cid").alias("src"), F.col("sz").alias("_ss"))
        sz_d = sizes.select(F.col("cid").alias("dst"), F.col("sz").alias("_sd"))
        scored = cur.join(sz_s, "src").join(sz_d, "dst").withColumn(
            "sim", F.col("w") / (F.col("_ss") * F.col("_sd"))
        )
        wmax = scored.agg(F.max("sim")).first()[0]
        if wmax is None or wmax < cfg.linkage_threshold:
            break
        lo = max(wmax / (1.0 + cfg.epsilon), cfg.linkage_threshold)
        bucket = scored.filter(F.col("sim") >= lo).select("src", "dst", "sim")

        # deterministic mutual-best matching: top-1 by (sim desc, dst
        # asc) == max over (sim, -dst) — map-side-combined aggregation
        # instead of a per-src sort window
        best = (
            bucket.groupBy("src")
            .agg(F.max(F.struct(F.col("sim"), (-F.col("dst")).alias("_nd"))).alias("_b"))
            .select("src", (-F.col("_b._nd")).alias("dst"), F.col("_b.sim").alias("sim"))
        )
        rev = best.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        matched = (
            best.join(rev, ["src", "dst"], "left_semi")
            .filter(F.col("src") < F.col("dst"))
        )
        # assign internal node ids in (sim desc, src asc) order.  The
        # first rounds can match a vertex-scale set of pairs, so the
        # rank is the two-phase range-partition one (no single-partition
        # window); its offset pass doubles as the n_matched count.
        matched, n_matched = _two_phase_rank(
            matched,
            [F.col("sim").desc(), F.col("src").asc()],
            _rank_partitions(spark),
            return_count=True,
        )
        if n_matched == 0:
            break
        matched = matched.withColumn("pid", F.col("_rank") + F.lit(next_id)).drop("_rank")
        next_id += n_matched

        dendro_rows.append(
            matched.select(F.col("src").alias("node_id"), F.col("pid").alias("parent_id"), F.col("sim").alias("merge_similarity"))
            .unionByName(
                matched.select(F.col("dst").alias("node_id"), F.col("pid").alias("parent_id"), F.col("sim").alias("merge_similarity"))
            )
            # matched is lineage-cut; these projections re-read its
            # checkpointed partitions cheaply at the final union
        )

        # relabel: merged children -> parent id, everyone else unchanged
        mapping = (
            matched.select(F.col("src").alias("cid"), F.col("pid"))
            .unionByName(matched.select(F.col("dst").alias("cid"), F.col("pid")))
        )
        new_sizes = cut_lineage(
            sizes.join(mapping, "cid", "left")
            .select(F.coalesce("pid", "cid").alias("cid"), "sz")
            .groupBy("cid")
            .agg(F.sum("sz").alias("sz"))
        )
        map_s = mapping.select(F.col("cid").alias("src"), F.col("pid").alias("_ps"))
        map_d = mapping.select(F.col("cid").alias("dst"), F.col("pid").alias("_pd"))
        new_cur = cut_lineage(
            cur.join(map_s, "src", "left")
            .join(map_d, "dst", "left")
            .select(
                F.coalesce("_ps", F.col("src")).alias("src"),
                F.coalesce("_pd", F.col("dst")).alias("dst"),
                "w",
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
        leaf_of = cut_lineage(
            leaf_of.join(mapping, "cid", "left").select("vid", F.coalesce("pid", "cid").alias("cid"))
        )
        cur = new_cur
        sizes = new_sizes
        if cur.isEmpty():
            break

    if dendro_rows:
        merged_children = dendro_rows[0]
        for d in dendro_rows[1:]:
            merged_children = merged_children.unionByName(d)
    else:
        merged_children = spark.createDataFrame(
            [], "node_id long, parent_id long, merge_similarity double"
        )
    # roots: every current cluster id (leaf or internal) has no parent
    roots = sizes.select(
        F.col("cid").alias("node_id"),
        F.lit(None).cast("long").alias("parent_id"),
        F.lit(None).cast("double").alias("merge_similarity"),
    )
    dendrogram = merged_children.unionByName(roots)

    # flat labels at threshold: leaf's final cluster, canonical min vid
    canon = leaf_of.groupBy("cid").agg(F.min("vid").alias("_c"))
    labels = leaf_of.join(canon, "cid").select("vid", F.col("_c").alias("label"))
    return dendrogram, labels


def flatten_dendrogram(dendrogram: DataFrame, linkage_similarity: float) -> DataFrame:
    """FlattenClustering (dendrogram.h:147-153, dendrogram.cc:191-199):
    delete merges below ``linkage_similarity`` and take connected
    components of the remaining child→parent merge edges.  Returns
    (vid, label) over the LEAVES, label = min member leaf."""
    from graph_mining_spark.operators.connected_components import connected_components

    kept = dendrogram.filter(
        F.col("parent_id").isNotNull()
        & (F.col("merge_similarity") >= F.lit(float(linkage_similarity)))
    ).select(F.col("node_id").alias("src"), F.col("parent_id").alias("dst"), F.lit(1.0).alias("weight"))
    all_nodes = dendrogram.select(F.col("node_id").alias("vid")).distinct()
    comp = connected_components(kept, vertices=all_nodes)
    # leaves = nodes that are nobody's parent
    parents = dendrogram.select(F.col("parent_id").alias("vid")).filter(
        F.col("vid").isNotNull()
    ).distinct()
    leaves = all_nodes.join(parents, "vid", "left_anti")
    leaf_comp = comp.join(leaves, "vid", "left_semi")
    canon = leaf_comp.groupBy("label").agg(F.min("vid").alias("_c"))
    return leaf_comp.join(canon, "label").select("vid", F.col("_c").alias("label"))


def hac_merge_sequence(dendrogram: DataFrame) -> DataFrame:
    """(parent_id, merge_similarity, members…) view of internal merges —
    the comparison form the sequential oracle checks (sorted by
    parent_id, which is assignment order)."""
    return (
        dendrogram.filter(F.col("parent_id").isNotNull())
        .groupBy("parent_id")
        .agg(
            F.sort_array(F.collect_list("node_id")).alias("children"),
            F.max("merge_similarity").alias("sim"),
        )
        .orderBy("parent_id")
    )
