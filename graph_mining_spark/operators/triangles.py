"""Per-vertex (and global) triangle counting via degree ordering.

Reference algorithm: gbbs Triangle_degree_ordering (Shun–Tangwongsan'15)
— rank vertices by (degree, id), direct every undirected edge from the
lower- to the higher-ranked endpoint, count each triangle exactly once
at its lowest-ranked corner by intersecting directed adjacency sets
(/root/reference/in_memory/clustering/triangle_counting/
parallel_triangle_counting.cc:29-46, graph_utils.h:36-50).  The
reference returns only the GLOBAL count
(parallel_triangle_counting.h:31-32); the north rule extends it to
per-vertex counts, crediting each triangle to all three corners.

Spark shape: degree ordering bounds the directed out-degree by
O(sqrt(m)) amortized (arboricity argument), which is exactly the skew
control that makes the wedge self-join feasible on power-law graphs —
no hub vertex ever fans out its full degree.  The closing-edge match is
an equi-join on the (v, w) pair, which Catalyst executes as a shuffled
hash/sort-merge join with AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_mining_spark.checkpoint import cut_lineage
from graph_mining_spark.graph import canonical_undirected, degrees, symmetrize, vertex_ids


def _directed_by_degree(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge low→high by (degree, vid) rank.

    Returns ``(u, v, deg_v)`` — deg_v is carried so wedge endpoints can
    be rank-compared without another join.

    The canonical table is built directly from the input —
    ``canonical_undirected(symmetrize(e)) ≡ canonical_undirected(e)``
    (both orientations of an edge map to the same (least, greatest) pair
    and both paths max-dedup), so the old intermediate symmetrize paid a
    full 2m-row shuffle + aggregation for nothing; undirected degrees
    come off the canonical table's two endpoint columns instead.

    ``und`` is PERSISTED (not checkpointed): a localCheckpoint here
    replaces the subtree with a stats-less RDD scan, which demotes the
    degree-attach joins from broadcast to sort-merge (measured 2x
    slower); the persist keeps the aggregation's size estimate visible
    to the planner while still computing the canonical table once.  The
    caller (triangle_list) releases it as soon as the oriented table is
    checkpointed.
    """
    und = canonical_undirected(edges).select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    deg = (
        und.select(F.col("src").alias("vid"))
        .unionAll(und.select(F.col("dst").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("degree"))
    )
    e2 = (
        und.join(deg.select(F.col("vid").alias("src"), F.col("degree").alias("_da")), "src")
        .join(deg.select(F.col("vid").alias("dst"), F.col("degree").alias("_db")), "dst")
    )
    src_first = (F.col("_da") < F.col("_db")) | ((F.col("_da") == F.col("_db")) & (F.col("src") < F.col("dst")))
    oriented = e2.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(src_first, F.col("_db")).otherwise(F.col("_da")).alias("deg_v"),
    )
    return oriented, und


def triangle_list(edges: DataFrame) -> DataFrame:
    """All triangles, one row each, as ``(u, v, w)`` with u ≺ v ≺ w in
    (degree, vid) rank order."""
    # cut_lineage (persist → localCheckpoint → unpersist) instead of a
    # bare persist: the oriented table is read three times below, but a
    # plain persist would stay pinned forever — no caller action point
    # exists to release it (triangle_counts returns a lazy plan), and
    # a driver looping over many graphs would leak one cache entry per
    # call, evicting the caches iterative operators rely on
    oriented, und = _directed_by_degree(edges)
    d = cut_lineage(oriented)
    und.unpersist()  # d is checkpointed; the canonical cache is done
    x = d.select(F.col("u"), F.col("v").alias("v"), F.col("deg_v").alias("_dv"))
    y = d.select(F.col("u"), F.col("v").alias("w"), F.col("deg_v").alias("_dw"))
    rank_lt = (F.col("_dv") < F.col("_dw")) | ((F.col("_dv") == F.col("_dw")) & (F.col("v") < F.col("w")))
    wedges = x.join(y, "u").filter(rank_lt).select("u", "v", "w")
    closing = d.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["v", "w"], "inner").select("u", "v", "w")
    return tri


def triangle_counts(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """Per-vertex exact triangle counts ``(vid, triangles)``; every
    vertex appears (0 for triangle-free vertices)."""
    tri = triangle_list(edges)
    # ONE pass over the triangle join: the previous 3-way unionAll of
    # tri.select(u)/(v)/(w) duplicated the whole wedge+closing join
    # subtree three times in the plan (Spark has no common-subtree
    # elimination across union branches), so the most expensive join in
    # the operator executed three times per run
    corners = tri.select(F.explode(F.array("u", "v", "w")).alias("vid"))
    counts = corners.groupBy("vid").agg(F.count("*").alias("triangles"))
    verts = vertex_ids(edges) if vertices is None else vertices.select(F.col("vid").cast("long")).distinct()
    return verts.join(counts, "vid", "left").select(
        "vid", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def global_triangle_count(edges: DataFrame) -> int:
    """Reference-parity global count (parallel_triangle_counting.h:31-32)."""
    return triangle_list(edges).count()
