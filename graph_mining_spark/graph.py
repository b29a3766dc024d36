"""Edge-table graph model and build operators.

The whole data model is two DataFrames (SURVEY.md §1.4):

  edges    : (src: long, dst: long, weight: double)
  vertices : (vid: long, ...attrs)

Build semantics mirror the reference:
  - parallel-edge dedup keeps the MAX weight
    (reference: in_memory/clustering/graph.h:78-82)
  - directed → undirected conversion unions reciprocal edges and then
    resolves asymmetric duplicates by a configurable aggregation
    MAX/MIN/SUM/AVG (reference: undirected_converter_graph.cc:55-168,
    undirected_converter_graph.proto:26-35)
  - degree-capping sparsification keeps per-node top-k by
    (weight desc, id asc), with a SOFT rule (keep if either endpoint
    keeps) or HARD rule (both endpoints)
    (reference: undirected_converter_graph.cc:197-295)

All operators are pure DataFrame expressions — Catalyst handles
pushdown/pruning; the groupBy aggregations get map-side combine for
free, which is what bounds skew for associative aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "weight")


def as_edges(df: DataFrame, src: str = "src", dst: str = "dst", weight: str | None = "weight") -> DataFrame:
    """Normalize column names / types to the canonical edge schema."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    return df.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        w.alias("weight"),
    )


def dedup_edges(edges: DataFrame, agg: str = "max") -> DataFrame:
    """Collapse parallel edges.  Default keeps MAX weight
    (reference graph.h:78-82: AddEdge dedups parallel edges keeping max).
    """
    fn = {"max": F.max, "min": F.min, "sum": F.sum, "avg": F.avg}[agg]
    return edges.groupBy("src", "dst").agg(fn("weight").alias("weight"))


def remove_self_loops(edges: DataFrame) -> DataFrame:
    return edges.filter(F.col("src") != F.col("dst"))


def symmetrize(edges: DataFrame, agg: str = "max", keep_self_loops: bool = False) -> DataFrame:
    """Directed → undirected: union reciprocal edges, resolve duplicates.

    Mirrors UndirectedConverterGraph (undirected_converter_graph.cc:55-168)
    with asymmetric-edge treatment MAX/MIN/SUM/AVG/REMOVE
    (undirected_converter_graph.proto:26-35).  ``agg="remove"`` keeps
    only edges present in BOTH orientations (max weight of the two).
    Result contains BOTH orientations of every undirected edge (the
    canonical storage form for per-src windows and per-dst aggregations
    without re-shuffling).
    """
    e = edges if keep_self_loops else remove_self_loops(edges)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    if agg == "remove":
        kept = e.join(rev.select("src", "dst"), ["src", "dst"], "left_semi")
        return symmetrize(kept, agg="max", keep_self_loops=True)
    return dedup_edges(e.unionByName(rev), agg=agg)


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """One row per undirected edge with src < dst (for triangle counting
    and global edge counts)."""
    return dedup_edges(
        remove_self_loops(edges).select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ),
        agg="max",
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex out-degree and weighted out-degree over the edge table
    as stored (call on the symmetrized table for undirected degree)."""
    return edges.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("degree"),
        F.sum("weight").alias("weighted_degree"),
    )


def vertex_ids(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing at either endpoint."""
    return (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )


def sparsify_top_k(edges: DataFrame, k: int, soft: bool = True) -> DataFrame:
    """Degree-capping sparsification — the reference's high-degree/skew
    control (undirected_converter_graph.cc:197-295).

    Per node keep the top-``k`` incident edges ranked by
    (weight desc, neighbor id asc).  SOFT keeps an undirected edge if
    EITHER endpoint ranked it in its top-k; HARD requires BOTH.
    Input must be the symmetrized (both-orientations) table; output is
    symmetrized too.
    """
    w = Window.partitionBy("src").orderBy(F.col("weight").desc(), F.col("dst").asc())
    ranked = edges.withColumn("_r", F.row_number().over(w))
    kept = ranked.filter(F.col("_r") <= k).drop("_r")
    mirror = kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight").alias("_mw"))
    if soft:
        # either endpoint keeps it → union with mirrored keeps, dedup
        out = dedup_edges(kept.unionByName(mirror.withColumnRenamed("_mw", "weight")), agg="max")
    else:
        # both endpoints must keep it → semi-join with the mirror
        out = kept.join(mirror, on=["src", "dst"], how="left_semi")
    return out


def validate_edges(edges: DataFrame) -> None:
    """Cheap invariant checks (GraphExpectations analog,
    reference in_memory/graph_expectations.proto:6-24)."""
    bad = edges.filter(
        F.col("src").isNull() | F.col("dst").isNull() | F.col("weight").isNull() | F.isnan("weight") | (F.col("weight") < 0)
    ).limit(1)
    if bad.count() > 0:
        raise ValueError("edge table violates expectations (null/NaN/negative weight)")
