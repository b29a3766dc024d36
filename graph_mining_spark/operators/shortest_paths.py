"""Single-source shortest paths.

Parity: /root/reference/in_memory/shortest_paths/dijkstra.h:24-141 —
sequential heap Dijkstra that rejects negative weights.  A binary heap
does not distribute; the cluster formulation with identical results on
nonnegative weights is frontier-based iterative relaxation
(Bellman-Ford supersteps == parallel delta relaxation):

  dist[v] ← min(dist[v], min_{(u,v,w)∈E, u in frontier} dist[u] + w)

Only last round's improved vertices join against the edge table (the
same delta trick as connected components), so late supersteps touch a
shrinking frontier.  Converges in ≤ n supersteps; on weighted graphs
with small hop diameter, far fewer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_mining_spark.checkpoint import SuperstepLedger, cut_lineage


def sssp(
    edges: DataFrame,
    source_vid: int,
    max_supersteps: int = 10_000,
    ledger: SuperstepLedger | None = None,
) -> DataFrame:
    """Distances over DIRECTED nonnegative-weight edges (pass the
    symmetrized table for undirected).  Returns ``(vid, distance)`` for
    REACHABLE vertices only (Dijkstra's contract: unreachable = absent).
    Raises on negative weights (dijkstra.h rejects them too).
    """
    neg = edges.filter(F.col("weight") < 0).limit(1)
    if neg.count() > 0:
        raise ValueError("sssp requires nonnegative edge weights")

    e = edges.select("src", "dst", "weight").repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    spark = edges.sparkSession
    dist = spark.createDataFrame([(int(source_vid), 0.0)], "vid long, distance double")
    dist = cut_lineage(dist)
    frontier = dist

    step = 0
    while step < max_supersteps:
        step += 1
        cand = (
            e.join(frontier.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"), (F.col("distance") + F.col("weight")).alias("_d"))
            .groupBy("vid")
            .agg(F.min("_d").alias("_d"))
        )
        merged = (
            dist.join(cand, "vid", "full")
            .select(
                "vid",
                F.least(
                    F.coalesce("distance", F.lit(float("inf"))),
                    F.coalesce("_d", F.lit(float("inf"))),
                ).alias("distance"),
                (
                    F.col("distance").isNull()
                    | (F.coalesce("_d", F.lit(float("inf"))) < F.col("distance"))
                ).alias("_improved"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_improved = merged.filter("_improved").count()
        if ledger is not None:
            state = ledger.record(step, merged, metric=float(n_improved), n_active=n_improved)
        else:
            state = cut_lineage(merged)
        merged.unpersist()
        frontier = state.filter("_improved").select("vid", "distance")
        dist = state.select("vid", "distance")
        if n_improved == 0:
            break

    e.unpersist()
    return dist
