"""Pairwise neighbor-set similarity.

Parity: /root/reference/in_memory/pairwise_similarity/
pairwise_similarity.h:25-80 (metrics COMMON / JACCARD / COSINE / TOTAL
over neighbor sets, pairwise_similarity.proto:21-29).  The Spark shape
is the classic inverted-index self-join: explode neighbor lists, join
on the shared neighbor, groupBy the pair — co-occurrence counting with
map-side combine, the same skeleton as the n-gram Jaccard dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_mining_spark.graph import remove_self_loops, symmetrize


def pairwise_similarity(
    edges: DataFrame,
    metric: str = "jaccard",
    already_symmetric: bool = False,
    round_to: int | None = 6,
) -> DataFrame:
    """Similarity for every vertex pair (a < b) sharing ≥1 neighbor.

    Returns (a, b, similarity).  Metrics over unweighted neighbor sets
    N(·):  common = |N(a)∩N(b)|; jaccard = common/|N(a)∪N(b)|;
    cosine = common/sqrt(|N(a)||N(b)|); total = |N(a)|+|N(b)|.
    """
    sym = edges if already_symmetric else symmetrize(edges)
    nbr = remove_self_loops(sym).select("src", "dst").distinct()
    deg = nbr.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("d"))
    x = nbr.select(F.col("dst").alias("n"), F.col("src").alias("a"))
    y = nbr.select(F.col("dst").alias("n"), F.col("src").alias("b"))
    common = (
        x.join(y, "n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("_c"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("_db"))
    j = common.join(da, "a").join(db, "b")
    metric = metric.lower()
    if metric == "common":
        sim = F.col("_c").cast("double")
    elif metric == "jaccard":
        sim = F.col("_c") / (F.col("_da") + F.col("_db") - F.col("_c"))
    elif metric == "cosine":
        sim = F.col("_c") / F.sqrt(F.col("_da") * F.col("_db"))
    elif metric == "total":
        sim = (F.col("_da") + F.col("_db")).cast("double")
    else:
        raise ValueError(f"unknown metric {metric}")
    if round_to is not None:
        sim = F.round(sim, round_to)
    return j.select("a", "b", sim.alias("similarity"))
