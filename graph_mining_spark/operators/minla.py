"""Minimum linear arrangement (minla) — iterative median/mean placement.

Parity target: /root/reference/in_memory/clustering/parline/minla.cc:
50-121 (MinimumLinearArrangement::Compute/Improve — the modified
iterative median algorithm of Harel's min_la paper: parallel location
updates, rescale to [0, n-1], convergence on cost delta),
minla_cost_metric.cc:51-145 (L1 weighted-median with interval
interpolation, L2 weighted-mean, self-weight = weighted_degree/degree),
minla.proto (cost metric, max_iterations default 20,
placement_convergence_delta).

Spark shape: locations are a vertex-sized DataFrame.  The L2 update is
one edges⋈locations join + groupBy weighted mean (pure JVM).  The L1
update needs a per-node interpolated weighted median — neighbor
(location, weight) lists are collected per node and the median kernel
runs as an Arrow-batched pandas UDF over np.argsort'ed arrays (per-node
work O(deg·log deg), no per-row Python round trips).  Nodes above
``hub_degree_threshold`` bypass the median kernel for a join-only
weighted-mean placement (no degree-sized collected rows, no straggler
task).  Rescale and the cost are single aggregates; BOTH the initial
identity placement and the final arrangement use the two-phase
range-partition ranking (no single-partition global sort anywhere).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_mining_spark.checkpoint import cut_lineage
from graph_mining_spark.graph import remove_self_loops, symmetrize

_DEFAULT_MAX_ITERATIONS = 20  # kDefaultMaxIterations, minla.cc:37


@dataclass
class MinlaConfig:
    """MinimumLinearArrangementConfig (minla.proto:19-54).

    ``hub_degree_threshold`` is a scale guard with no reference
    counterpart (the shared-memory reference holds any adjacency in
    RAM): nodes with more than this many neighbors skip the exact
    interpolated-median kernel — whose per-node neighbor list would
    otherwise land in one Arrow row / one straggler task — and place at
    the weighted MEAN of their neighbors instead (same self-segment
    folding).  The default keeps every realistic non-hub exact while
    bounding the largest collected row to ~1 MB."""

    cost_metric: str = "l1"  # or "l2"
    max_iterations: int = _DEFAULT_MAX_ITERATIONS
    placement_convergence_delta: float = 0.0
    hub_degree_threshold: int = 65536


def _two_phase_rank(
    df: DataFrame,
    order_cols: list,
    partitions: int,
    cut: bool = True,
    return_count: bool = False,
):
    """0-based global rank of ``df`` by ``order_cols`` without a
    single-partition sort: range-partition by the key, rank inside each
    partition, add broadcast per-partition count offsets.  Returns the
    input columns plus ``_rank``.  ``cut=False`` skips the lineage cut
    so the EXPLAIN audit can inspect the ranking plan itself.
    ``return_count=True`` returns ``(ranked_df, total_rows)`` — the
    total falls out of the offset pass, so callers that also need the
    row count (every dendrogram-id builder) save a count() job.
    ``order_cols`` may contain sort expressions (``F.col(c).desc()``);
    they are honored by both the range partitioner and the in-partition
    window, so the global rank follows the requested direction."""
    cols = list(df.columns)
    keyed = (
        df.repartitionByRange(partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = keyed.groupBy("_pid").count().collect()
    offs, acc = [], 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offs.append((int(row["_pid"]), int(acc)))
        acc += row["count"]
    off_df = df.sparkSession.createDataFrame(offs or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        keyed.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "_pid")
        .select(*cols, (F.col("_rn") + F.col("_off")).alias("_rank"))
    )
    if cut:
        out = cut_lineage(out)
    # the cut path has materialized through the checkpoint; the uncut
    # (plan-audit) path only needs the plan — release the cache in both
    keyed.unpersist()
    if return_count:
        return out, acc
    return out


def _rank_partitions(spark) -> int:
    """Partition count for `_two_phase_rank` call sites: the session's
    shuffle parallelism, floored so tiny test sessions still spread."""
    return max(8, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))


def weighted_median_interpolated(values, weights):
    """MinlaCostMetricL1::WeightedMedian (minla_cost_metric.cc:51-87):
    each value owns a segment of its weight; the median linearly
    interpolates the interval the half-position falls into."""
    import numpy as np

    values = np.asarray(values, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if values.size == 0:
        return 0.0
    if values.size == 1:
        return float(values[0])
    order = np.argsort(values, kind="stable")
    v = values[order]
    w = weights[order]
    interval = np.empty_like(w)
    interval[0] = w[0]
    interval[1:] = w[:-1] + w[1:]
    sums = np.cumsum(interval)
    total = sums[-1] + w[-1]
    half = total / 2.0
    i = int(np.searchsorted(sums, half, side="right"))
    if i == 0:
        return float(v[0])
    if i == len(sums):
        return float(v[-1])
    frac = (half - sums[i - 1]) / (sums[i] - sums[i - 1])
    return float((1.0 - frac) * v[i - 1] + frac * v[i])


def minla_cost(
    edges: DataFrame, locations: DataFrame, metric: str = "l1"
) -> float:
    """ComputeCostFromNodeLocations (minla_cost_metric.cc:90-96,116-122):
    Σ w·|l_u − l_v| (L1) or Σ w·(l_u − l_v)² (L2) over BOTH edge
    orientations (minla.proto: both (i,j) and (j,i) count).
    ``edges`` directed input (symmetrized internally); ``locations``:
    (vid, location)."""
    sym = remove_self_loops(symmetrize(edges))
    ls = locations.select(F.col("vid").alias("src"), F.col("location").alias("_lu"))
    ld = locations.select(F.col("vid").alias("dst"), F.col("location").alias("_lv"))
    diff = F.col("_lu") - F.col("_lv")
    term = F.col("weight") * (F.abs(diff) if metric == "l1" else diff * diff)
    out = sym.join(ls, "src").join(ld, "dst").agg(F.sum(term)).first()[0]
    return float(out or 0.0)


def minimum_linear_arrangement(
    edges: DataFrame,
    config: MinlaConfig | None = None,
    initial_order: DataFrame | None = None,
    partitions: int = 32,
) -> DataFrame:
    """Compute a linear arrangement.  Returns (vid, position) with
    positions 0..n-1 (MinimumLinearArrangement::Compute,
    minla.cc:50-66; initial location = dense rank by vid, the analog of
    the reference's identity placement over dense ids).

    ``initial_order``: optional (vid, position) seed — e.g. a parline
    embedding rank — instead of the id order.
    """
    cfg = config or MinlaConfig()
    sym = cut_lineage(remove_self_loops(symmetrize(edges))).persist()
    verts = sym.select(F.col("src").alias("vid")).distinct()

    if initial_order is not None:
        loc = cut_lineage(
            initial_order.select("vid", F.col("position").cast("double").alias("location"))
        )
    else:
        # dense rank by vid via the same two-phase range-partition
        # ranking as the final ordering — no single-partition window
        loc = _two_phase_rank(verts, ["vid"], partitions).select(
            "vid", F.col("_rank").cast("double").alias("location")
        )
    n = loc.count()
    if n <= 1:
        sym.unpersist()
        return loc.select("vid", F.col("location").cast("long").alias("position"))

    # per-node self weight: weighted_degree / degree (or 1 when isolated)
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("_d"), F.sum("weight").alias("_wd")
    )

    prev_cost = minla_cost(sym, loc, metric=cfg.cost_metric)
    for _ in range(cfg.max_iterations):
        ld = loc.select(F.col("vid").alias("dst"), F.col("location").alias("_lv"))
        nbr = sym.join(ld, "dst")
        if cfg.cost_metric == "l2":
            # weighted mean of neighbor locations, own location folded in
            # EXACTLY as the reference does (minla_cost_metric.cc:134-144:
            # numerator adds the raw own location, denominator adds
            # self_weight = Σw/deg)
            agg = nbr.groupBy(F.col("src").alias("vid")).agg(
                F.sum(F.col("weight") * F.col("_lv")).alias("_swl"),
                F.sum("weight").alias("_sw"),
            )
            new_loc = (
                loc.join(agg, "vid", "left")
                .join(deg, "vid", "left")
                .select(
                    "vid",
                    F.when(
                        F.col("_sw").isNotNull(),
                        (F.col("_swl") + F.col("location"))
                        / (F.col("_sw") + F.col("_sw") / F.col("_d")),
                    )
                    .otherwise(F.col("location"))
                    .alias("location"),
                )
            )
        else:
            # hub guard: a degree-10⁶ node would put its entire
            # adjacency into one collected row / one straggler task —
            # route nodes above the threshold to a weighted-MEAN
            # placement (self segment folded the same way), keep the
            # exact interpolated median for everything else
            degs = deg.select(F.col("vid").alias("src"), "_d", "_wd")
            nbrd = nbr.join(degs, "src")
            hub_loc = (
                nbrd.filter(F.col("_d") > cfg.hub_degree_threshold)
                .groupBy(F.col("src").alias("vid"))
                .agg(
                    F.sum(F.col("weight") * F.col("_lv")).alias("_swl"),
                    F.sum("weight").alias("_sw"),
                    F.first("_wd").alias("_hwd"),
                    F.first("_d").alias("_hd"),
                )
                .join(loc, "vid")
                .select(
                    "vid",
                    (
                        (F.col("_swl") + (F.col("_hwd") / F.col("_hd")) * F.col("location"))
                        / (F.col("_sw") + F.col("_hwd") / F.col("_hd"))
                    ).alias("location"),
                )
            )
            lists = (
                nbrd.filter(F.col("_d") <= cfg.hub_degree_threshold)
                .groupBy(F.col("src").alias("vid"))
                .agg(
                    F.collect_list(F.col("_lv")).alias("_vals"),
                    F.collect_list(F.col("weight")).alias("_ws"),
                )
            )

            def med(batches):
                import pandas as pd

                for pdf in batches:
                    out = []
                    for vid, vals, ws, own, d, wd in zip(
                        pdf["vid"], pdf["_vals"], pdf["_ws"], pdf["location"],
                        pdf["_d"], pdf["_wd"],
                    ):
                        vals = list(vals) + [float(own)]
                        self_w = (float(wd) / float(d)) if d and d > 0 else 1.0
                        ws = list(ws) + [self_w]
                        out.append((int(vid), weighted_median_interpolated(vals, ws)))
                    yield pd.DataFrame(out, columns=["vid", "location"])

            joined = loc.join(lists, "vid", "left").join(deg, "vid", "left")
            with_n = joined.filter(F.col("_vals").isNotNull())
            # isolated nodes (no sym edges ⇒ no deg row) keep their
            # location; hub nodes (_d > threshold) come from hub_loc
            without = joined.filter(
                F.col("_vals").isNull()
                & (F.col("_d").isNull() | (F.col("_d") <= cfg.hub_degree_threshold))
            ).select("vid", "location")
            new_loc = (
                with_n.select("vid", "location", "_vals", "_ws", "_d", "_wd")
                .mapInPandas(med, schema="vid long, location double")
                .unionByName(without)
                .unionByName(hub_loc)
            )

        # rescale to [0, n-1] (minla.cc:98-107)
        mm = new_loc.agg(
            F.min("location").alias("lo"), F.max("location").alias("hi")
        ).first()
        lo, hi = float(mm["lo"]), float(mm["hi"])
        if hi <= lo:
            raise RuntimeError("all minla locations collapsed to a single point")
        scale = (n - 1) / (hi - lo)
        new_loc = cut_lineage(
            new_loc.select("vid", ((F.col("location") - lo) * scale).alias("location"))
        )
        cost = minla_cost(sym, new_loc, metric=cfg.cost_metric)
        delta = abs(cost - prev_cost)
        prev_cost = cost
        loc = new_loc
        if delta <= cfg.placement_convergence_delta:
            break

    # final integer positions: deterministic (location, vid) order via
    # the two-phase range-partition ranking
    out = _two_phase_rank(loc, ["location", "vid"], partitions).select(
        "vid", F.col("_rank").alias("position")
    )
    sym.unpersist()
    return out
