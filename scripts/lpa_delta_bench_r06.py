"""LPA delta-path win measurement (round-5 verdict item #6).

Fixture: a heavy fast-converging core (50 disjoint K200 cliques, ~2M
directed edge rows) plus a 500-vertex path fringe whose min-label flow
keeps a SMALL frontier churning for many rounds.  From round ~3 the
cliques are settled, so the delta gate (changed ≤ broadcast_threshold
AND changed*8 ≤ n) engages and late rounds shuffle only the fringe's
incident votes instead of all ~2M edge rows.

Runs the same fixture with the delta path enabled (default) and
disabled (broadcast_threshold=0) and prints per-round walls from the
SuperstepLedger.  Paste the summary into BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_mining_spark.checkpoint import SuperstepLedger
from graph_mining_spark.operators.label_propagation import label_propagation
from graph_mining_spark.session import get_spark

CLIQUES = 50
K = 200
PATH = 500


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app_name="lpa-delta-r06")
    n_core = CLIQUES * K

    ids = spark.range(n_core).select(F.col("id").alias("a"), (F.col("id") / K).cast("long").alias("c"))
    b = ids.select(F.col("a").alias("b"), F.col("c").alias("c2"))
    cliq = (
        ids.join(b, (F.col("c") == F.col("c2")) & (F.col("a") != F.col("b")))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight"))
    )
    p = spark.range(PATH - 1).select((F.col("id") + n_core).alias("src"), (F.col("id") + n_core + 1).alias("dst"))
    path = p.unionByName(p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).select(
        "src", "dst", F.lit(1.0).alias("weight")
    )
    edges = cliq.unionByName(path).persist(StorageLevel.MEMORY_AND_DISK)
    m = edges.count()
    print(f"fixture: n={n_core + PATH} directed_edge_rows={m}")

    for name, thr in [("delta_on", 131_072), ("delta_off", 0)]:
        led = SuperstepLedger(f"lpa_{name}")
        out = label_propagation(
            edges,
            max_iterations=12,
            already_symmetric=True,
            broadcast_threshold=thr,
            # force the delta machinery for the A/B — the production
            # default (delta_min_edges=8M) gates it OFF at this scale,
            # which is exactly what this measurement justified
            delta_min_edges=0,
            ledger=led,
        )
        k = out.select("label").distinct().count()
        walls = [(r["superstep"], round(r["wall_s"], 3), r["n_active"]) for r in led.records]
        total = round(sum(w for _, w, _ in walls), 2)
        print(f"{name}: clusters={k} total={total}s rounds(superstep, wall_s, changed)={walls}")


if __name__ == "__main__":
    main()
