"""Full-TeraHac end-to-end wall/round table (round-5 verdict item #5).

Runs the whole operator (partition -> kernel -> contract rounds) on the
sf0.1 bipartite graph (~1.17M directed edge rows) and prints a
per-round table: wall, merges.  Round boundaries are taken from the
operator's one affinity-partition call per round (timestamped via a
thin wrapper), merges per round from the returned merge_log.

Usage: python scripts/terahac_bench_r06.py [sf_dir] [threshold] [epsilon] [part_cap]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

th = importlib.import_module("graph_mining_spark.operators.terahac")
from graph_mining_spark.session import get_spark
from graph_mining_spark.tpch_graph import bipartite_sym


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    eps = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app_name="terahac-bench-r06")

    sym = bipartite_sym(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    m = sym.count()

    stamps: list[float] = []
    real_affinity = th.affinity_cluster

    def stamped(*a, **k):
        stamps.append(time.monotonic())
        return real_affinity(*a, **k)

    th.affinity_cluster = stamped
    try:
        t0 = time.monotonic()
        labels, mlog = th.terahac(
            sym,
            th.TeraHacConfig(epsilon=eps, linkage_threshold=thr, partition_max=cap),
            already_symmetric=True,
        )
        k = labels.select("label").distinct().count()
        t1 = time.monotonic()
    finally:
        th.affinity_cluster = real_affinity

    per_round = {
        int(r["round"]): int(r["c"])
        for r in mlog.groupBy("round").agg(F.count("*").alias("c")).collect()
    }
    stamps.append(t1)
    print(f"edges={m} threshold={thr} eps={eps} part_cap={cap} clusters={k} "
          f"rounds={len(stamps) - 1} total={t1 - t0:.2f}s (first-round start offset "
          f"{stamps[0] - t0:.2f}s = scoring/active setup)")
    for i in range(len(stamps) - 1):
        print(f"  round {i}: wall={stamps[i + 1] - stamps[i]:.2f}s "
              f"merges={per_round.get(i, 0)}")


if __name__ == "__main__":
    main()
