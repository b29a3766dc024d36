"""Planted-hub skew evidence (round-5 verdict item #4).

Builds a deterministic graph whose hub (dst=0) has in-degree far above
``salt_threshold``, materializes CSR shards twice — salting ENABLED
(threshold 100k → hub split over ~in_deg/100k salt buckets) vs DISABLED
(threshold above the hub degree) — and times ``gather_sum`` over each.
The salted layout spreads the hub's in-edges uniformly over the shard
files, so no gather task owns the hub's whole edge list; the unsalted
layout concentrates them in one file (one straggler task).

Usage: python scripts/skew_bench_r06.py [n_edges] [hub_share]
Writes nothing; prints a paragraph to paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import numpy as np
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_mining_spark.csr import materialize_csr_shards, gather_sum
from graph_mining_spark.session import get_spark


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    hub_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    n = 1 << 20
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app_name="skew-bench-r06")

    # deterministic hub graph: hub_share of edges point at dst=0, the
    # rest at a hashed destination; sources hashed uniformly
    e = (
        spark.range(m)
        .select(
            F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(n)).alias("src"),
            F.when(
                F.pmod(F.xxhash64("id"), F.lit(1_000_000)) < int(hub_share * 1_000_000),
                F.lit(0),
            )
            .otherwise(F.pmod(F.xxhash64(F.col("id") * 3 + 7), F.lit(n)))
            .alias("dst"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()
    hub_deg = e.filter(F.col("dst") == 0).count()
    print(f"edges={m} vertices<={n} hub_in_degree={hub_deg}")

    vals = np.random.RandomState(7).rand(n).astype(np.float64)
    results = {}
    for name, thr in [("salted(thr=100k)", 100_000), ("salt_off", 1 << 60)]:
        t0 = time.monotonic()
        shards = materialize_csr_shards(e, partitions=cpus, salt_threshold=thr)
        build = time.monotonic() - t0
        v = vals[: shards.n]
        gather_sum(shards, v)  # warm worker caches
        ts = []
        for _ in range(5):
            t0 = time.monotonic()
            out = gather_sum(shards, v)
            ts.append(time.monotonic() - t0)
        results[name] = (build, statistics.median(ts), ts, float(out.sum()))
        print(
            f"{name}: build={build:.2f}s gather median={statistics.median(ts):.3f}s "
            f"runs={[round(t,3) for t in ts]} checksum={out.sum():.6f}"
        )
        shards.unpersist()
    a, b = results["salted(thr=100k)"], results["salt_off"]
    print(
        f"\nSUMMARY: salted gather {a[1]:.3f}s vs unsalted {b[1]:.3f}s "
        f"({b[1] / a[1]:.2f}x); checksums {'MATCH' if abs(a[3]-b[3]) < 1e-6 * abs(a[3]) else 'DIFFER'}"
    )


if __name__ == "__main__":
    main()
