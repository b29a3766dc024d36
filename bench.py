"""Benchmark harness: headline link-graph queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
plus extra keys (edges, supersteps, edges/sec-per-superstep, cpus) the
scaling harness consumes.

The north-rule throughput metric is edges-processed/sec per superstep:
every PageRank/CC superstep touches each edge once, so
  throughput = edges * supersteps / wall_seconds
for the iterative queries.  scripts/scaling_bench.py runs this file at
two parallelism levels (local[8] vs local[32]) on identical input —
the sandbox proxy for N vs 4N executors — and writes the scaling
efficiency to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_mining_spark.checkpoint import SuperstepLedger
from graph_mining_spark.functions.dedup import minhash_signatures
from graph_mining_spark.operators.affinity import AffinityConfig, affinity_cluster
from graph_mining_spark.operators.connected_components import (
    connected_components,
    connected_components_csr,
)
from graph_mining_spark.operators.pagerank import pagerank, pagerank_csr
from graph_mining_spark.operators.triangles import triangle_counts
from graph_mining_spark.session import get_spark
from graph_mining_spark.tpch_graph import bipartite_sym, coparts_edges


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 16), app_name="bench")

    sym = bipartite_sym(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    m = sym.count()  # materialize before timing

    queries: dict[str, float] = {}
    supersteps: dict[str, int] = {}

    t0 = time.monotonic()
    led = SuperstepLedger("pagerank")
    pagerank(sym, ledger=led).agg(F.sum("rank")).first()
    queries["pagerank_1e6"] = round(time.monotonic() - t0, 3)
    supersteps["pagerank_1e6"] = len(led.records)

    t0 = time.monotonic()
    pagerank_csr(sym, partitions=max(cpus, 16)).agg(F.sum("rank")).first()
    queries["pagerank_csr_1e6"] = round(time.monotonic() - t0, 3)
    # same convergence contract + input ⇒ same superstep count
    supersteps["pagerank_csr_1e6"] = supersteps["pagerank_1e6"]

    t0 = time.monotonic()
    led = SuperstepLedger("cc")
    connected_components(sym, already_symmetric=True, ledger=led).agg(F.countDistinct("label")).first()
    queries["cc"] = round(time.monotonic() - t0, 3)
    supersteps["cc"] = len(led.records)

    t0 = time.monotonic()
    connected_components_csr(sym, already_symmetric=True, partitions=max(cpus, 16)).agg(
        F.countDistinct("label")
    ).first()
    queries["cc_csr"] = round(time.monotonic() - t0, 3)
    supersteps["cc_csr"] = supersteps["cc"]

    t0 = time.monotonic()
    affinity_cluster(sym, AffinityConfig(num_iterations=2, edge_aggregation="sum")).agg(
        F.countDistinct("label")
    ).first()
    queries["label_propagation_2r"] = round(time.monotonic() - t0, 3)
    supersteps["label_propagation_2r"] = 2

    co = coparts_edges(spark, sf_dir)
    t0 = time.monotonic()
    triangle_counts(co).agg(F.sum("triangles")).first()
    queries["triangles_coparts"] = round(time.monotonic() - t0, 3)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.monotonic()
    minhash_signatures(docs).agg(F.count("*")).first()
    queries["minhash_documents"] = round(time.monotonic() - t0, 3)

    total = round(sum(queries.values()), 3)
    # north-rule throughput: CSR PageRank + CSR CC (the fast paths)
    iter_steps = supersteps["pagerank_csr_1e6"] + supersteps["cc_csr"]
    iter_wall = queries["pagerank_csr_1e6"] + queries["cc_csr"]
    eps_per_superstep = round(m * iter_steps / iter_wall, 1) if iter_wall > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "headline_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "edges": m,
                "supersteps": supersteps,
                "edges_per_sec_per_superstep": eps_per_superstep,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
