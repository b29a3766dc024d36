"""Benchmark harness: headline link-graph queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
plus extra keys (edges, supersteps, edges/sec-per-superstep, cpus) the
scaling harness consumes.

Methodology: ``SPARK_GRAFT_BENCH_REPEATS`` (default 3) interleaved
passes over the whole query list, per-query MEDIANS — the same
interleaved-median scheme scripts/scaling_bench.py uses, because host
noise between two back-to-back runs of the same query has measured at
3x.  The CSR shard set is built ONCE (its cost is the separate
``csr_shard_build`` line) and shared by ``pagerank_csr_1e6`` and
``cc_csr`` so their lines measure superstep compute, not re-ingestion.

The north-rule throughput metric is edges-processed/sec per superstep:
every PageRank/CC superstep touches each edge once, so
  throughput = edges * supersteps / wall_seconds
for the iterative queries.  scripts/scaling_bench.py runs the same
operators at two parallelism levels (local[1] vs local[4], the host's
linear region) on an identical 16M-edge input — the sandbox proxy for
N vs 4N executors — and writes the scaling efficiency to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_mining_spark.checkpoint import SuperstepLedger
from graph_mining_spark.csr import materialize_csr_shards
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
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 16), app_name="bench")

    sym = bipartite_sym(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    m = sym.count()  # materialize before timing
    co = coparts_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    co.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # one-time CSR shard build, shared by both CSR queries and reported
    # as its own line
    t0 = time.monotonic()
    shards = materialize_csr_shards(sym.select("src", "dst"), partitions=max(cpus, 16))
    shard_build = round(time.monotonic() - t0, 3)

    supersteps: dict[str, int] = {}

    def q_pagerank():
        # check_every=2: two chained power iterations per Spark job
        # (documented contract-preserving batching — the graph has no
        # dangling vertices, the L1 stop is checked at batch
        # boundaries, so it converges >= as far, at most one iteration
        # later).  Supersteps = the true iteration count, not the
        # batch count.
        led = SuperstepLedger("pagerank")
        pagerank(sym, ledger=led, check_every=2).agg(F.sum("rank")).first()
        supersteps["pagerank_1e6"] = led.records[-1]["superstep"]

    def q_pagerank_csr():
        # own ledger (metrics-only, no lineage cuts): the CSR run's
        # iteration count can differ from the batched DF run's
        led = SuperstepLedger("pagerank_csr")
        pagerank_csr(sym, shards=shards, ledger=led).agg(F.sum("rank")).first()
        supersteps["pagerank_csr_1e6"] = led.records[-1]["superstep"]

    def q_cc():
        led = SuperstepLedger("cc")
        connected_components(sym, already_symmetric=True, ledger=led).agg(
            F.countDistinct("label")
        ).first()
        supersteps["cc"] = len(led.records)

    def q_cc_csr():
        # own ledger: the CSR loop's full per-round pointer jumping can
        # converge in fewer gathers than the DF variant's supersteps,
        # so copying the DF count would overstate _csr throughput
        led = SuperstepLedger("cc_csr")
        connected_components_csr(
            sym, already_symmetric=True, shards=shards, ledger=led
        ).agg(F.countDistinct("label")).first()
        supersteps["cc_csr"] = len(led.records)

    def q_label_prop():
        # two AFFINITY label-propagation rounds (best-neighbor + forest
        # CC + contraction) — the key predates the classic sync-LPA
        # operator (operators/label_propagation.py, round 5) and keeps
        # its r02-r04 meaning for cross-round comparability
        affinity_cluster(sym, AffinityConfig(num_iterations=2, edge_aggregation="sum")).agg(
            F.countDistinct("label")
        ).first()

    def q_triangles():
        triangle_counts(co).agg(F.sum("triangles")).first()

    def q_minhash():
        minhash_signatures(docs).agg(F.count("*")).first()

    plan = [
        ("pagerank_1e6", q_pagerank),
        ("pagerank_csr_1e6", q_pagerank_csr),
        ("cc", q_cc),
        ("cc_csr", q_cc_csr),
        ("label_propagation_2r", q_label_prop),
        ("triangles_coparts", q_triangles),
        ("minhash_documents", q_minhash),
    ]
    samples: dict[str, list[float]] = {name: [] for name, _ in plan}
    for _rep in range(repeats):
        for name, fn in plan:
            t0 = time.monotonic()
            fn()
            samples[name].append(time.monotonic() - t0)

    queries = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}
    queries["csr_shard_build"] = shard_build
    supersteps["label_propagation_2r"] = 2

    total = round(sum(queries.values()), 3)
    # TWO labeled throughput definitions (round-3 verdict #6 asked for
    # both so cross-round comparisons stay honest):
    #   _df  — DataFrame PageRank + CC, the unbounded-scale execution
    #          path and the definition BENCH/BASELINE.md's north-rule
    #          scaling gate uses (r02 reported this one);
    #   _csr — the CSR fast paths, superstep compute only (the shared
    #          shard build is its own line; r03 reported this one).
    # The legacy unsuffixed key equals the _df definition.
    df_steps = supersteps["pagerank_1e6"] + supersteps["cc"]
    df_wall = queries["pagerank_1e6"] + queries["cc"]
    eps_df = round(m * df_steps / df_wall, 1) if df_wall > 0 else 0.0
    csr_steps = supersteps["pagerank_csr_1e6"] + supersteps["cc_csr"]
    csr_wall = queries["pagerank_csr_1e6"] + queries["cc_csr"]
    eps_csr = round(m * csr_steps / csr_wall, 1) if csr_wall > 0 else 0.0

    shards.unpersist()
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
                "edges_per_sec_per_superstep_df": eps_df,
                "edges_per_sec_per_superstep_csr": eps_csr,
                "cpus": cpus,
                "repeats": repeats,
            }
        )
    )


if __name__ == "__main__":
    main()
