"""Two-cluster-size scaling evidence (north rule).

A real N vs 4N executor comparison needs a cluster; the sandbox proxy
(BASELINE.md) is the SAME job at local[8] vs local[32] on identical
deterministic input.  Each level runs in a fresh JVM (subprocess) so
nothing is shared.  Throughput metric = edges-processed/sec per
superstep; efficiency = (thr_4N / thr_N) / 4.

The input is sized so the vectorized kernels dominate scheduling
overhead (a 2^19-vertex, 8M-edge seeded hash graph with a planted
high-degree hub to exercise salted skew splitting) — at bench sf0.1
scale the per-superstep fixed costs (~0.3-0.5 s) would swamp the
4x-core signal and measure Spark's scheduler, not the engine.

Usage:
  python scripts/scaling_bench.py                # orchestrates both levels, writes BENCH/BASELINE.md
  python scripts/scaling_bench.py --worker 8     # one level, prints one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_VERT = 1 << 19
M_EDGES = 8_000_000
PR_ITERS = 10
SALT_THRESHOLD = 4096


def worker(cpus: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from graph_mining_spark.operators.connected_components import connected_components_csr
    from graph_mining_spark.operators.pagerank import pagerank, pagerank_csr
    from graph_mining_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=cpus, app_name=f"scaling-{cpus}")

    # deterministic seeded hash graph + planted hub at vertex 0
    e = (
        spark.range(M_EDGES)
        .select(
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(N_VERT)).alias("src"),
            F.when(F.col("id") % 1000 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(N_VERT)))
            .alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .withColumn("weight", F.lit(1.0))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m = e.count()

    res: dict = {"cpus": cpus, "edges": m, "queries": {}, "supersteps": {}}

    t0 = time.monotonic()
    pagerank_csr(
        e, max_iterations=PR_ITERS, partitions=cpus, salt_threshold=SALT_THRESHOLD
    ).agg(F.sum("rank")).first()
    res["queries"]["pagerank_csr_10it"] = round(time.monotonic() - t0, 3)
    res["supersteps"]["pagerank_csr_10it"] = PR_ITERS

    t0 = time.monotonic()
    labels = connected_components_csr(
        e, partitions=cpus, salt_threshold=SALT_THRESHOLD, max_supersteps=30
    )
    labels.agg(F.countDistinct("label")).first()
    cc_wall = round(time.monotonic() - t0, 3)
    res["queries"]["cc_csr"] = cc_wall
    res["supersteps"]["cc_csr"] = 4  # converges in ~3-4 outer supersteps on this graph

    t0 = time.monotonic()
    pagerank(e, max_iterations=3).agg(F.sum("rank")).first()
    res["queries"]["pagerank_df_3it"] = round(time.monotonic() - t0, 3)
    res["supersteps"]["pagerank_df_3it"] = 3

    total_steps = sum(res["supersteps"].values())
    total_wall = sum(res["queries"].values())
    res["edges_per_sec_per_superstep"] = round(m * total_steps / total_wall, 1)
    print("SCALING_JSON " + json.dumps(res))


def orchestrate() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.join(here, "scaling_bench.py"), "--worker", str(cpus)],
            capture_output=True, text=True, timeout=3600, check=False,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("SCALING_JSON ")]
        if not line:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise RuntimeError(f"worker cpus={cpus} produced no result")
        results[cpus] = json.loads(line[-1][len("SCALING_JSON "):])
        print(f"local[{cpus}]: {results[cpus]}")

    thr8 = results[8]["edges_per_sec_per_superstep"]
    thr32 = results[32]["edges_per_sec_per_superstep"]
    eff = thr32 / thr8 / 4.0
    per_q = {}
    for qname in results[8]["queries"]:
        s8, s32 = results[8]["queries"][qname], results[32]["queries"][qname]
        per_q[qname] = (s8, s32, round(s8 / s32 / 4.0, 3))

    md = [
        "# BENCH / BASELINE — two-cluster-size scaling evidence",
        "",
        "North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.",
        "Sandbox proxy (no real cluster available): the SAME job at `local[8]` (N)",
        "vs `local[32]` (4N) in fresh JVMs on identical deterministic input",
        f"(seeded hash graph, {N_VERT} vertices, ~{M_EDGES / 1e6:.0f}M directed edges,",
        f"planted hub at vertex 0, salted CSR shards with salt_threshold={SALT_THRESHOLD}).",
        "",
        "| query | local[8] s | local[32] s | speedup/4 (efficiency) |",
        "|---|---|---|---|",
    ]
    for qname, (s8, s32, e) in per_q.items():
        md.append(f"| {qname} | {s8} | {s32} | {e} |")
    md += [
        "",
        f"**Aggregate throughput** (edges-processed/sec per superstep over all",
        f"supersteps): local[8] = {thr8:,.0f}, local[32] = {thr32:,.0f} →",
        f"**scaling efficiency = {eff:.3f}** (target ≥ 0.8).",
        "",
        f"Edge counts: {results[8]['edges']:,} (identical at both levels).",
        "Raw JSON:",
        "```json",
        json.dumps(results, indent=2),
        "```",
        "",
    ]
    out_path = os.path.join(os.path.dirname(here), "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {out_path}; efficiency={eff:.3f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        orchestrate()
