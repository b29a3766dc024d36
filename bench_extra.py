"""Extra benchmarks + per-job profiling (guide §1.4/§1.5) — NOT the
driver's frozen bench.py.

Runs the same headline queries once each with the Spark event log
enabled, then parses the log to attribute wall time to Spark jobs vs
driver-side gaps (planning / broadcast build / Python).  Usage:

    python bench_extra.py [sf_dir] [query ...]

Prints one block per query: total wall, job count, sum of job wall,
top jobs by duration with their descriptions/callsites.
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

EVDIR = "/tmp/spark-events-bench-extra"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    only = set(sys.argv[2:])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        cpus=cpus,
        shuffle_partitions=max(cpus, 16),
        app_name="bench-extra",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext

    sym = bipartite_sym(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    co = coparts_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    co.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    shards = None

    def q_csr_build():
        nonlocal shards
        shards = materialize_csr_shards(sym.select("src", "dst"), partitions=max(cpus, 16))

    def q_pagerank():
        led = SuperstepLedger("pagerank")
        pagerank(sym, ledger=led, check_every=2).agg(F.sum("rank")).first()

    def q_pagerank_csr():
        led = SuperstepLedger("pagerank_csr")
        pagerank_csr(sym, shards=shards, ledger=led).agg(F.sum("rank")).first()

    def q_cc():
        led = SuperstepLedger("cc")
        connected_components(sym, already_symmetric=True, ledger=led).agg(
            F.countDistinct("label")
        ).first()

    def q_cc_csr():
        led = SuperstepLedger("cc_csr")
        connected_components_csr(sym, already_symmetric=True, shards=shards, ledger=led).agg(
            F.countDistinct("label")
        ).first()

    def q_label_prop():
        affinity_cluster(sym, AffinityConfig(num_iterations=2, edge_aggregation="sum")).agg(
            F.countDistinct("label")
        ).first()

    def q_triangles():
        triangle_counts(co).agg(F.sum("triangles")).first()

    def q_minhash():
        minhash_signatures(docs).agg(F.count("*")).first()

    plan = [
        ("csr_shard_build", q_csr_build),
        ("pagerank_1e6", q_pagerank),
        ("pagerank_csr_1e6", q_pagerank_csr),
        ("cc", q_cc),
        ("cc_csr", q_cc_csr),
        ("label_propagation_2r", q_label_prop),
        ("triangles_coparts", q_triangles),
        ("minhash_documents", q_minhash),
    ]
    windows = []
    for name, fn in plan:
        if only and name not in only:
            continue
        sc.setJobDescription(name)
        t0 = time.time()
        fn()
        t1 = time.time()
        sc.setJobDescription(None)
        windows.append((name, t0, t1))
        print(f"== {name}: {t1 - t0:.3f}s", flush=True)

    app_id = sc.applicationId
    spark.stop()

    # parse event log (Spark 4 writes a rolling-log dir eventlog_v2_<app>)
    import glob

    cand = [os.path.join(EVDIR, app_id)] + sorted(
        glob.glob(os.path.join(EVDIR, f"eventlog_v2_{app_id}", "events_*"))
    )
    lines = []
    for p in cand:
        if os.path.isfile(p):
            with open(p) as f:
                lines.extend(f.readlines())
    jobs = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"] / 1000.0,
                    "desc": (ev.get("Properties") or {}).get("spark.job.description", ""),
                    "stages": len(ev.get("Stage IDs", [])),
                    "tasks": sum(
                        s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])
                    ),
                }
            elif k == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"] / 1000.0

    for name, t0, t1 in windows:
        js = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if "end" in j and j["start"] >= t0 - 0.05 and j["end"] <= t1 + 0.05
        ]
        tot_job = sum(j["end"] - j["start"] for _, j in js)
        print(f"\n### {name}: wall={t1 - t0:.3f}s jobs={len(js)} sum_job_wall={tot_job:.3f}s "
              f"driver_gap={t1 - t0 - tot_job:.3f}s")
        js_sorted = sorted(js, key=lambda kv: kv[1]["end"] - kv[1]["start"], reverse=True)
        for jid, j in js_sorted[:12]:
            print(f"  job {jid}: {j['end'] - j['start']:.3f}s stages={j['stages']} "
                  f"tasks={j['tasks']} desc={j['desc'][:60]}")


if __name__ == "__main__":
    main()
