"""Tests for the §2 inventory completions: REMOVE symmetrize,
bounded-average linkage, CompressClusterIds, generators, SSSP."""

import heapq

import pytest
from pyspark.sql import functions as F

from graph_mining_spark.generation import add_uniform_edge_weights, barabasi_albert, erdos_renyi
from graph_mining_spark.graph import symmetrize
from graph_mining_spark.operators.affinity import compress_cluster_ids, compress_graph
from graph_mining_spark.operators.shortest_paths import sssp
from tests.conftest import make_edges


def test_symmetrize_remove_asymmetric(spark):
    e = make_edges(spark, [(0, 1, 2.0), (1, 0, 5.0), (1, 2, 1.0)])  # (1,2) one-way
    out = {(r["src"], r["dst"]): r["weight"] for r in symmetrize(e, agg="remove").collect()}
    assert out == {(0, 1): 5.0, (1, 0): 5.0}


def test_average_with_max_degree_bounded(spark):
    # clusters {0,1} and {2,3}; inter edges sum=6; X=Y=2
    # mult=1: denom=min(1*2, 4)=2 -> 3.0 ; default_average: 6/4=1.5
    sym = symmetrize(make_edges(spark, [(0, 2, 4.0), (1, 3, 2.0)]))
    labels = spark.createDataFrame([(0, 0), (1, 0), (2, 2), (3, 2)], "vid long, label long")
    nw = labels.select("vid", F.lit(1.0).alias("node_weight"))
    bounded, _ = compress_graph(sym, labels, nw, agg="average_with_max_degree_bounded")
    w = {(r["src"], r["dst"]): r["weight"] for r in bounded.collect()}
    assert w[(0, 2)] == 3.0 and w[(2, 0)] == 3.0
    davg, _ = compress_graph(sym, labels, nw, agg="default_average")
    w2 = {(r["src"], r["dst"]): r["weight"] for r in davg.collect()}
    assert w2[(0, 2)] == 1.5


def test_compress_cluster_ids(spark):
    labels = spark.createDataFrame(
        [(0, 7), (1, 7), (2, 42), (3, 9)], "vid long, label long"
    )
    out = {r["vid"]: r["label"] for r in compress_cluster_ids(labels).collect()}
    assert out == {0: 0, 1: 0, 2: 2, 3: 1}  # sorted distinct 7,9,42 -> 0,1,2


def test_erdos_renyi_deterministic_and_plausible(spark):
    a = sorted((r["src"], r["dst"]) for r in erdos_renyi(spark, 40, 0.1, seed=1).collect())
    b = sorted((r["src"], r["dst"]) for r in erdos_renyi(spark, 40, 0.1, seed=1).collect())
    assert a == b
    n_pairs = 40 * 39 / 2
    assert 0.04 * n_pairs < len(a) < 0.2 * n_pairs
    assert all(s < d for s, d in a)


def test_add_uniform_edge_weights(spark):
    e = erdos_renyi(spark, 30, 0.2, seed=2)
    w = [r["weight"] for r in add_uniform_edge_weights(e, 2.0, 5.0, seed=3).collect()]
    assert all(2.0 <= x < 5.0 for x in w)
    assert len(set(w)) > len(w) // 2  # actually varies


def test_barabasi_albert_shape(spark):
    df = barabasi_albert(spark, n=30, m=2, seed=4)
    rows = df.collect()
    assert len(rows) == (30 - 2) * 2
    degs = {}
    for r in rows:
        degs[r["src"]] = degs.get(r["src"], 0) + 1
        degs[r["dst"]] = degs.get(r["dst"], 0) + 1
    assert max(degs.values()) > 4  # preferential attachment creates hubs


def _dijkstra_oracle(edges, src):
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_vs_dijkstra_oracle(spark):
    edges = [
        (0, 1, 4.0), (0, 2, 1.0), (2, 1, 2.0), (1, 3, 1.0),
        (2, 3, 5.0), (3, 4, 3.0), (5, 0, 2.0),  # 5 unreachable from 0
    ]
    got = {r["vid"]: r["distance"] for r in sssp(make_edges(spark, edges), 0).collect()}
    want = _dijkstra_oracle(edges, 0)
    assert got == want
    assert 5 not in got  # unreachable absent (dijkstra.h contract)


def test_sssp_rejects_negative(spark):
    with pytest.raises(ValueError):
        sssp(make_edges(spark, [(0, 1, -1.0)]), 0)
