"""QuickCluster vs a sequential oracle replicating
quick_cluster.cc:44-93 with the SAME priorities (seeded xxhash order)."""

from collections import defaultdict

from pyspark.sql import functions as F

from graph_mining_spark.operators.quick_cluster import quick_cluster
from tests.conftest import make_edges
from tests.oracles import canonicalize_clusters, seeded_er_edges


def _spark_priorities(spark, vids, seed):
    df = spark.createDataFrame([(int(v),) for v in vids], "vid long").select(
        "vid", F.xxhash64("vid", F.lit(seed)).alias("h")
    )
    return {r["vid"]: r["h"] for r in df.collect()}


def _oracle(vids, und_edges, prios, offset=0.0, resolution=0.0, node_weight=None):
    nw = node_weight or {}
    adj = defaultdict(dict)
    for u, v, w in und_edges:
        if u == v:
            continue
        # max-weight dedup, symmetric (engine symmetrize semantics)
        adj[u][v] = max(adj[u].get(v, float("-inf")), w)
        adj[v][u] = max(adj[v].get(u, float("-inf")), w)
    order = sorted(vids, key=lambda v: (prios[v], v))
    used = set()
    clusters = {}
    for c in order:
        if c in used:
            continue
        used.add(c)
        clusters[c] = c
        for nb, w in adj[c].items():
            rescaled = w - offset - resolution * nw.get(c, 1.0) * nw.get(nb, 1.0)
            if nb not in used and rescaled > 0:
                used.add(nb)
                clusters[nb] = c
    return clusters


def _run(spark, edges, vids, **kw):
    got = {r["vid"]: r["label"] for r in quick_cluster(make_edges(spark, edges), **kw).collect()}
    prios = _spark_priorities(spark, vids, kw.get("seed", 42))
    want = _oracle(vids, edges, prios, offset=kw.get("edge_weight_offset", 0.0),
                   resolution=kw.get("resolution", 0.0))
    assert canonicalize_clusters(got) == canonicalize_clusters(want)
    return got


def test_triangle_plus_pendant(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)]
    _run(spark, edges, range(4))


def test_er_graph_matches_sequential_oracle(spark):
    edges = seeded_er_edges(40, 0.12, seed=7, weighted=True)
    vids = sorted({u for u, v, w in edges} | {v for u, v, w in edges})
    _run(spark, edges, vids)


def test_offset_prunes_weak_edges(spark):
    edges = [(0, 1, 5.0), (1, 2, 0.5)]
    got = _run(spark, edges, range(3), edge_weight_offset=1.0)
    # 0-1 survives the offset; 1-2 does not -> 2 alone
    by_label = defaultdict(set)
    for v, lb in got.items():
        by_label[lb].add(v)
    assert {frozenset(s) for s in by_label.values()} == {frozenset({0, 1}), frozenset({2})}


def test_resolution_disconnects_everything(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0)]
    got = _run(spark, edges, range(3), resolution=2.0)  # 1 - 2*1*1 < 0 for all
    assert len(set(got.values())) == 3


def test_determinism_across_partitions(spark):
    edges = seeded_er_edges(30, 0.15, seed=3, weighted=True)
    a = {r["vid"]: r["label"] for r in quick_cluster(make_edges(spark, edges).repartition(4)).collect()}
    b = {r["vid"]: r["label"] for r in quick_cluster(make_edges(spark, edges).repartition(17)).collect()}
    assert a == b


def test_partial_node_weights_default_to_one(spark):
    """Vertices missing from a caller node_weights table default to
    1.0 (the reference's unset SimpleUndirectedGraph node weight) —
    their edges must not be silently dropped by the weight joins."""
    edges = [(0, 1, 1.0), (1, 2, 1.0), (3, 4, 1.0)]
    full = spark.createDataFrame(
        [(i, 1.0) for i in range(5)], "vid long, node_weight double"
    )
    part = spark.createDataFrame([(0, 1.0)], "vid long, node_weight double")
    a = {
        r["vid"]: r["label"]
        for r in quick_cluster(make_edges(spark, edges), resolution=0.1, node_weights=full).collect()
    }
    b = {
        r["vid"]: r["label"]
        for r in quick_cluster(make_edges(spark, edges), resolution=0.1, node_weights=part).collect()
    }
    assert a == b


def test_negative_node_weight_raises(spark):
    import pytest as _pytest

    nw = spark.createDataFrame([(0, -1.0)], "vid long, node_weight double")
    with _pytest.raises(ValueError, match="negative"):
        quick_cluster(make_edges(spark, [(0, 1, 1.0)]), node_weights=nw)
