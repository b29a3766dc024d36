"""EnforceMaxClusterSize vs the reference's own test fixtures
(parallel_affinity_internal_test.cc:1062-1220, EnforceMaxClusterSizeTest
NoSizeConstraint / MinSizeConstraint / MaxSizeConstraint /
MinMaxSizeConstraint / TargetSizeConstraint /
UnweightedNodesTargetSizeConstraint).  Expected labels are the
reference's union-find roots canonicalized to min member vid."""

import pytest

from graph_mining_spark.operators.size_constraint import (
    SizeConstraint,
    _enforce_component,
    enforce_max_cluster_size,
    min_weighted_size_tree_partitioning,
)
from tests.oracles import canonicalize_clusters

# (node_weights, cluster_ids, best_neighbors[(nbr, w)], constraint, expected_roots)
FIXTURES = {
    "no_constraint": (
        [1, 2, 3, 1, 2, 2],
        [0, 1, 0, 3, 0, 1],
        [(2, 1), (5, 1), (0, 1), (3, 0), (2, 2), (1, 1)],
        SizeConstraint(),
        [0, 1, 0, 3, 0, 1],
    ),
    "min": (
        [1, 2, 3, 1, 2, 2],
        [0, 1, 0, 3, 0, 1],
        [(2, 1), (5, 1), (0, 1), (3, 0), (2, 2), (1, 1)],
        SizeConstraint(min_cluster_size=2, prefer_min_cluster_size=True),
        [0, 1, 0, 3, 4, 5],
    ),
    "max": (
        [1, 2, 3, 1, 2, 2],
        [0, 1, 0, 3, 0, 1],
        [(2, 1), (5, 1), (0, 1), (3, 0), (2, 2), (1, 1)],
        SizeConstraint(max_cluster_size=5),
        [0, 1, 2, 3, 2, 1],
    ),
    "min_max": (
        [1, 2, 3, 1, 2, 2, 1, 1],
        [0, 1, 0, 3, 0, 1, 0, 0],
        [(2, 1), (5, 1), (0, 1), (3, 0), (2, 2), (1, 1), (0, 1), (0, 1)],
        SizeConstraint(max_cluster_size=5, min_cluster_size=2, prefer_min_cluster_size=True),
        [0, 1, 0, 3, 4, 5, 0, 7],
    ),
    "target": (
        [4, 4, 2, 2, 2],
        [0, 0, 0, 0, 0],
        [(1, 3), (0, 3), (1, 2.1), (2, 2), (3, 1)],
        SizeConstraint(target_cluster_size=5),
        [0, 0, 2, 2, 2],
    ),
    "target_unweighted": (
        [1, 1, 1, 1, 1],
        [0, 0, 0, 0, 0],
        [(1, 4), (0, 4), (1, 3), (2, 2), (3, 1)],
        SizeConstraint(target_cluster_size=2),
        [0, 0, 0, 3, 3],
    ),
}


def _canon(labels_list):
    return canonicalize_clusters({v: lb for v, lb in enumerate(labels_list)})


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_reference_fixture_sequential(name):
    nw, cids, bns, sc, expected = FIXTURES[name]
    # group rows by input component, run per component (as the operator does)
    by_comp = {}
    for v, c in enumerate(cids):
        by_comp.setdefault(c, []).append((v, bns[v][0], float(bns[v][1]), float(nw[v])))
    got = {}
    for rows in by_comp.values():
        got.update(_enforce_component(rows, sc))
    assert canonicalize_clusters(got) == _canon(expected)


def test_tree_partitioning_chain():
    # chain 4->3->2->1, 0 root child of nothing; thresholds split it
    parents = {0: -1, 1: 0, 2: 1, 3: 2, 4: 3}
    weights = {i: 1.0 for i in range(5)}
    res = min_weighted_size_tree_partitioning(parents, weights, 2.0)
    # every final cluster has weight >= 2
    comp = {}
    for v in sorted(res):
        p = res[v]
        comp[v] = v if p == -1 else comp[p]
    sizes = {}
    for v, c in comp.items():
        sizes[c] = sizes.get(c, 0) + 1
    assert all(s >= 2 for s in sizes.values())


def test_affinity_with_max_size_invariant(spark):
    # end-to-end: size-constrained affinity never builds a cluster
    # whose node-weight total exceeds max_cluster_size
    from pyspark.sql import functions as F

    from graph_mining_spark.operators.affinity import AffinityConfig, affinity_cluster
    from tests.conftest import make_edges
    from tests.oracles import seeded_er_edges

    und = seeded_er_edges(40, 0.15, seed=11, weighted=True)
    cfg = AffinityConfig(
        num_iterations=2,
        edge_aggregation="sum",
        size_constraint=SizeConstraint(max_cluster_size=4),
    )
    labels = affinity_cluster(make_edges(spark, und), cfg)
    sizes = labels.groupBy("label").agg(F.count("*").alias("n"))
    assert sizes.agg(F.max("n")).first()[0] <= 4
    # and it actually merged something
    assert sizes.filter(F.col("n") > 1).count() > 0


def test_spark_plumbing(spark):
    nw, cids, bns, sc, expected = FIXTURES["min_max"]
    best = spark.createDataFrame(
        [(v, bns[v][0], float(bns[v][1])) for v in range(len(nw))],
        "src long, dst long, weight double",
    )
    comps = spark.createDataFrame(list(enumerate(cids)), "vid long, label long")
    nwdf = spark.createDataFrame(
        [(v, float(w)) for v, w in enumerate(nw)], "vid long, node_weight double"
    )
    got = {
        r["vid"]: r["label"]
        for r in enforce_max_cluster_size(best, comps, sc, node_weights=nwdf).collect()
    }
    assert canonicalize_clusters(got) == _canon(expected)
