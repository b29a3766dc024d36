import math

import pytest

from graph_mining_spark.operators.affinity import (
    AffinityConfig,
    DynamicWeightThreshold,
    affinity_cluster,
    best_neighbor,
    cluster_stats,
    weight_threshold,
)
from graph_mining_spark.graph import symmetrize
from tests.conftest import make_edges
from tests.oracles import canonicalize_clusters

G1 = [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 2.0)]
# G3 (parallel_affinity_test.cc:41-61): two superclusters
G3 = [
    (0, 1, 5.0), (2, 3, 5.0), (4, 5, 5.0), (6, 7, 5.0),
    (0, 2, 2.0), (0, 3, 2.0), (1, 2, 1.0), (1, 3, 2.0),
    (4, 6, 2.0), (4, 7, 1.0), (5, 7, 2.0),
    (0, 4, 3.0), (0, 5, 1.0), (2, 6, 3.0), (3, 7, 1.0), (1, 7, 2.0), (3, 5, 2.0),
]


def _clusters(df):
    return canonicalize_clusters({r["vid"]: r["label"] for r in df.collect()})


def test_g1_zero_one_two_iterations(spark):
    e = make_edges(spark, G1)
    got0 = _clusters(affinity_cluster(e, AffinityConfig(num_iterations=0)))
    assert got0 == [(0,), (1,), (2,), (3,)]
    got1 = _clusters(affinity_cluster(e, AffinityConfig(num_iterations=1)))
    assert got1 == [(0, 1), (2, 3)]
    got2 = _clusters(affinity_cluster(e, AffinityConfig(num_iterations=2)))
    assert got2 == [(0, 1, 2, 3)]


def test_g2_threshold_boundary(spark):
    # threshold inclusive: θ=2.0 merges, θ=2.1 doesn't (parallel_affinity_test.cc:161-180)
    e = make_edges(spark, [(0, 1, 2.0)])
    assert _clusters(affinity_cluster(e, AffinityConfig(num_iterations=1, weight_threshold=2.0))) == [(0, 1)]
    assert _clusters(affinity_cluster(e, AffinityConfig(num_iterations=1, weight_threshold=2.1))) == [(0,), (1,)]


def test_g3_max_vs_sum_aggregation(spark):
    e = make_edges(spark, G3)
    got_max = _clusters(affinity_cluster(e, AffinityConfig(num_iterations=2, edge_aggregation="max")))
    assert got_max == [(0, 1, 4, 5), (2, 3, 6, 7)]
    got_sum = _clusters(affinity_cluster(e, AffinityConfig(num_iterations=2, edge_aggregation="sum")))
    assert got_sum == [(0, 1, 2, 3), (4, 5, 6, 7)]


def test_best_neighbor_tiebreak_larger_id(spark):
    # ties → larger neighbor id (parallel_affinity_internal.cc:238-243)
    sym = symmetrize(make_edges(spark, [(0, 1, 1.0), (0, 2, 1.0)]))
    best = {r["src"]: r["dst"] for r in best_neighbor(sym).collect()}
    assert best[0] == 2


def test_threshold_schedules():
    assert weight_threshold(AffinityConfig(weight_threshold=1.5), 3) == 1.5
    cfg = AffinityConfig(per_iteration_weight_thresholds=[3.0, 2.0])
    assert weight_threshold(cfg, 0) == 3.0
    assert weight_threshold(cfg, 1) == 2.0
    assert weight_threshold(cfg, 5) == 2.0  # last repeats
    dyn = AffinityConfig(
        num_iterations=3,
        dynamic_weight_threshold=DynamicWeightThreshold(upper_bound=4.0, lower_bound=1.0, decay="linear"),
    )
    assert [weight_threshold(dyn, i) for i in range(3)] == [4.0, 2.5, 1.0]
    dyn_e = AffinityConfig(
        num_iterations=3,
        dynamic_weight_threshold=DynamicWeightThreshold(upper_bound=4.0, lower_bound=1.0, decay="exponential"),
    )
    got = [weight_threshold(dyn_e, i) for i in range(3)]
    assert got[0] == 4.0 and math.isclose(got[1], 2.0) and math.isclose(got[2], 1.0)
    with pytest.raises(ValueError):
        weight_threshold(AffinityConfig(weight_threshold=1.0), -1)


def test_default_average_uses_cluster_sizes(spark):
    # two pairs joined by one edge of weight 1: after round 1 the
    # contracted edge has DEFAULT_AVERAGE weight 1/(2*2)=0.25;
    # with threshold 0.3 round 2 must NOT merge, with 0.2 it must.
    e = make_edges(spark, [(0, 1, 5.0), (2, 3, 5.0), (1, 2, 1.0)])
    cfg_no = AffinityConfig(num_iterations=2, per_iteration_weight_thresholds=[0.0, 0.3])
    assert _clusters(affinity_cluster(e, cfg_no)) == [(0, 1), (2, 3)]
    cfg_yes = AffinityConfig(num_iterations=2, per_iteration_weight_thresholds=[0.0, 0.2])
    assert _clusters(affinity_cluster(e, cfg_yes)) == [(0, 1, 2, 3)]


def test_cluster_stats_density_conductance(spark):
    # two triangles joined by a bridge; labels = triangle membership
    e = symmetrize(make_edges(
        spark,
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0), (2, 3, 1.0)],
    ))
    labels = spark.createDataFrame([(i, 0 if i < 3 else 3) for i in range(6)], "vid long, label long")
    stats = {r["label"]: r for r in cluster_stats(e, labels).collect()}
    assert stats[0]["n_nodes"] == 3
    assert stats[0]["intra_weight"] == 3.0
    assert stats[0]["inter_weight"] == 1.0
    assert abs(stats[0]["density"] - 1.0) < 1e-12  # 3 / C(3,2)
    # vol = 2*3+1 = 7, total = 14 → conductance = 1/min(7,7)
    assert abs(stats[0]["conductance"] - 1.0 / 7.0) < 1e-12


def test_hierarchy_levels(spark):
    e = make_edges(spark, G1)
    levels = affinity_cluster(e, AffinityConfig(num_iterations=2), return_levels=True)
    assert _clusters(levels[0]) == [(0, 1), (2, 3)]
    assert _clusters(levels[1]) == [(0, 1, 2, 3)]


def test_caller_vertices_missing_best_target_stays_connected(spark):
    """A caller-supplied vertex table may omit an edge endpoint; a
    vertex whose BEST neighbor is out-of-set must stay a labeled
    singleton that round (dangling-pointer clamp) and keep its other
    edges into later rounds — not silently vanish from round_labels so
    compress_graph drops its edges.

    Vertex 1's best is out-of-set 4 (weight 10); its in-set edge to 2
    (weight 1) must still merge it with {2,3} on round 1."""
    e = make_edges(spark, [(1, 4, 10.0), (1, 2, 1.0), (2, 3, 5.0)])
    verts = spark.createDataFrame([(1,), (2,), (3,)], "vid long")
    out = {
        r["vid"]: r["label"]
        for r in affinity_cluster(
            e, AffinityConfig(num_iterations=2), vertices=verts
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}
