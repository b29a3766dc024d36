"""Dynamic HAC: after any insert/remove sequence the state must equal
from-scratch ParHac on the current graph (exact HAC at ε=0), updates
must touch only the dirty components, and the flat-cut surface must
match the static flatten (hac.h Insert/Remove/FlatCluster contract)."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from graph_mining_spark.operators.dynamic_hac import DynamicHac
from graph_mining_spark.operators.hac import ParHacConfig, flatten_dendrogram, parhac
from tests.conftest import make_edges
from tests.oracles import canonicalize_clusters, seeded_er_edges


def _labels(df):
    return {r["vid"]: r["label"] for r in df.collect()}


def _scratch(spark, triples, thr):
    if not triples:
        return {}
    _, labels = parhac(
        make_edges(spark, triples), ParHacConfig(epsilon=0.0, linkage_threshold=thr)
    )
    return _labels(labels)


@pytest.mark.parametrize("unit", ["component", "cluster"])
def test_incremental_equals_scratch(spark, unit):
    thr = 0.3
    dyn = DynamicHac(spark, weight_threshold=thr, epsilon=0.0, dirty_unit=unit)
    all_edges = [
        (u, v, 1.0 + 0.031 * ((u * 3 + v * 7) % 11))
        for u, v, _ in seeded_er_edges(16, 0.25, seed=6)
    ]
    # insert in two batches
    batch1, batch2 = all_edges[: len(all_edges) // 2], all_edges[len(all_edges) // 2 :]
    dyn.insert(make_edges(spark, batch1))
    got1 = _labels(dyn.flat_cluster())
    want1 = _scratch(spark, batch1, thr)
    want1 = {v: want1.get(v, v) for v in got1}
    assert canonicalize_clusters(got1) == canonicalize_clusters(want1)

    dyn.insert(make_edges(spark, batch2))
    got2 = _labels(dyn.flat_cluster())
    want2 = _scratch(spark, all_edges, thr)
    want2 = {v: want2.get(v, v) for v in got2}
    assert canonicalize_clusters(got2) == canonicalize_clusters(want2)


@pytest.mark.parametrize("unit", ["component", "cluster"])
def test_remove_equals_scratch(spark, unit):
    thr = 0.3
    dyn = DynamicHac(spark, weight_threshold=thr, epsilon=0.0, dirty_unit=unit)
    all_edges = [
        (u, v, 1.0 + 0.031 * ((u * 5 + v * 3) % 11))
        for u, v, _ in seeded_er_edges(14, 0.3, seed=9)
    ]
    dyn.insert(make_edges(spark, all_edges))
    rm = [2, 7]
    dyn.remove(spark.createDataFrame([(v,) for v in rm], "vid long"))
    remaining = [(u, v, w) for u, v, w in all_edges if u not in rm and v not in rm]
    got = _labels(dyn.flat_cluster())
    assert not (set(rm) & set(got))
    want = _scratch(spark, remaining, thr)
    want = {v: want.get(v, v) for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want)


def test_update_stats_are_delta_proportional(spark):
    # two far-apart components; touching one must not dirty the other
    comp_a = [(i, i + 1, 1.0) for i in range(0, 9)]       # path 0..9
    comp_b = [(100 + i, 101 + i, 1.0) for i in range(0, 9)]  # path 100..109
    dyn = DynamicHac(spark, weight_threshold=0.5, epsilon=0.0)
    dyn.insert(make_edges(spark, comp_a + comp_b))
    before = _labels(dyn.flat_cluster())
    stats = dyn.insert(make_edges(spark, [(0, 9, 1.0)]))  # close the A cycle
    assert stats.dirty_partitions == 1
    assert stats.dirty_nodes == 10  # component A only
    assert stats.dirty_edges == 1
    # component B labels untouched by an A-only update
    got = _labels(dyn.flat_cluster())
    for i in range(100, 110):
        assert got[i] == before[i]


def test_flat_cut_matches_static_flatten(spark):
    thr = 0.05
    triples = [
        (u, v, 0.25 * (1 + (u + 2 * v) % 4))
        for u, v, _ in seeded_er_edges(12, 0.35, seed=4)
    ]
    dyn = DynamicHac(spark, weight_threshold=thr, epsilon=0.0)
    dyn.insert(make_edges(spark, triples))
    dend, _ = parhac(
        make_edges(spark, triples), ParHacConfig(epsilon=0.0, linkage_threshold=thr)
    )
    for cut in (0.3, 0.6, 0.9):
        got = _labels(dyn.flat_cluster(cut))
        want = _labels(flatten_dendrogram(dend, cut))
        want = {v: want.get(v, v) for v in got}
        assert canonicalize_clusters(got) == canonicalize_clusters(want), cut


def test_merge_two_components_via_insert(spark):
    dyn = DynamicHac(spark, weight_threshold=0.1, epsilon=0.0)
    dyn.insert(make_edges(spark, [(0, 1, 1.0), (5, 6, 1.0)]))
    assert canonicalize_clusters(_labels(dyn.flat_cluster())) == [(0, 1), (5, 6)]
    stats = dyn.insert(make_edges(spark, [(1, 5, 2.0)]))
    assert stats.dirty_partitions == 2  # both old comps went dirty
    got = canonicalize_clusters(_labels(dyn.flat_cluster()))
    want = canonicalize_clusters(
        _scratch(spark, [(0, 1, 1.0), (5, 6, 1.0), (1, 5, 2.0)], 0.1)
    )
    assert got == want


def test_weight_threshold_required(spark):
    with pytest.raises(ValueError):
        DynamicHac(spark, weight_threshold=None)
    with pytest.raises(ValueError):
        DynamicHac(spark, weight_threshold=1.0, dirty_unit="color")


def test_cluster_unit_giant_component_bounded_dirty_work(spark):
    """The VERDICT-r03 scale gap: on a giant single component, an
    update in cluster mode must dirty only the touched flat cluster(s),
    not the component.  Path of K4 cliques joined by sub-threshold
    bridges = one component, many clusters."""
    thr = 1.0
    n_cliques, k = 25, 4
    triples = []
    for c in range(n_cliques):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                triples.append((base + i, base + j, 2.0))
        if c:  # bridge below threshold keeps clusters separate
            triples.append((base - 1, base, 0.2))
    dyn = DynamicHac(spark, weight_threshold=thr, epsilon=0.0, dirty_unit="cluster")
    dyn.insert(make_edges(spark, triples))
    before = _labels(dyn.flat_cluster())
    assert len(set(before.values())) == n_cliques  # one cluster per clique

    # strengthen one edge inside clique 7: only that cluster goes dirty
    stats = dyn.insert(make_edges(spark, [(7 * k, 7 * k + 1, 3.0)]))
    assert stats.dirty_partitions == 1
    assert stats.dirty_nodes == k, "dirty work bounded by the cluster, not the component"
    got = _labels(dyn.flat_cluster())
    assert canonicalize_clusters(got) == canonicalize_clusters(before)
    # and equality with scratch on the full graph
    want = _scratch(spark, triples + [(7 * k, 7 * k + 1, 3.0)], thr)
    want = {v: want.get(v, v) for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want)


def test_cluster_unit_removal_expansion(spark):
    """Removal shrinks a cluster and pushes a cross-cluster similarity
    back above threshold: the expansion loop must pull the frozen
    neighbor cluster in and merge — matching scratch."""
    thr = 1.0
    triples = [(0, 1, 2.0), (0, 5, 1.5)]
    dyn = DynamicHac(spark, weight_threshold=thr, epsilon=0.0, dirty_unit="cluster")
    dyn.insert(make_edges(spark, triples))
    got0 = canonicalize_clusters(_labels(dyn.flat_cluster()))
    assert got0 == [(0, 1), (5,)]  # sim({0,1},5) = 1.5/2 < 1

    stats = dyn.remove(spark.createDataFrame([(1,)], "vid long"))
    # {0}'s sim to frozen {5} is now 1.5 >= thr -> expansion pulled 5 in
    assert stats.dirty_partitions == 2
    got = canonicalize_clusters(_labels(dyn.flat_cluster()))
    want = canonicalize_clusters(_scratch(spark, [(0, 5, 1.5)], thr))
    assert got == want == [(0, 5)]


def test_cluster_unit_merge_across_clusters(spark):
    """An insert that bridges two cached clusters above threshold must
    dirty exactly those two and produce the scratch merge."""
    thr = 0.5
    triples = [(0, 1, 1.0), (5, 6, 1.0), (10, 11, 1.0)]
    dyn = DynamicHac(spark, weight_threshold=thr, epsilon=0.0, dirty_unit="cluster")
    dyn.insert(make_edges(spark, triples))
    stats = dyn.insert(make_edges(spark, [(1, 5, 3.0)]))
    assert stats.dirty_partitions == 2
    assert stats.dirty_nodes == 4
    got = canonicalize_clusters(_labels(dyn.flat_cluster()))
    want = canonicalize_clusters(_scratch(spark, triples + [(1, 5, 3.0)], thr))
    assert got == want


def test_adversarial_removal_cascade(spark):
    """Adversarial removal chain: one remove must drag frozen clusters
    into the dirty set one expansion round at a time (the worst case of
    the strict-progress bound).  The motif is a partner steal — after
    the hub 0 is removed, vertex 1 is stolen by frozen {3} (2.9 > 1.8),
    exposing 2 as a singleton whose 2.5-edge flags {4,5}; re-clustering
    then steals 4 (2.5 > 1.5), exposing 5, whose 2.5-edge flags {6,7}.
    Average-linkage dilution makes deeper-than-one-per-round flags
    impossible here, so expansion_rounds records the true cascade
    depth; the result must still equal scratch."""
    thr = 1.0
    triples = [
        (0, 1, 5.0), (0, 2, 5.0), (1, 2, 1.8),  # C0 = {0,1,2}, hub 0
        (1, 3, 2.9),                            # thief edge into C1 = {3}
        (2, 4, 2.5),                            # exposed 2 -> C2
        (4, 5, 1.5),                            # C2 = {4,5}
        (5, 6, 2.5),                            # exposed 5 -> C3
        (6, 7, 3.0),                            # C3 = {6,7}
    ]
    dyn = DynamicHac(spark, weight_threshold=thr, epsilon=0.0, dirty_unit="cluster")
    dyn.insert(make_edges(spark, triples))
    before = canonicalize_clusters(_labels(dyn.flat_cluster()))
    assert before == [(0, 1, 2), (3,), (4, 5), (6, 7)]

    stats = dyn.remove(spark.createDataFrame([(0,)], "vid long"))
    # multi-round cascade: expansion kept finding newly-exposed frozen
    # clusters after the first re-cluster (measured depth 3)
    assert stats.expansion_rounds >= 3, "cascade should take multiple rounds"
    # the cascade eventually dirtied every cluster — but one at a time,
    # each round bounded by the dirty region, never the whole component
    assert stats.dirty_partitions == 4
    got = canonicalize_clusters(_labels(dyn.flat_cluster()))
    remaining = [t for t in triples if 0 not in t[:2]]
    want = canonicalize_clusters(_scratch(spark, remaining, thr))
    assert got == want == [(1, 3), (2, 4), (5, 6, 7)]
