"""Clique aggregator: exact maximal-clique identity at min_density=1.0,
the clique_aggregator.h:31-42 guarantees at lower densities, and
Spark/kernel parity (reference publishes no test file for this family
in the snapshot, so the documented guarantees are the oracle)."""

import itertools
import random

import pytest

from graph_mining_spark.operators.clique_aggregator import (
    CliqueAggregatorConfig,
    clique_aggregator,
    clique_aggregator_kernel,
)
from tests.conftest import make_edges


def brute_force_maximal_cliques(nodes, edges):
    """All maximal cliques of size >= 2 by subset enumeration (n <= ~14)."""
    nodes = sorted(nodes)
    eset = {frozenset(e) for e in edges if e[0] != e[1]}

    def is_clique(sub):
        return all(frozenset(p) in eset for p in itertools.combinations(sub, 2))

    cliques = [
        frozenset(sub)
        for r in range(2, len(nodes) + 1)
        for sub in itertools.combinations(nodes, r)
        if is_clique(sub)
    ]
    return {c for c in cliques if not any(c < d for d in cliques)}


def random_graph(n, p, seed):
    rng = random.Random(seed)
    edges = [
        (u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < p
    ]
    return list(range(n)), edges


def density_of(members, eset):
    m = sum(
        1 for p in itertools.combinations(sorted(members), 2) if frozenset(p) in eset
    )
    k = len(members)
    return 1.0 if k <= 1 else m / (k * (k - 1) / 2)


def connected(members, eset):
    members = set(members)
    seen = {next(iter(members))}
    frontier = list(seen)
    while frontier:
        x = frontier.pop()
        for y in members - seen:
            if frozenset((x, y)) in eset:
                seen.add(y)
                frontier.append(y)
    return seen == members


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
@pytest.mark.parametrize("p", [0.3, 0.6])
def test_min_density_one_is_exactly_maximal_cliques(seed, p):
    nodes, edges = random_graph(10, p, seed)
    expected = brute_force_maximal_cliques(nodes, edges)
    got = clique_aggregator_kernel(nodes, edges, CliqueAggregatorConfig(min_density=1.0))
    assert {frozenset(m) for m, _ in got} == expected
    assert all(d == 1.0 for _, d in got)
    # no duplicates either
    assert len(got) == len(expected)


def test_triangle_with_pendant():
    nodes = [0, 1, 2, 3]
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    got = clique_aggregator_kernel(nodes, edges, CliqueAggregatorConfig(min_density=1.0))
    assert {frozenset(m) for m, _ in got} == {frozenset({0, 1, 2}), frozenset({2, 3})}


@pytest.mark.parametrize("seed", [5, 6, 7])
@pytest.mark.parametrize("min_density", [0.5, 0.8])
def test_guarantees_at_lower_density(seed, min_density):
    nodes, edges = random_graph(11, 0.45, seed)
    eset = {frozenset(e) for e in edges}
    cfg = CliqueAggregatorConfig(min_density=min_density)
    got = clique_aggregator_kernel(nodes, edges, cfg)
    clusters = [frozenset(m) for m, _ in got]
    # guarantee 1: every clique of size >= 2 is inside some cluster
    for clique in brute_force_maximal_cliques(nodes, edges):
        assert any(clique <= c for c in clusters), clique
    # guarantee 2: density >= min_density, and the reported density is right
    for members, d in got:
        assert d >= min_density
        assert abs(density_of(members, eset) - d) < 1e-12
    # guarantee 3 (bron_kerbosch_pruning): no cluster is a subset of another
    for a, b in itertools.combinations(clusters, 2):
        assert not (a <= b or b <= a)
    # connected clusters when allow_disconnected_clusters is false
    for members, _ in got:
        assert connected(members, eset)


def test_no_pruning_still_covers_and_meets_density():
    nodes, edges = random_graph(9, 0.5, 11)
    eset = {frozenset(e) for e in edges}
    cfg = CliqueAggregatorConfig(min_density=0.7, bron_kerbosch_pruning=False)
    got = clique_aggregator_kernel(nodes, edges, cfg)
    clusters = [frozenset(m) for m, _ in got]
    for clique in brute_force_maximal_cliques(nodes, edges):
        assert any(clique <= c for c in clusters)
    for members, d in got:
        assert d >= cfg.min_density
        assert abs(density_of(members, eset) - d) < 1e-12


def test_allow_disconnected_emits_whole_graph():
    nodes = [0, 1, 2, 3]
    edges = [(0, 1), (2, 3)]
    got = clique_aggregator_kernel(
        nodes, edges, CliqueAggregatorConfig(min_density=0.3, allow_disconnected_clusters=True)
    )
    # density of {0,1,2,3} with 2 edges = 2/6 >= 0.3: emitted immediately
    assert {frozenset(m) for m, _ in got} == {frozenset({0, 1, 2, 3})}
    # same graph without the flag: only the two edges, each connected
    got2 = clique_aggregator_kernel(
        nodes, edges, CliqueAggregatorConfig(min_density=0.3)
    )
    assert {frozenset(m) for m, _ in got2} == {frozenset({0, 1}), frozenset({2, 3})}


def test_spark_matches_kernel_per_component(spark):
    # two components: a 5-node random graph (shifted) + a triangle-pendant
    nodes_a, edges_a = random_graph(6, 0.6, 21)
    edges_b = [(100, 101), (101, 102), (100, 102), (102, 103)]
    all_edges = edges_a + edges_b
    df = make_edges(spark, [(u, v, 1.0) for u, v in all_edges])
    cfg = CliqueAggregatorConfig(min_density=0.75)
    rows = clique_aggregator(df, cfg).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.cluster_key, (set(), r.density))[0].add(r.member)
        assert r.cluster_size >= 2
    got = {(frozenset(m), round(d, 12)) for m, d in by_key.values()}

    expected = set()
    for nodes, edges in ((nodes_a, edges_a), ([100, 101, 102, 103], edges_b)):
        touched = sorted({v for e in edges for v in e})
        for members, d in clique_aggregator_kernel(touched, edges, cfg):
            expected.add((frozenset(members), round(d, 12)))
    assert got == expected


def test_spark_allow_disconnected_single_group(spark):
    df = make_edges(spark, [(0, 1, 1.0), (2, 3, 1.0)])
    cfg = CliqueAggregatorConfig(min_density=0.3, allow_disconnected_clusters=True)
    rows = clique_aggregator(df, cfg).collect()
    members = {r.member for r in rows}
    assert members == {0, 1, 2, 3}
    assert len({r.cluster_key for r in rows}) == 1


def test_k_core_presplit_unravels_giant_sparse_component(spark):
    """A planted giant sparse component (a 600-vertex path glued to a
    K5) must shrink to just the dense core before the kernel: the
    (k-1)-core peel removes the entire path while preserving every
    clique of size >= 3 exactly."""
    from graph_mining_spark.operators.clique_aggregator import k_core_presplit

    n_path = 600
    path = [(i, i + 1, 1.0) for i in range(n_path - 1)]
    k5_base = n_path
    k5 = [
        (k5_base + i, k5_base + j, 1.0)
        for i in range(5)
        for j in range(i + 1, 5)
    ]
    bridge = [(n_path - 1, k5_base, 1.0)]  # glue path into the clique's component
    df = make_edges(spark, path + k5 + bridge)

    core = k_core_presplit(df, min_clique_size=3)
    core_nodes = {r["src"] for r in core.select("src").distinct().collect()}
    assert core_nodes == {k5_base + i for i in range(5)}, "only the K5 survives"

    out = clique_aggregator(
        core, CliqueAggregatorConfig(min_density=1.0), already_symmetric=True
    )
    rows = out.collect()
    keys = {r["cluster_key"] for r in rows}
    assert len(keys) == 1  # exactly one maximal clique of size >= 3
    assert sorted(r["member"] for r in rows) == sorted(k5_base + i for i in range(5))
    assert all(r["cluster_size"] == 5 and r["density"] == 1.0 for r in rows)
