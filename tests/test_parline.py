"""Parline: sequential-oracle parity (hierarchy → embedding → slicing),
balance/contiguity guarantees, planted-structure quality, and the
weighted slicing formula (parallel_line.cc:69-149)."""

from collections import defaultdict

import pytest

from graph_mining_spark.operators.parline import ParlineConfig, parline
from graph_mining_spark.operators.size_constraint import SizeConstraint, _enforce_component
from tests.conftest import make_edges
from tests.oracles import seeded_er_edges

TARGET = SizeConstraint(target_cluster_size=2.0)


# ---------------- sequential oracle ----------------


def _sym_max(triples):
    und = {}
    for u, v, w in triples:
        if u == v:
            continue
        a, b = (u, v) if u < v else (v, u)
        und[(a, b)] = max(und.get((a, b), float("-inf")), float(w))
    return und


def _one_level(nodes, und):
    """One affinity round with target size 2: best neighbor (w desc,
    larger id), forest components, per-component enforce (the same
    kernel affinity_cluster runs distributed)."""
    nbrs = defaultdict(dict)
    for (a, b), w in und.items():
        nbrs[a][b] = w
        nbrs[b][a] = w
    best = {}
    for v in nodes:
        if nbrs[v]:
            w, b = max((w, nb) for nb, w in nbrs[v].items())
            best[v] = (b, w)
    # forest components
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for v, (b, _) in best.items():
        parent[find(v)] = find(b)
    comps = defaultdict(list)
    for v in nodes:
        comps[find(v)].append(v)
    labels = {}
    for members in comps.values():
        rows = [
            (v, best[v][0] if v in best else None, best[v][1] if v in best else 0.0, 1.0)
            for v in members
        ]
        labels.update(_enforce_component(rows, TARGET))
    return labels


def oracle_parline(triples, k, max_levels=40):
    und = _sym_max(triples)
    nodes = sorted({v for e in und for v in e})
    paths = {v: [v] for v in nodes}
    stopped = {v: False for v in nodes}
    cur_map = {v: v for v in nodes}
    cur_und = dict(und)
    for _ in range(max_levels):
        cur_nodes = sorted(set(cur_map.values()))
        endpoints = {v for e in cur_und for v in e}
        labels = _one_level(cur_nodes, cur_und)
        for v in nodes:
            c = cur_map[v]
            if not stopped[v] and c in endpoints:
                paths[v].append(labels[c])
            else:
                stopped[v] = True
            cur_map[v] = labels[c]
        nxt = defaultdict(float)
        for (a, b), w in cur_und.items():
            ca, cb = labels[a], labels[b]
            if ca == cb:
                continue
            x, y = (ca, cb) if ca < cb else (cb, ca)
            nxt[(x, y)] += w
        cur_und = dict(nxt)
        if not cur_und:
            break
    order = sorted(nodes, key=lambda v: (len(paths[v]), tuple(reversed(paths[v]))))
    n = len(order)
    size, rem = divmod(n, k)
    big = rem * (size + 1)
    out = {}
    for r, v in enumerate(order):
        out[v] = r // (size + 1) if r < big else rem + (r - big) // max(size, 1)
    return out, {v: r for r, v in enumerate(order)}


# ---------------- tests ----------------


@pytest.mark.parametrize("seed,k", [(3, 2), (5, 3), (8, 4)])
def test_matches_sequential_oracle(spark, seed, k):
    triples = [
        (u, v, 1.0 + ((u * 7 + v * 13) % 9) * 0.125)
        for u, v, _ in seeded_er_edges(18, 0.25, seed=seed)
    ]
    got = {
        r["vid"]: (r["rank"], r["cluster"])
        for r in parline(make_edges(spark, triples), ParlineConfig(num_clusters=k)).collect()
    }
    want_cluster, want_rank = oracle_parline(triples, k)
    assert {v: c for v, (_, c) in got.items()} == want_cluster
    assert {v: r for v, (r, _) in got.items()} == want_rank


def test_balance_and_contiguity(spark):
    triples = [(u, v, 1.0) for u, v, _ in seeded_er_edges(29, 0.2, seed=11)]
    for k in (2, 4, 7):
        rows = parline(make_edges(spark, triples), ParlineConfig(num_clusters=k)).collect()
        by_cluster = defaultdict(list)
        for r in rows:
            by_cluster[r["cluster"]].append(r["rank"])
        n = len(rows)
        sizes = sorted(len(v) for v in by_cluster.values())
        assert sum(sizes) == n
        assert sizes[-1] - sizes[0] <= 1  # ±1 node-count balance
        for ranks in by_cluster.values():  # contiguous intervals on the line
            ranks = sorted(ranks)
            assert ranks[-1] - ranks[0] == len(ranks) - 1


def test_planted_cliques_get_separated(spark):
    # two K5s + a weak bridge: k=2 must cut only the bridge
    k5a = [(u, v, 1.0) for u in range(5) for v in range(u + 1, 5)]
    k5b = [(u + 10, v + 10, 1.0) for u in range(5) for v in range(u + 1, 5)]
    bridge = [(4, 10, 0.01)]
    rows = parline(
        make_edges(spark, k5a + k5b + bridge), ParlineConfig(num_clusters=2)
    ).collect()
    cl = {r["vid"]: r["cluster"] for r in rows}
    assert len({cl[v] for v in range(5)}) == 1
    assert len({cl[v + 10] for v in range(5)}) == 1
    assert cl[0] != cl[10]


def test_weighted_slicing(spark):
    # path graph, node weight = vid+1; floor(prefix / (total/k)) rule
    triples = [(i, i + 1, 1.0) for i in range(7)]
    nw = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(8)], "vid long, node_weight double"
    )
    rows = parline(
        make_edges(spark, triples),
        ParlineConfig(num_clusters=3, use_node_weights=True),
        node_weights=nw,
    ).collect()
    total = sum(range(1, 9))
    cw = total / 3
    by_rank = sorted(rows, key=lambda r: r["rank"])
    prefix = 0.0
    for r in by_rank:
        assert r["cluster"] == int(prefix // cw)
        prefix += r["vid"] + 1


def test_cluster_weight_constraint(spark):
    triples = [(i, i + 1, 1.0) for i in range(9)]
    rows = parline(
        make_edges(spark, triples), ParlineConfig(cluster_weight=2.5)
    ).collect()
    # ceil(10 / 2.5) = 4 clusters
    assert len({r["cluster"] for r in rows}) == 4
    with pytest.raises(ValueError):
        parline(make_edges(spark, triples), ParlineConfig(num_clusters=1))
    with pytest.raises(ValueError):
        parline(make_edges(spark, triples), ParlineConfig())
