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


def _cut_size(triples, assign):
    und = _sym_max(triples)
    return sum(w for (a, b), w in und.items() if assign[a] != assign[b])


def test_fm_kernel_moves_obvious_misplacement():
    from graph_mining_spark.operators.parline import fm_improve_pair

    # node 4 sits in cluster 1 but all its edges go to cluster 2
    nodes1, nodes2 = [0, 1, 4], [2, 3]
    edges = [(0, 1, 1.0), (2, 3, 1.0), (4, 2, 1.0), (4, 3, 1.0)]
    adj = defaultdict(list)
    for u, v, w in edges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    node_w = {i: 1.0 for i in range(5)}
    m12, m21, imp = fm_improve_pair(nodes1, nodes2, adj, node_w, max_cluster_weight=3.0)
    assert 4 in m12 and not m21
    assert imp == 2.0  # the cut drops by both of 4's edges


def test_fm_kernel_respects_balance():
    from graph_mining_spark.operators.parline import fm_improve_pair

    # everything wants to move to cluster 2, but the weight cap forbids it
    nodes1, nodes2 = [0, 1], [2]
    edges = [(0, 2, 1.0), (1, 2, 1.0)]
    adj = defaultdict(list)
    for u, v, w in edges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    node_w = {i: 1.0 for i in range(3)}
    m12, m21, _ = fm_improve_pair(nodes1, nodes2, adj, node_w, max_cluster_weight=2.0)
    assert len(m12) <= 1  # cap 2.0 admits at most one move into {2}


def test_pairing_schemes_are_disjoint_and_cover():
    from graph_mining_spark.operators.parline import distance_pairs, odd_even_pairs

    for k in (2, 4, 5, 8):
        for step in (0, 1):
            pairs = odd_even_pairs(k, step)
            flat = [c for p in pairs for c in p]
            assert len(flat) == len(set(flat))  # disjoint
            assert all(0 <= c < k for c in flat)
    for k, dist in ((4, 2), (8, 3), (6, 1)):
        for step in range(2 * min(k // 2, dist)):
            pairs = distance_pairs(k, step, dist)
            flat = [c for p in pairs for c in p]
            assert len(flat) == len(set(flat)), (k, dist, step, pairs)
            assert all(0 <= c < k for c in flat)


def test_local_search_improves_cut_and_keeps_balance(spark):
    triples = [
        (u, v, 1.0 + 0.125 * ((u + 3 * v) % 5))
        for u, v, _ in seeded_er_edges(24, 0.25, seed=13)
    ]
    base_cfg = ParlineConfig(num_clusters=3)
    ls_cfg = ParlineConfig(num_clusters=3, num_improvement_iterations=2, imbalance=0.2)
    base = {r["vid"]: r["cluster"] for r in parline(make_edges(spark, triples), base_cfg).collect()}
    improved = {r["vid"]: r["cluster"] for r in parline(make_edges(spark, triples), ls_cfg).collect()}
    assert _cut_size(triples, improved) <= _cut_size(triples, base)
    # balance: every cluster within (1+imbalance)*n/k
    from collections import Counter

    n = len(improved)
    cap = (1 + 0.2) * n / 3
    assert max(Counter(improved.values()).values()) <= cap
    # determinism
    again = {r["vid"]: r["cluster"] for r in parline(make_edges(spark, triples), ls_cfg).collect()}
    assert again == improved


def test_local_search_fixes_boundary_misassignment(spark):
    # two K6 cliques + strong cross edges from one "traitor" node; the
    # embedding may slice it with its home clique, the FM pass must
    # move it (or keep it) to whichever side cuts less — compare against
    # exhaustive best single-node placement
    k6a = [(u, v, 1.0) for u in range(6) for v in range(u + 1, 6)]
    k6b = [(u + 10, v + 10, 1.0) for u in range(6) for v in range(u + 1, 6)]
    traitor = [(5, 10 + i, 2.0) for i in range(4)]
    triples = k6a + k6b + traitor + [(0, 10, 0.05)]
    cfg = ParlineConfig(num_clusters=2, num_improvement_iterations=2, imbalance=0.3)
    got = {r["vid"]: r["cluster"] for r in parline(make_edges(spark, triples), cfg).collect()}
    # node 5's weighted pull: 8.0 toward the B side vs 5.0 inside A
    assert got[5] == got[10], got


def test_compute_cut_ratio(spark):
    from graph_mining_spark.operators.parline import compute_cut_ratio

    triples = [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 3.0)]
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "vid long, cluster long"
    )
    # cut edges: (1,2) weight 1.0; total weight 6.0 (per orientation)
    got = compute_cut_ratio(make_edges(spark, triples), assign)
    assert abs(got - 1.0 / 6.0) < 1e-12
    with pytest.raises(ValueError):
        compute_cut_ratio(
            make_edges(spark, [(0, 0, 1.0)]), assign
        )  # self-loop only -> zero total weight


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


def test_weighted_slicing_zero_weight_clamp(spark):
    """Zero-weight nodes ranked after all the weight has accumulated
    have exclusive prefix == total weight, and floor(total/(total/k))
    is k — the cluster index must clamp into the valid 0..k-1 range."""
    triples = [(i, i + 1, 1.0) for i in range(7)]
    nw = spark.createDataFrame(
        [(3, 8.0)] + [(i, 0.0) for i in range(8) if i != 3],
        "vid long, node_weight double",
    )
    rows = parline(
        make_edges(spark, triples),
        ParlineConfig(num_clusters=3, use_node_weights=True),
        node_weights=nw,
    ).collect()
    assert len(rows) == 8 and all(0 <= r["cluster"] <= 2 for r in rows)
