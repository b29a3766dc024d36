"""Coconductance clustering vs a sequential oracle replicating the
engine's deterministic synchronous semantics exactly (objective and
move delta per coconductance_internal.cc:48-74, ClusterObjective
coconductance_internal.h:60-66)."""

from collections import defaultdict

import pytest

from graph_mining_spark.operators.coconductance import (
    CoconductanceConfig,
    coconductance_cluster,
    coconductance_objective,
)
from tests.conftest import make_edges
from tests.oracles import canonicalize_clusters, seeded_er_edges


def _obj(e, w, p):
    if w < 1e-6:
        return 0.0
    return (2.0 * e / w) ** p


def coconductance_sync_oracle(vids, und_edges, p=1.0, levels=10, inner=10):
    """Sequential replica: snapshot-sync best moves (ties prefer an
    existing cluster, then smaller id; singleton-swap guard), SUM
    contraction carrying internal weights, min-vid canonical output."""
    # symmetrize max-dedup; self-loops carry once into vol and into
    # the initial internal weight (reference InitialState /
    # WeightedDegree semantics)
    dedup = {}
    loop_of = {}
    for u, v, w in und_edges:
        if u == v:
            loop_of[u] = max(loop_of.get(u, float("-inf")), w)
            continue
        k = (min(u, v), max(u, v))
        dedup[k] = max(dedup.get(k, float("-inf")), w)
    adj = defaultdict(dict)
    for (u, v), w in dedup.items():
        adj[u][v] = w
        adj[v][u] = w
    vids = list(vids)
    glob = {v: v for v in vids}
    cur_nodes = [v for v in vids]
    w_of = {v: sum(adj[v].values()) + loop_of.get(v, 0.0) for v in cur_nodes}
    int_of = {v: loop_of.get(v, 0.0) for v in cur_nodes}

    for _level in range(levels):
        lab = {v: v for v in cur_nodes}
        # collision-free fresh-label blocks (must match the engine)
        mn, mx = min(cur_nodes), max(cur_nodes)
        span = mx - mn + 1
        base = min(0, mn)
        level_moved = 0
        for _round in range(inner):
            W = defaultdict(float)
            I = defaultdict(float)
            cnt = defaultdict(int)
            for v in cur_nodes:
                W[lab[v]] += w_of[v]
                I[lab[v]] += int_of[v]
                cnt[lab[v]] += 1
            # intra per cluster
            SA = defaultdict(float)
            for u in cur_nodes:
                for v, w in adj.get(u, {}).items():
                    if lab[v] == lab[u]:
                        SA[lab[u]] += w
            E = {c: I[c] + SA.get(c, 0.0) / 2 for c in set(lab.values())}
            new_lab = {}
            moved = 0
            for u in cur_nodes:
                a = lab[u]
                s = defaultdict(float)
                for v, w in adj.get(u, {}).items():
                    s[lab[v]] += w
                s_a = s.get(a, 0.0)
                oa = _obj(E.get(a, 0.0), W[a], p)
                oa_minus = _obj(E.get(a, 0.0) - s_a - int_of[u], W[a] - w_of[u], p)
                best = None  # (delta, cluster)
                for c, sc in s.items():
                    if c == a:
                        continue
                    if cnt[a] == 1 and cnt[c] == 1 and c > a:
                        continue
                    d = (
                        oa_minus
                        + _obj(E.get(c, 0.0) + sc + int_of[u], W[c] + w_of[u], p)
                        - oa
                        - _obj(E.get(c, 0.0), W[c], p)
                    )
                    if best is None or d > best[0] or (d == best[0] and c < best[1]):
                        best = (d, c)
                d_new = oa_minus + _obj(int_of[u], w_of[u], p) - oa
                if best is not None and best[0] >= d_new and best[0] > 0:
                    new_lab[u] = best[1]
                    moved += 1
                elif d_new > 0:
                    new_lab[u] = base - 1 - _round * span - (u - mn)
                    moved += 1
                else:
                    new_lab[u] = a
            lab = new_lab
            level_moved += moved
            if moved == 0:
                break
        if level_moved == 0:
            break
        glob = {v: lab[glob[v]] for v in glob}
        # contract
        new_adj = defaultdict(dict)
        new_w = defaultdict(float)
        new_int = defaultdict(float)
        intra2 = defaultdict(float)
        for v in cur_nodes:
            new_w[lab[v]] += w_of[v]
            new_int[lab[v]] += int_of[v]
        for u in cur_nodes:
            for v, w in adj.get(u, {}).items():
                cu, cv = lab[u], lab[v]
                if cu != cv:
                    new_adj[cu][cv] = new_adj[cu].get(cv, 0.0) + w
                else:
                    intra2[cu] += w
        for c in intra2:
            new_int[c] += intra2[c] / 2
        adj = new_adj
        cur_nodes = sorted(new_w)
        w_of = dict(new_w)
        int_of = dict(new_int)

    members = defaultdict(list)
    for v, c in glob.items():
        members[c].append(v)
    return {v: min(members[c]) for v, c in glob.items()}


def _labels(df):
    return {r["vid"]: r["label"] for r in df.collect()}


def test_two_dense_blocks(spark):
    import random

    rng = random.Random(3)
    edges = []
    for lo in (0, 8):
        for i in range(lo, lo + 8):
            for j in range(i + 1, lo + 8):
                if rng.random() < 0.85:
                    edges.append((i, j, 1.0))
    edges.append((3, 11, 0.25))
    got = _labels(coconductance_cluster(make_edges(spark, edges), CoconductanceConfig(exponent=1.0)))
    clusters = canonicalize_clusters(got)
    assert (0, 1, 2, 3, 4, 5, 6, 7) in clusters or len(clusters) <= 3


@pytest.mark.parametrize("seed,p", [(5, 1.0), (9, 2.0)])
def test_oracle_parity(spark, seed, p):
    n = 30
    und = [(u, v, (1 + (u * 3 + v + seed) % 4) * 0.25) for u, v, _ in seeded_er_edges(n, 0.15, seed=seed)]
    cfg = CoconductanceConfig(exponent=p, num_levels=3, num_inner_iterations=5)
    got = _labels(coconductance_cluster(make_edges(spark, und), cfg))
    want = coconductance_sync_oracle(range(n), und, p=p, levels=3, inner=5)
    want = {v: want[v] for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want)


@pytest.mark.parametrize("seed,p", [(7, 1.0)])
def test_oracle_parity_with_self_loops(spark, seed, p):
    """Input self-loops: ℓ_u counts once into vol and seeds the
    internal weight (reference InitialState), so clusterings with
    loops must still match the sequential replica."""
    n = 24
    und = [(u, v, (1 + (u * 3 + v + seed) % 4) * 0.25) for u, v, _ in seeded_er_edges(n, 0.18, seed=seed)]
    und += [(u, u, 0.5 + (u % 3) * 0.25) for u in range(0, n, 3)]
    cfg = CoconductanceConfig(exponent=p, num_levels=3, num_inner_iterations=5)
    got = _labels(coconductance_cluster(make_edges(spark, und), cfg))
    want = coconductance_sync_oracle(range(n), und, p=p, levels=3, inner=5)
    want = {v: want[v] for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want)


def test_objective_counts_self_loops(spark):
    """A lone vertex with only a self-loop: vol = ℓ, E = ℓ, so the
    singleton objective is (2ℓ/ℓ)^p = 2^p."""
    e = make_edges(spark, [(0, 0, 3.0)])
    labels = coconductance_cluster(e)
    got = _labels(labels)
    assert got == {0: 0}
    assert abs(coconductance_objective(e, labels, exponent=2.0) - 4.0) < 1e-9


def test_objective_improves_over_singletons(spark):
    und = [(u, v, 1.0) for u, v, _ in seeded_er_edges(24, 0.2, seed=8)]
    e = make_edges(spark, und)
    from pyspark.sql import functions as F

    from graph_mining_spark.graph import symmetrize, vertex_ids

    sym = symmetrize(e)
    labels = coconductance_cluster(sym, CoconductanceConfig(exponent=1.0), already_symmetric=True)
    singles = vertex_ids(sym).select("vid", F.col("vid").alias("label"))
    assert coconductance_objective(sym, labels) >= coconductance_objective(sym, singles) - 1e-9
