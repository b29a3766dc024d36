"""ParHac vs a sequential average-linkage HAC oracle.

With ε = 0 and all-distinct similarities every bucketed round merges
exactly the global argmax edge, so the engine must reproduce the
sequential merge sequence EXACTLY (same pairs, same similarities, same
order).  With ε > 0 the (1+ε) contract is asserted instead: every
merge's similarity ≥ W_max-at-merge-time / (1+ε).

Reference semantics: parhac.h:40-79; dendrogram contract
dendrogram.h:75-96 (parent > child, internal ids in [n, 2n-1), fanout
2, positive similarities).
"""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from graph_mining_spark.operators.hac import ParHacConfig, hac_merge_sequence, parhac
from tests.conftest import make_edges
from tests.oracles import canonicalize_clusters, seeded_er_edges


def sequential_avg_hac(n, und_edges, threshold=1e-9):
    """Exact sequential average-linkage HAC: merge the argmax-similarity
    pair (ties: smaller src, then smaller dst) until below threshold.
    Returns the merge list [(child_a, child_b, sim, parent_id)] with
    parent ids n, n+1, ... in merge order."""
    # engine symmetrize uses MAX dedup for parallel edges
    dedup = {}
    for u, v, w in und_edges:
        if u == v:
            continue
        k = (min(u, v), max(u, v))
        dedup[k] = max(dedup.get(k, float("-inf")), w)
    raw = dict(dedup)
    size = {i: 1 for i in range(n)}
    alive = set(range(n))
    merges = []
    next_id = n
    while True:
        best = None
        for (a, b), w in raw.items():
            s = w / (size[a] * size[b])
            if best is None or s > best[0] or (s == best[0] and (a, b) < (best[1], best[2])):
                best = (s, a, b)
        if best is None or best[0] < threshold:
            break
        s, a, b = best
        p = next_id
        next_id += 1
        merges.append((a, b, s, p))
        # contract: new cluster p with summed raw weights
        size[p] = size[a] + size[b]
        alive.discard(a)
        alive.discard(b)
        alive.add(p)
        new_raw = defaultdict(float)
        for (x, y), w in raw.items():
            nx = p if x in (a, b) else x
            ny = p if y in (a, b) else y
            if nx == ny:
                continue
            new_raw[(min(nx, ny), max(nx, ny))] += w
        raw = dict(new_raw)
    return merges


def test_exact_parity_distinct_weights(spark):
    # distinct weights -> every round merges exactly one pair: the
    # engine's merge sequence must equal the sequential oracle's
    n = 12
    und = []
    k = 1
    for u, v, _ in seeded_er_edges(n, 0.35, seed=13):
        und.append((u, v, 1.0 + 0.013 * k))  # all distinct
        k += 1
    dendro, labels = parhac(make_edges(spark, und), ParHacConfig(epsilon=0.0, linkage_threshold=0.05))
    got = [
        (tuple(r["children"]), round(r["sim"], 9), r["parent_id"])
        for r in hac_merge_sequence(dendro).collect()
    ]
    want = [
        ((min(a, b), max(a, b)), round(s, 9), p)
        for a, b, s, p in sequential_avg_hac(n, und, threshold=0.05)
    ]
    assert [(c, s) for c, s, _ in got] == [(c, s) for c, s, _ in want]
    # parent ids identical too (assignment order = merge order here)
    assert got == want


def test_dendrogram_contract(spark):
    und = [(u, v, (1 + (u + v) % 5) * 0.25) for u, v, _ in seeded_er_edges(20, 0.25, seed=3)]
    dendro, labels = parhac(make_edges(spark, und), ParHacConfig(epsilon=0.2, linkage_threshold=0.05))
    rows = dendro.collect()
    n = 20
    children_of = defaultdict(list)
    for r in rows:
        if r["parent_id"] is not None:
            # parent strictly greater than child, internal id space
            assert r["parent_id"] > r["node_id"]
            assert r["parent_id"] >= n
            assert r["merge_similarity"] > 0
            children_of[r["parent_id"]].append(r["node_id"])
    for p, ch in children_of.items():
        assert len(ch) == 2  # binary merges
    # every leaf appears exactly once
    ids = [r["node_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_epsilon_contract_and_flat_labels(spark):
    # two cliques with a weak bridge: threshold above the bridge weight
    # must produce exactly the two cliques as flat clusters
    tri1 = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    tri2 = [(3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0)]
    bridge = [(2, 3, 0.1)]
    dendro, labels = parhac(
        make_edges(spark, tri1 + tri2 + bridge), ParHacConfig(epsilon=0.1, linkage_threshold=0.3)
    )
    got = {r["vid"]: r["label"] for r in labels.collect()}
    assert canonicalize_clusters(got) == [(0, 1, 2), (3, 4, 5)]


def test_singleton_graph(spark):
    e = spark.createDataFrame([], "src long, dst long, weight double")
    dendro, labels = parhac(e, ParHacConfig())
    assert labels.count() == 0
