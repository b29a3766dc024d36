"""TeraHac vs exact sequential average-linkage HAC.

At ε = 0 the goodness rule max(best(u),best(v))/min(w,mm(u),mm(v)) ≤ 1
only admits mutual-best edges, and average linkage is reducible, so the
flat clustering equals exact sequential HAC at the same threshold —
regardless of how the actives are partitioned (the multi-partition
configuration must agree with the single-partition one)."""

from collections import defaultdict

import pytest

from graph_mining_spark.operators.terahac import TeraHacConfig, terahac
from tests.conftest import make_edges
from tests.oracles import canonicalize_clusters, seeded_er_edges
from tests.test_hac import sequential_avg_hac


def _flat_from_merges(n, merges):
    parent = list(range(n)) + [0] * len(merges)
    for a, b, _s, p in merges:
        parent[p] = p
    uf = {}

    def find(x):
        while uf.get(x, x) != x:
            uf[x] = uf.get(uf[x], uf[x])
            x = uf[x]
        return x

    comp = defaultdict(list)
    cluster_of = {}
    for a, b, _s, p in merges:
        uf[find(a)] = p
        uf[find(b)] = p
    for v in range(n):
        comp[find(v)].append(v)
    for root, members in comp.items():
        m = min(members)
        for v in members:
            cluster_of[v] = m
    return cluster_of


def _labels(df):
    return {r["vid"]: r["label"] for r in df.collect()}


@pytest.mark.parametrize("part_cap", [1 << 20, 4])
def test_eps0_matches_exact_hac(spark, part_cap):
    n = 14
    und = []
    k = 1
    for u, v, _ in seeded_er_edges(n, 0.3, seed=17):
        und.append((u, v, 1.0 + 0.017 * k))
        k += 1
    thr = 0.08
    labels, log = terahac(
        make_edges(spark, und),
        TeraHacConfig(epsilon=0.0, linkage_threshold=thr, partition_max=part_cap),
    )
    got = _labels(labels)
    want = _flat_from_merges(n, sequential_avg_hac(n, und, threshold=thr))
    want = {v: want[v] for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want)


def test_merge_log_structure(spark):
    # structural contracts of the merge log: merges happened, every
    # merge is positive-similarity, maps the larger id onto the smaller
    # (min-member cluster representative), and there are fewer merges
    # than vertices (a forest of merges).  A per-merge lower bound of
    # threshold/(1+eps) is NOT an invariant — like the reference, a
    # cluster built by several in-round merges can chain below it while
    # each step stays (1+eps)-good wrt the landscape at merge time; the
    # approximation gate is the eps=0 exact-parity test above.
    und = [(u, v, (1 + (u + 2 * v) % 5) * 0.25) for u, v, _ in seeded_er_edges(16, 0.3, seed=4)]
    labels, log = terahac(
        make_edges(spark, und), TeraHacConfig(epsilon=0.25, linkage_threshold=0.3, partition_max=6)
    )
    rows = log.collect()
    assert rows, "no merges happened"
    assert all(r["sim"] > 0 for r in rows)
    assert all(r["vid"] > r["label"] for r in rows)
    assert len(rows) < 16


def test_two_cliques_flat(spark):
    tri1 = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    tri2 = [(3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0)]
    bridge = [(2, 3, 0.1)]
    labels, _ = terahac(
        make_edges(spark, tri1 + tri2 + bridge),
        TeraHacConfig(epsilon=0.1, linkage_threshold=0.3),
    )
    assert canonicalize_clusters(_labels(labels)) == [(0, 1, 2), (3, 4, 5)]
