"""Property-based invariant tests (hypothesis) over small random
graphs — complements the fixed-seed oracle suites by letting the
strategy explore degenerate shapes (duplicate rows, both orientations,
self-loops, multi-components, isolated stars) with automatic
shrinking.  Each engine result is compared against a pure-Python
oracle.  ``derandomize=True`` keeps every CI run reproducible;
``max_examples`` is small because each example runs real Spark jobs.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import make_edges

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(
        st.integers(0, 12),
        st.integers(0, 12),
        st.floats(0.1, 10.0, allow_nan=False, allow_infinity=False).map(
            lambda w: round(w, 3)
        ),
    ),
    min_size=1,
    max_size=30,
)


def _und_max(triples):
    """Oracle for symmetrize(agg='max'): unordered pair → max weight,
    self-loops dropped."""
    best = {}
    for u, v, w in triples:
        if u == v:
            continue
        k = (min(u, v), max(u, v))
        best[k] = max(best.get(k, float("-inf")), w)
    return best


@given(triples=edge_lists)
@settings(**_SETTINGS)
def test_symmetrize_max_dedup(spark, triples):
    from graph_mining_spark.graph import symmetrize

    want = _und_max(triples)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in symmetrize(make_edges(spark, triples)).collect()
    }
    expect = {}
    for (u, v), w in want.items():
        expect[(u, v)] = w
        expect[(v, u)] = w
    assert got == expect


@given(triples=edge_lists)
@settings(**_SETTINGS)
def test_connected_components_match_union_find(spark, triples):
    from graph_mining_spark.operators.connected_components import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # the engine's vertex set is ALL raw-edge endpoints — a vertex
    # whose only edge is a self-loop stays a singleton component
    verts = set()
    for u, v, _ in triples:
        verts.update((u, v))
        if u == v:
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp = defaultdict(list)
    for x in verts:
        comp[find(x)].append(x)
    want = {x: min(comp[find(x)]) for x in verts}
    got = {
        r["vid"]: r["label"]
        for r in connected_components(make_edges(spark, triples)).collect()
    }
    assert got == want


@given(triples=edge_lists, damping=st.sampled_from([0.5, 0.85]))
@settings(**_SETTINGS)
def test_pagerank_mass_conserved(spark, triples, damping):
    """Rank mass sums to 1 on ANY directed graph the strategy makes —
    dangling vertices (dst-only), self-loops, duplicates included."""
    from graph_mining_spark.operators.pagerank import pagerank

    if all(u == v for u, v, _ in triples):
        return
    total = (
        pagerank(make_edges(spark, triples), damping=damping, max_iterations=8)
        .agg(F.sum("rank"))
        .first()[0]
    )
    assert abs(total - 1.0) < 1e-6


@given(triples=edge_lists)
@settings(**_SETTINGS)
def test_triangle_counts_match_bruteforce(spark, triples):
    from graph_mining_spark.operators.triangles import triangle_counts

    und = _und_max(triples)
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    # every raw endpoint appears in the output (0 for triangle-free,
    # including self-loop-only vertices)
    all_verts = sorted({x for u, v, _ in triples for x in (u, v)})
    verts = sorted(adj)
    want = {x: 0 for x in all_verts}
    for i, a in enumerate(verts):
        for b in (x for x in verts[i + 1 :] if x in adj[a]):
            for c in (x for x in verts if x > b and x in adj[a] and x in adj[b]):
                want[a] += 1
                want[b] += 1
                want[c] += 1
    got = {
        r["vid"]: r["triangles"]
        for r in triangle_counts(make_edges(spark, triples)).collect()
    }
    assert got == want


@given(triples=edge_lists)
@settings(**_SETTINGS)
def test_sssp_matches_dijkstra(spark, triples):
    """Directed distances from the smallest src vid, reachable set and
    values both exact (weights are 3-decimal, sums stay exact in
    binary-rounded comparison at 1e-9)."""
    from graph_mining_spark.operators.shortest_paths import sssp

    srcs = [u for u, v, _ in triples]
    source = min(srcs)
    adj = defaultdict(list)
    for u, v, w in triples:
        adj[u].append((v, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        d, x = heapq.heappop(pq)
        if d > dist.get(x, float("inf")):
            continue
        for y, w in adj[x]:
            nd = d + w
            if nd < dist.get(y, float("inf")):
                dist[y] = nd
                heapq.heappush(pq, (nd, y))
    got = {
        r["vid"]: r["distance"]
        for r in sssp(make_edges(spark, triples), source_vid=source).collect()
    }
    assert set(got) == set(dist)
    for x in dist:
        assert abs(got[x] - dist[x]) < 1e-9, x


@given(triples=edge_lists)
@settings(**_SETTINGS)
def test_affinity_labels_form_min_partition(spark, triples):
    """affinity_cluster output is a PARTITION of the vertex set with
    label = min member vid, on any random multigraph shape."""
    from graph_mining_spark.operators.affinity import AffinityConfig, affinity_cluster

    if all(u == v for u, v, _ in triples):
        return
    rows = affinity_cluster(
        make_edges(spark, triples), AffinityConfig(num_iterations=2)
    ).collect()
    verts = {x for u, v, _ in triples if u != v for x in (u, v)}
    got = {r["vid"]: r["label"] for r in rows}
    assert len(rows) == len(got) == len(verts) and set(got) == verts
    members = defaultdict(list)
    for vid, lab in got.items():
        members[lab].append(vid)
    for lab, mem in members.items():
        assert lab == min(mem)


@given(triples=edge_lists, metric=st.sampled_from(["jaccard", "cosine", "common"]))
@settings(**_SETTINGS)
def test_pairwise_similarity_matches_bruteforce(spark, triples, metric):
    from graph_mining_spark.operators.similarity import pairwise_similarity

    und = _und_max(triples)
    nbr = defaultdict(set)
    for u, v in und:
        nbr[u].add(v)
        nbr[v].add(u)
    vs = sorted(nbr)
    want = {}
    for i, a in enumerate(vs):
        for b in vs[i + 1 :]:
            c = len(nbr[a] & nbr[b])
            if not c:
                continue
            if metric == "jaccard":
                s = c / len(nbr[a] | nbr[b])
            elif metric == "cosine":
                s = c / (len(nbr[a]) * len(nbr[b])) ** 0.5
            else:
                s = float(c)
            want[(a, b)] = s
    got = {
        (r["a"], r["b"]): r["similarity"]
        for r in pairwise_similarity(make_edges(spark, triples), metric=metric).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - round(want[k], 6)) < 1e-9, k


doc_texts = st.lists(
    st.lists(st.sampled_from("alpha beta gamma delta eps".split()), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(texts=doc_texts)
@settings(**_SETTINGS)
def test_ngram_jaccard_pairs_match_bruteforce(spark, texts):
    """Word-3-gram Jaccard pairs at threshold 0.2 equal the brute-force
    distinct-shingle-set computation (small word alphabet forces both
    heavy overlap and empty-shingle docs)."""
    from graph_mining_spark.functions.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n = 3
    sets = {}
    for i, t in enumerate(texts):
        toks = t.split()
        sets[i] = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
    want = {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = round(inter / len(sets[a] | sets[b]), 6)
            if j >= 0.2:
                want[(a, b)] = j
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=n, threshold=0.2).collect()
    }
    assert got == want


int_weight_edges = st.lists(
    st.tuples(
        st.integers(0, 12),
        st.integers(0, 12),
        # INTEGER-valued weights: LPA vote sums stay exact, so the
        # (sum desc, label asc) argmax cannot flip on float-addition
        # order between Spark's partial aggregation and the oracle
        st.integers(1, 9).map(float),
    ),
    min_size=1,
    max_size=30,
)


@given(triples=int_weight_edges, iters=st.sampled_from([1, 3]))
@settings(**_SETTINGS)
def test_label_propagation_matches_sequential(spark, triples, iters):
    from graph_mining_spark.operators.label_propagation import label_propagation
    from tests.test_label_propagation import lpa_oracle

    got = {
        (r["vid"]): r["label"]
        for r in label_propagation(make_edges(spark, triples), max_iterations=iters).collect()
    }
    assert got == lpa_oracle(triples, iters)
