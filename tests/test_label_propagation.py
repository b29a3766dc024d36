"""Synchronous weighted LPA vs an exact sequential oracle."""

from graph_mining_spark.operators.label_propagation import label_propagation
from tests.conftest import make_edges
from tests.oracles import seeded_er_edges


def _labels(df):
    return {r["vid"]: r["label"] for r in df.collect()}


def int_weighted(triples):
    """Integer-valued weights (1..11): vote sums stay EXACT, so the
    (sum desc, label asc) argmax cannot flip on float-addition order
    between Spark's partial aggregation and the sequential oracle —
    the same rule the property suite follows."""
    return [(u, v, float(1 + int(w))) for u, v, w in triples]


def lpa_oracle(triples, iters, vids=None, stop_on_cycle=True):
    """Exact sequential twin of the operator's synchronous semantics:
    symmetrize (max-dedup), drop self-loops, vote on the PREVIOUS
    round's labels, argmax by (weight desc, label asc), isolated
    vertices keep their label, stop on fixpoint, on the period-2
    terminal cycle (L_t == L_{t-2}, returning the current phase), or
    after ``iters``."""
    und = {}
    for u, v, w in triples:
        if u == v:
            continue
        k = (min(u, v), max(u, v))
        und[k] = max(und.get(k, float("-inf")), w)
    adj = {}
    for (u, v), w in und.items():
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    vids = set(vids) if vids is not None else set(adj)
    labels = {v: v for v in vids}
    prev2 = None
    for _ in range(iters):
        new = {}
        for v in vids:
            votes = {}
            for u, w in adj.get(v, ()):
                lab = labels[u]
                votes[lab] = votes.get(lab, 0.0) + w
            new[v] = min(votes, key=lambda l: (-votes[l], l)) if votes else labels[v]
        if new == labels:
            break
        if stop_on_cycle and new == prev2:
            labels = new
            break
        prev2, labels = labels, new
    return labels


def test_disjoint_cliques_converge_to_min_labels(spark):
    # two cliques: round 1 elects (min, second-min) per clique, round 2
    # is a strict majority for the min, round 3 confirms convergence
    k5a = [(u, v, 1.0) for u in range(5) for v in range(u + 1, 5)]
    k4b = [(u, v, 1.0) for u in range(10, 14) for v in range(u + 1, 14)]
    labs = _labels(label_propagation(make_edges(spark, k5a + k4b), max_iterations=20))
    assert labs == {**{i: 0 for i in range(5)}, **{i: 10 for i in range(10, 14)}}


def test_single_edge_oscillates_and_terminates(spark):
    # sync LPA 2-cycles on one edge: the loop must terminate (cycle
    # detection at round 2) and match the oracle's identical rule
    e = make_edges(spark, [(0, 1, 1.0)])
    assert _labels(label_propagation(e, max_iterations=5)) == lpa_oracle(
        [(0, 1, 1.0)], 5
    )
    assert _labels(label_propagation(e, max_iterations=4)) == lpa_oracle(
        [(0, 1, 1.0)], 4
    )


def test_weighted_votes_beat_counts(spark):
    # vertex 2 has two neighbors labeled 0 (weight 1 each) and one
    # neighbor labeled 9 (weight 5): the weighted vote must pick 9
    triples = [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (2, 9, 5.0)]
    labs = _labels(label_propagation(make_edges(spark, triples), max_iterations=1))
    assert labs[2] == 9
    assert labs == lpa_oracle(triples, 1)


def test_er_graphs_match_sequential_oracle(spark):
    for seed in (3, 11):
        triples = int_weighted(seeded_er_edges(40, 0.08, seed=seed, weighted=True))
        e = make_edges(spark, triples)
        for iters in (1, 2, 5):
            assert _labels(label_propagation(e, max_iterations=iters)) == lpa_oracle(
                triples, iters
            ), (seed, iters)


def test_isolated_vertices_and_self_loops(spark):
    triples = [(1, 2, 1.0), (3, 3, 9.0)]
    verts = spark.createDataFrame([(0,), (1,), (2,), (3,)], "vid long")
    labs = _labels(
        label_propagation(make_edges(spark, triples), vertices=verts, max_iterations=3)
    )
    # 3's only edge is a self-loop → isolated; 0 has no edges
    assert labs == lpa_oracle(triples, 3, vids=[0, 1, 2, 3])
    assert labs[0] == 0 and labs[3] == 3


def test_partition_invariance(spark):
    triples = int_weighted(seeded_er_edges(30, 0.1, seed=5, weighted=True))
    e1 = make_edges(spark, triples).repartition(1)
    e7 = make_edges(spark, triples).repartition(7)
    assert _labels(label_propagation(e1, max_iterations=3)) == _labels(
        label_propagation(e7, max_iterations=3)
    )


def test_delta_path_matches_full_recompute(spark):
    # same labels whether the frontier optimization is off (threshold
    # 0), aggressive (huge threshold: delta from round 2 on), or tiny
    # (threshold 2: exercises the changed-hub fallback when the
    # frontier's neighborhood outgrows the broadcast bound)
    for seed in (3, 11):
        triples = int_weighted(seeded_er_edges(40, 0.08, seed=seed, weighted=True))
        e = make_edges(spark, triples)
        for iters in (2, 6):
            want = _labels(label_propagation(e, max_iterations=iters, broadcast_threshold=0))
            assert want == lpa_oracle(triples, iters), (seed, iters)
            for thr in (2, 1 << 20):
                got = _labels(
                    label_propagation(e, max_iterations=iters, broadcast_threshold=thr, delta_min_edges=0)
                )
                assert got == want, (seed, iters, thr)


def test_delta_round_skips_settled_voters(spark):
    # two far-apart cliques: after the cliques settle, an appended
    # pendant chain keeps a small frontier moving — delta rounds must
    # reproduce the full-recompute labels exactly while it propagates
    k5 = [(u, v, 1.0) for u in range(5) for v in range(u + 1, 5)]
    k4 = [(u, v, 1.0) for u in range(10, 14) for v in range(u + 1, 14)]
    chain = [(4, 20, 0.5), (20, 21, 0.5), (21, 22, 0.5), (22, 23, 0.5)]
    triples = k5 + k4 + chain
    e = make_edges(spark, triples)
    for iters in (3, 8):
        assert _labels(
            label_propagation(e, max_iterations=iters, broadcast_threshold=1 << 20, delta_min_edges=0)
        ) == lpa_oracle(triples, iters), iters


def test_cycle_detection_stops_early_and_matches(spark):
    # single edge: L2 == L0, so the loop must stop at round 2 with the
    # current phase (the identity) no matter how large the budget —
    # and stop_on_cycle=False must reproduce the raw fixed-round labels
    e = make_edges(spark, [(0, 1, 1.0)])
    assert _labels(label_propagation(e, max_iterations=50)) == {0: 0, 1: 1}
    assert _labels(
        label_propagation(e, max_iterations=5, stop_on_cycle=False)
    ) == lpa_oracle([(0, 1, 1.0)], 5, stop_on_cycle=False) == {0: 1, 1: 0}


def test_cycle_detection_on_er_graphs(spark):
    # graphs that enter a 2-cycle mid-run: engine and oracle must agree
    # with detection on AND off
    for seed in (3, 11):
        triples = int_weighted(seeded_er_edges(40, 0.08, seed=seed, weighted=True))
        e = make_edges(spark, triples)
        assert _labels(label_propagation(e, max_iterations=12)) == lpa_oracle(
            triples, 12
        ), seed
        assert _labels(
            label_propagation(e, max_iterations=4, stop_on_cycle=False)
        ) == lpa_oracle(triples, 4, stop_on_cycle=False), seed
