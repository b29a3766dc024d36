"""Correlation clustering / Louvain vs a sequential oracle replicating
the engine's deterministic synchronous semantics exactly (see
graph_mining_spark/operators/correlation.py; reference objective
correlation_util.h:93-141, move rule parallel_correlation_util.cc:521-605).

Edge weights in fixtures are multiples of 0.25 so double summation is
exact regardless of Spark's partial-aggregation order.
"""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from graph_mining_spark.operators.correlation import (
    CorrelationConfig,
    correlation_cluster,
    correlation_objective,
    modularity_cluster,
)
from tests.conftest import make_edges
from tests.oracles import canonicalize_clusters, seeded_er_edges


def _sym_adj(und_edges):
    """Both-orientations adjacency with max-weight dedup (engine
    symmetrize semantics)."""
    adj = defaultdict(dict)
    for u, v, w in und_edges:
        if u == v:
            continue
        adj[u][v] = max(adj[u].get(v, float("-inf")), w)
        adj[v][u] = max(adj[v].get(u, float("-inf")), w)
    return adj


def _uni_move_rounds(cur_nodes, adj, nw, lab, res, off, inner, blocks):
    """Inner best-move rounds (block sweeps under block_async) — the
    sequential replica of the engine's _iterate_moves.  Returns
    (labels, total_moves)."""
    total = 0
    for _round in range(inner):
        moved = 0
        for b in range(blocks):
            K = defaultdict(float)
            cnt = defaultdict(int)
            for v in cur_nodes:
                K[lab[v]] += nw[v]
                cnt[lab[v]] += 1
            new_lab = dict(lab)
            for u in cur_nodes:
                if blocks > 1 and u % blocks != b:
                    continue
                a = lab[u]
                k = nw[u]
                s = defaultdict(float)
                for v, w in adj.get(u, {}).items():
                    s[lab[v]] += w - off
                s_a = s.get(a, 0.0)
                leave = s_a - res * k * (K[a] - k)
                delta_new = -leave
                best = None  # (delta, cluster)
                for c, sc in s.items():
                    if c == a:
                        continue
                    if cnt[a] == 1 and cnt[c] == 1 and c > a:
                        continue  # singleton-swap guard
                    d = sc - res * k * K[c] - leave
                    if best is None or d > best[0] or (d == best[0] and c < best[1]):
                        best = (d, c)
                if best is not None and best[0] > delta_new and best[0] > 0:
                    new_lab[u] = best[1]
                    moved += 1
                elif delta_new > 0:
                    new_lab[u] = -(u + 1)
                    moved += 1
            lab = new_lab
        total += moved
        if moved == 0:
            break
    return lab, total


def louvain_sync_oracle(
    vids, und_edges, res=0.0, off=0.0, levels=10, inner=10, node_weights=None,
    blocks=1, refine=False,
):
    """Sequential replica of correlation_cluster: snapshot-synchronous
    best moves with the singleton-swap guard, fresh label -(vid+1),
    SUM contraction, min-vid canonical output.

    ``blocks > 1`` replicates move_schedule="block_async": each inner
    round sweeps the ``blocks`` vertex blocks (``vid % blocks``, Python
    ``%`` ≡ Spark ``pmod`` for a positive modulus even on the negative
    contracted ids) sequentially; cluster aggregates are rebuilt from
    the CURRENT labels at the start of every block, exactly as the
    engine's per-block ``best_moves`` call recomputes ``cw``.

    ``refine=True`` replicates use_refinement: snapshot every
    contracted level, then walk coarse->fine seeding each level with
    its local clustering composed with the refined coarser labels and
    re-running the move rounds on that level's graph."""
    vids = list(vids)
    adj = _sym_adj(und_edges)
    glob = {v: v for v in vids}  # original vid -> current-level node
    cur_nodes = list(vids)
    nw = dict(node_weights) if node_weights else {v: 1.0 for v in cur_nodes}

    snaps = []
    lab = {v: v for v in cur_nodes}
    for level in range(levels):
        lab = {v: v for v in cur_nodes}
        lab, level_moved = _uni_move_rounds(
            cur_nodes, adj, nw, lab, res, off, inner, blocks
        )
        if level_moved == 0:
            break
        glob = {v: lab[glob[v]] for v in glob}
        if level + 1 >= levels:
            break
        if refine:
            snaps.append((cur_nodes, adj, dict(nw), dict(lab)))
        # contract: SUM inter-cluster weights, sum node weights
        new_adj = defaultdict(dict)
        new_nw = defaultdict(float)
        for v in cur_nodes:
            new_nw[lab[v]] += nw[v]
        for u in cur_nodes:
            for v, w in adj.get(u, {}).items():
                cu, cv = lab[u], lab[v]
                if cu != cv:
                    new_adj[cu][cv] = new_adj[cu].get(cv, 0.0) + w
        adj = new_adj
        cur_nodes = sorted(new_nw)
        nw = dict(new_nw)

    if refine and snaps:
        refined = dict(lab)
        for nodes_i, adj_i, nw_i, loc_i in reversed(snaps):
            seed = {u: refined[loc_i[u]] for u in nodes_i}
            refined, _ = _uni_move_rounds(
                nodes_i, adj_i, nw_i, seed, res, off, inner, blocks
            )
        glob = {v: refined[v] for v in vids}

    # canonicalize: min member vid
    members = defaultdict(list)
    for v, c in glob.items():
        members[c].append(v)
    return {v: min(members[c]) for v, c in glob.items()}


def _spark_labels(df):
    return {r["vid"]: r["label"] for r in df.collect()}


def _bip_move_rounds(cur_nodes, adj, nw, pt, lab, res, off, inner, blocks):
    """Part-aware inner best-move rounds (see _uni_move_rounds)."""
    total = 0
    for _round in range(inner):
        moved = 0
        for b in range(blocks):
            Kp = defaultdict(float)
            cnt = defaultdict(int)
            for v in cur_nodes:
                Kp[(lab[v], pt[v])] += nw[v]
                cnt[lab[v]] += 1
            new_lab = dict(lab)
            for u in cur_nodes:
                if blocks > 1 and u % blocks != b:
                    continue
                a, k, p = lab[u], nw[u], pt[u]
                s = defaultdict(float)
                for v, w in adj.get(u, {}).items():
                    s[lab[v]] += w - off
                leave = s.get(a, 0.0) - res * k * Kp.get((a, 1 - p), 0.0)
                delta_new = -leave
                best = None
                for c, sc in s.items():
                    if c == a:
                        continue
                    if cnt[a] == 1 and cnt[c] == 1 and c > a:
                        continue
                    d = sc - res * k * Kp.get((c, 1 - p), 0.0) - leave
                    if best is None or d > best[0] or (d == best[0] and c < best[1]):
                        best = (d, c)
                if best is not None and best[0] > delta_new and best[0] > 0:
                    new_lab[u] = best[1]
                    moved += 1
                elif delta_new > 0:
                    new_lab[u] = -(u + 1)
                    moved += 1
            lab = new_lab
        total += moved
        if moved == 0:
            break
    return lab, total


def louvain_bipartite_oracle(
    vids, und_edges, part_of, res=0.0, off=0.0, levels=10, inner=10, blocks=1,
    refine=False,
):
    """Sequential replica of the bipartite-objective path: penalties use
    only the opposite-part cluster weight; contraction groups by
    (cluster, part) with new ids 2·L+part (L = min original member) and
    both part-nodes start the next level co-clustered."""
    vids = list(vids)
    adj = _sym_adj(und_edges)
    node_of = {v: v for v in vids}
    cur_nodes = list(vids)
    nw = {v: 1.0 for v in cur_nodes}
    pt = {v: part_of[v] for v in cur_nodes}
    lab = {v: v for v in cur_nodes}

    snaps = []
    for level in range(levels):
        lab, level_moved = _bip_move_rounds(
            cur_nodes, adj, nw, pt, lab, res, off, inner, blocks
        )
        if level_moved == 0 or level + 1 >= levels:
            break
        # contraction by (cluster, part)
        members = defaultdict(list)
        for ov, node in node_of.items():
            members[lab[node]].append(ov)
        L = {c: min(ms) for c, ms in members.items()}
        nn = {v: 2 * L[lab[v]] + pt[v] for v in cur_nodes}
        if refine:
            snaps.append((cur_nodes, adj, dict(nw), dict(pt), dict(nn)))
        node_of = {ov: nn[node] for ov, node in node_of.items()}
        new_adj = defaultdict(dict)
        new_nw = defaultdict(float)
        new_pt = {}
        init_lab = {}
        for v in cur_nodes:
            new_nw[nn[v]] += nw[v]
            new_pt[nn[v]] = pt[v]
            init_lab[nn[v]] = 2 * L[lab[v]]
        for u in cur_nodes:
            for v, w in adj.get(u, {}).items():
                if nn[u] != nn[v]:
                    new_adj[nn[u]][nn[v]] = new_adj[nn[u]].get(nn[v], 0.0) + w
        adj = new_adj
        cur_nodes = sorted(new_nw)
        nw = dict(new_nw)
        pt = new_pt
        lab = init_lab
        if not any(adj.values()):
            break

    if refine and snaps:
        refined = dict(lab)
        for nodes_i, adj_i, nw_i, pt_i, nn_i in reversed(snaps):
            seed = {u: refined[nn_i[u]] for u in nodes_i}
            refined, _ = _bip_move_rounds(
                nodes_i, adj_i, nw_i, pt_i, seed, res, off, inner, blocks
            )
        members = defaultdict(list)
        for v, c in refined.items():
            members[c].append(v)
        return {v: min(members[c]) for v, c in refined.items()}

    members = defaultdict(list)
    for ov, node in node_of.items():
        members[lab[node]].append(ov)
    return {ov: min(members[lab[node]]) for ov, node in node_of.items()}


def test_two_cliques_weak_bridge(spark):
    # two triangles bridged by one weak edge; offset 0.25 makes the
    # bridge unattractive -> exactly two communities
    tri1 = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    tri2 = [(3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0)]
    bridge = [(2, 3, 0.25)]
    edges = tri1 + tri2 + bridge
    cfg = CorrelationConfig(edge_weight_offset=0.5, resolution=0.0)
    got = _spark_labels(correlation_cluster(make_edges(spark, edges), cfg))
    want = louvain_sync_oracle(range(6), edges, res=0.0, off=0.5)
    assert got == want
    assert canonicalize_clusters(got) == [(0, 1, 2), (3, 4, 5)]


def test_pair_merges_despite_sync(spark):
    # the singleton-swap guard must merge a positive pair (pure sync
    # application would oscillate forever)
    edges = [(0, 1, 1.0)]
    cfg = CorrelationConfig(edge_weight_offset=0.25)
    got = _spark_labels(correlation_cluster(make_edges(spark, edges), cfg))
    assert canonicalize_clusters(got) == [(0, 1)]


@pytest.mark.parametrize("seed,res,off", [(7, 0.0, 0.5), (11, 0.02, 0.25), (23, 0.05, 0.0)])
def test_oracle_parity_er(spark, seed, res, off):
    n = 40
    und = [(u, v, (1 + (u * 7 + v * 3 + seed) % 4) * 0.25) for u, v, _ in seeded_er_edges(n, 0.12, seed=seed)]
    cfg = CorrelationConfig(resolution=res, edge_weight_offset=off,
                            louvain_num_iterations=4, louvain_num_inner_iterations=6)
    got = _spark_labels(
        correlation_cluster(make_edges(spark, und), cfg)
    )
    want = louvain_sync_oracle(range(n), und, res=res, off=off, levels=4, inner=6)
    # vertices with no incident edges: engine derives the vertex set
    # from edges, oracle from range(n) — restrict to common support
    got_common = {v: lab for v, lab in got.items()}
    want_common = {v: want[v] for v in got_common}
    assert canonicalize_clusters(got_common) == canonicalize_clusters(want_common)


def test_block_async_config_validation():
    with pytest.raises(ValueError):
        CorrelationConfig(move_schedule="racy")
    with pytest.raises(ValueError):
        CorrelationConfig(move_schedule="block_async", num_move_blocks=0)


def test_block_async_single_block_equals_sync(spark):
    # B=1 block_async degenerates to the sync schedule exactly
    tri1 = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    tri2 = [(3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0)]
    edges = tri1 + tri2 + [(2, 3, 0.25)]
    sync = _spark_labels(correlation_cluster(
        make_edges(spark, edges),
        CorrelationConfig(edge_weight_offset=0.5),
    ))
    blk = _spark_labels(correlation_cluster(
        make_edges(spark, edges),
        CorrelationConfig(edge_weight_offset=0.5,
                          move_schedule="block_async", num_move_blocks=1),
    ))
    assert sync == blk


@pytest.mark.parametrize("seed,res,off,nblocks", [(7, 0.0, 0.5, 3), (23, 0.05, 0.0, 2)])
def test_block_async_oracle_parity_er(spark, seed, res, off, nblocks):
    # the deterministic Gauss-Seidel schedule must match a sequential
    # replica of the exact same block order (engine: pmod(vid, B) == b
    # sweeps with per-block aggregate rebuild — correlation.py
    # move_schedule="block_async", the Spark analog of the reference's
    # async default, correlation.proto:117-126)
    n = 40
    und = [(u, v, (1 + (u * 7 + v * 3 + seed) % 4) * 0.25)
           for u, v, _ in seeded_er_edges(n, 0.12, seed=seed)]
    cfg = CorrelationConfig(resolution=res, edge_weight_offset=off,
                            louvain_num_iterations=3, louvain_num_inner_iterations=4,
                            move_schedule="block_async", num_move_blocks=nblocks)
    got = _spark_labels(correlation_cluster(make_edges(spark, und), cfg))
    want = louvain_sync_oracle(range(n), und, res=res, off=off,
                               levels=3, inner=4, blocks=nblocks)
    want_common = {v: want[v] for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want_common)


@pytest.mark.parametrize("seed,res,off,nblocks", [(7, 0.0, 0.5, 1), (23, 0.05, 0.0, 2)])
def test_refinement_oracle_parity_er(spark, seed, res, off, nblocks):
    # use_refinement (correlation.proto:128-135): coarse->fine walk
    # re-running move rounds per level must match the sequential
    # replica of the exact same schedule (sync and block_async)
    n = 40
    und = [(u, v, (1 + (u * 7 + v * 3 + seed) % 4) * 0.25)
           for u, v, _ in seeded_er_edges(n, 0.12, seed=seed)]
    sched = "block_async" if nblocks > 1 else "sync"
    cfg = CorrelationConfig(resolution=res, edge_weight_offset=off,
                            louvain_num_iterations=3, louvain_num_inner_iterations=4,
                            move_schedule=sched, num_move_blocks=nblocks,
                            use_refinement=True)
    got = _spark_labels(correlation_cluster(make_edges(spark, und), cfg))
    want = louvain_sync_oracle(range(n), und, res=res, off=off,
                               levels=3, inner=4, blocks=nblocks, refine=True)
    want_common = {v: want[v] for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want_common)


def test_refinement_never_hurts_objective(spark):
    # every refinement move has a positive objective delta computed on
    # the contracted graph, which equals the true delta on the original
    # graph under SUM contraction — so refined >= unrefined always
    from graph_mining_spark.operators.correlation import correlation_objective
    from graph_mining_spark.graph import symmetrize

    n, seed, res, off = 40, 11, 0.02, 0.25
    und = [(u, v, (1 + (u * 7 + v * 3 + seed) % 4) * 0.25)
           for u, v, _ in seeded_er_edges(n, 0.12, seed=seed)]
    e = make_edges(spark, und)
    sym = symmetrize(e)
    base_cfg = dict(resolution=res, edge_weight_offset=off,
                    louvain_num_iterations=3, louvain_num_inner_iterations=4)
    plain = correlation_cluster(e, CorrelationConfig(**base_cfg))
    refined = correlation_cluster(e, CorrelationConfig(**base_cfg, use_refinement=True))
    obj_plain = correlation_objective(sym, plain, resolution=res, edge_weight_offset=off)
    obj_ref = correlation_objective(sym, refined, resolution=res, edge_weight_offset=off)
    assert obj_ref >= obj_plain - 1e-9


def _parts_df(spark, part_of):
    return spark.createDataFrame(
        [(int(v), int(p)) for v, p in part_of.items()], "vid long, part int"
    )


def test_bipartite_objective_does_not_penalize_same_part(spark):
    # star u1—v, u2—v (v part 1; u1,u2 part 0) at res=0.6: the standard
    # objective stops at {v,u1},{u2} (second join costs 1−0.6·2 < 0),
    # the bipartite objective merges all three (only v's weight
    # penalizes: 1−0.6 > 0) — correlation.proto:141-157 semantics
    edges = [(1, 0, 1.0), (2, 0, 1.0)]
    part_of = {0: 1, 1: 0, 2: 0}
    cfg_std = CorrelationConfig(resolution=0.6)
    std = canonicalize_clusters(_spark_labels(correlation_cluster(make_edges(spark, edges), cfg_std)))
    assert all(len(c) <= 2 for c in std)
    cfg_bip = CorrelationConfig(resolution=0.6, use_bipartite_objective=True)
    bip = canonicalize_clusters(_spark_labels(
        correlation_cluster(make_edges(spark, edges), cfg_bip, parts=_parts_df(spark, part_of))
    ))
    assert bip == [(0, 1, 2)]


@pytest.mark.parametrize("seed,res,off", [(2, 0.1, 0.0), (9, 0.3, 0.25), (14, 0.05, 0.5)])
def test_bipartite_oracle_parity(spark, seed, res, off):
    # random bipartite graph: parts 0..n1-1 | n1..n-1, edges cross-part
    import random

    rng = random.Random(seed)
    n1, n2 = 12, 14
    n = n1 + n2
    und = [
        (u, n1 + v, (1 + (u * 5 + v * 11 + seed) % 4) * 0.25)
        for u in range(n1)
        for v in range(n2)
        if rng.random() < 0.25
    ]
    part_of = {v: (0 if v < n1 else 1) for v in range(n)}
    cfg = CorrelationConfig(
        resolution=res, edge_weight_offset=off, use_bipartite_objective=True,
        louvain_num_iterations=4, louvain_num_inner_iterations=6,
    )
    got = _spark_labels(
        correlation_cluster(make_edges(spark, und), cfg, parts=_parts_df(spark, part_of))
    )
    want = louvain_bipartite_oracle(
        range(n), und, part_of, res=res, off=off, levels=4, inner=6
    )
    want = {v: want[v] for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want)


def test_block_async_bipartite_oracle_parity(spark):
    # block schedule threaded through the bipartite-objective loop
    import random

    seed, res, off = 13, 0.3, 0.25
    rng = random.Random(seed)
    n1, n2 = 12, 14
    n = n1 + n2
    und = [
        (u, n1 + v, (1 + (u * 5 + v * 11 + seed) % 4) * 0.25)
        for u in range(n1)
        for v in range(n2)
        if rng.random() < 0.25
    ]
    part_of = {v: (0 if v < n1 else 1) for v in range(n)}
    cfg = CorrelationConfig(
        resolution=res, edge_weight_offset=off, use_bipartite_objective=True,
        louvain_num_iterations=3, louvain_num_inner_iterations=4,
        move_schedule="block_async", num_move_blocks=2,
    )
    got = _spark_labels(
        correlation_cluster(make_edges(spark, und), cfg, parts=_parts_df(spark, part_of))
    )
    want = louvain_bipartite_oracle(
        range(n), und, part_of, res=res, off=off, levels=3, inner=4, blocks=2
    )
    want = {v: want[v] for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want)


def test_refinement_bipartite_oracle_parity(spark):
    import random

    seed, res, off = 29, 0.3, 0.25
    rng = random.Random(seed)
    n1, n2 = 12, 14
    n = n1 + n2
    und = [
        (u, n1 + v, (1 + (u * 5 + v * 11 + seed) % 4) * 0.25)
        for u in range(n1)
        for v in range(n2)
        if rng.random() < 0.25
    ]
    part_of = {v: (0 if v < n1 else 1) for v in range(n)}
    cfg = CorrelationConfig(
        resolution=res, edge_weight_offset=off, use_bipartite_objective=True,
        louvain_num_iterations=3, louvain_num_inner_iterations=4,
        use_refinement=True,
    )
    got = _spark_labels(
        correlation_cluster(make_edges(spark, und), cfg, parts=_parts_df(spark, part_of))
    )
    want = louvain_bipartite_oracle(
        range(n), und, part_of, res=res, off=off, levels=3, inner=4, refine=True
    )
    want = {v: want[v] for v in got}
    assert canonicalize_clusters(got) == canonicalize_clusters(want)


def test_bipartite_requires_parts(spark):
    with pytest.raises(ValueError):
        correlation_cluster(
            make_edges(spark, [(0, 1, 1.0)]),
            CorrelationConfig(use_bipartite_objective=True),
        )


def test_objective_improves_over_singletons(spark):
    n = 30
    und = [(u, v, 1.0) for u, v, _ in seeded_er_edges(n, 0.15, seed=3)]
    e = make_edges(spark, und)
    from graph_mining_spark.graph import symmetrize, vertex_ids

    sym = symmetrize(e)
    cfg = CorrelationConfig(edge_weight_offset=0.5, resolution=0.01)
    labels = correlation_cluster(sym, cfg, already_symmetric=True)
    singletons = vertex_ids(sym).select("vid", F.col("vid").alias("label"))
    obj_clustered = correlation_objective(sym, labels, resolution=0.01, edge_weight_offset=0.5)
    obj_singletons = correlation_objective(sym, singletons, resolution=0.01, edge_weight_offset=0.5)
    assert obj_clustered >= obj_singletons


def test_modularity_recovers_planted_partition(spark):
    # two dense blocks (p_in high) with a few cross edges
    import random

    rng = random.Random(5)
    edges = []
    for block, lo in ((0, 0), (1, 10)):
        for i in range(lo, lo + 10):
            for j in range(i + 1, lo + 10):
                if rng.random() < 0.8:
                    edges.append((i, j, 1.0))
    edges += [(2, 13, 1.0), (5, 17, 1.0)]
    labels = _spark_labels(modularity_cluster(make_edges(spark, edges), resolution=1.0))
    clusters = canonicalize_clusters(labels)
    assert len(clusters) == 2
    assert set(clusters[0]) == set(range(10))
    assert set(clusters[1]) == set(range(10, 20))


def test_resolution_zero_acts_like_components(spark):
    # proto note (modularity.proto:24-27): resolution 0 recovers
    # connected components (every positive edge wants to merge)
    edges = [(0, 1, 1.0), (1, 2, 1.0), (5, 6, 1.0)]
    labels = _spark_labels(modularity_cluster(make_edges(spark, edges), resolution=0.0))
    assert canonicalize_clusters(labels) == [(0, 1, 2), (5, 6)]
