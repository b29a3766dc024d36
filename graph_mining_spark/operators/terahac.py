"""TeraHac — (1+ε)-approximate HAC via per-partition subgraph HAC.

Parity target: /root/reference/in_memory/clustering/hac/terahac.cc:57-160
(TeraHacImplementation), terahac_internal.h:44-140 (subgraph wrapper),
subgraph/approximate_subgraph_hac.cc:56-170 and
approximate_subgraph_hac_graph.h:44-50 (the goodness rule) —
arXiv:2308.03578, the trillion-edge HAC algorithm.  This is the round
shape the paper runs on a cluster, expressed Spark-natively:

  per round (terahac.cc:83-140):
    1. active clusters = those whose best incident similarity exceeds
       linkage_threshold / (1+ε);
    2. partition active clusters with SIZE-CAPPED affinity clustering
       (SizeConstrainedAffinity — our affinity_cluster with a
       SizeConstraint max, reusing operators/size_constraint.py);
    3. per partition, run ApproximateSubgraphHac sequentially on the
       partition's subgraph plus FROZEN boundary neighbors
       (terahac_internal.h: inactive nodes get node weight −1, their
       cluster size never changes): repeatedly merge an active pair
       (u, v) with

         goodness(u, v) = max(best(u), best(v))
                          / min(w(u, v), mm(u), mm(v)) ≤ 1 + ε

       (approximate_subgraph_hac_graph.h:44-50), where best(·) ranges
       over ALL incident edges (frozen included) and mm is the minimum
       similarity over the merges that built the cluster
       (approximate_subgraph_hac.cc:139-143);
    4. apply merges globally (cluster = min member vid), contract, and
       carry each cluster's mm to the next round.

  The reference picks good edges from a bucketed priority queue; ANY
  good edge preserves the (1+ε) guarantee.  The kernel exploits that
  with batched NumPy matching rounds (see `_subgraph_hac_kernel`):
  each round merges the deterministic mutual-minimum matching of good
  edges — valid because average linkage is reducible, so a good edge
  stays good after any disjoint merge — and a sequential
  global-minimum heap finishes the tail.  At ~1e5 kernel edges/s a
  cap-full partition (default 2^20 nodes, a few×10^6 edges) costs on
  the order of a minute of kernel time — the wall-time envelope the
  reference's cap (terahac.cc:84: max(n/100, 1e6)) implies.  The
  reference salts its partitioner by round; on a stalled round we
  RE-SALT the partitioner (an id-XOR bijection re-rolls every
  tie-break and split point — a mutual-best pair split across
  partitions usually reunites at the SAME cap) and DOUBLE the
  partition cap only when re-salting doesn't help, which guarantees
  progress and terminates at exact subgraph HAC.

At ε = 0 the goodness rule only admits mutual-best edges, and average
linkage is reducible, so the result equals exact sequential HAC — the
pytest gate asserts flat-cluster parity with the sequential oracle,
with single- AND multi-partition configurations agreeing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_mining_spark.checkpoint import cut_lineage
from graph_mining_spark.graph import remove_self_loops, symmetrize, vertex_ids
from graph_mining_spark.operators.affinity import AffinityConfig, affinity_cluster
from graph_mining_spark.operators.minla import _rank_partitions, _two_phase_rank
from graph_mining_spark.operators.size_constraint import SizeConstraint


@dataclass
class TeraHacConfig:
    epsilon: float = 0.1
    linkage_threshold: float = 1e-9
    # partition cap for the size-constrained affinity step
    # (terahac.cc:84: max(n/100, 1e6) — scaled down for local testing)
    partition_max: int = 1 << 20
    max_rounds: int = 100
    # also emit the parent-array dendrogram (dendrogram.h:29-97), the
    # same surface parhac() returns; terahac() then returns a 3-tuple
    output_dendrogram: bool = False


def _heap_core(
    adj: dict, size: dict, mm: dict, active: dict, epsilon: float,
    min_merge_sim: float = float("-inf"),
):
    """Sequential good-edge heap HAC over dict state (shared by the
    pure-python kernel and the batched kernel's low-candidate tail).

    Mutates ``adj``/``size``/``mm``/``active`` in place and returns the
    merge list ``[(gone, keep, sim), ...]`` in merge order.  The popped
    candidate is always the exact global minimum of ``(goodness, a,
    b)`` over currently-good both-active edges, with per-edge versioned
    lazy invalidation (the Spark-side analog of the reference's
    bucketed priority queue, approximate_subgraph_hac.cc:56-170).

    ``min_merge_sim``: only edges with similarity ≥ this value are
    merge candidates (the dynamic-HAC path sets it to the linkage
    threshold so local re-clustering matches threshold HAC; terahac()
    leaves it unbounded — its outer loop prunes actives instead)."""
    from heapq import heappop, heappush

    def sim(a, b):
        return adj[a][b] / (size[a] * size[b])

    # best incident similarity per node (frozen neighbors included —
    # approximate_subgraph_hac_graph.h:44-50 ranges over ALL edges)
    best: dict = {}
    for x, nbrs in adj.items():
        if nbrs:
            best[x] = max(sim(x, y) for y in nbrs)

    bound = 1.0 + epsilon + 1e-12
    version: dict = {}  # canonical (a,b) -> int
    heap: list = []

    def goodness(a, b):
        w_ab = sim(a, b)
        denom = min(w_ab, mm[a], mm[b])
        if denom <= 0:
            return None, w_ab
        return max(best[a], best[b]) / denom, w_ab

    def refresh_edge(x, y):
        """Recompute an edge's goodness; bump its version; (re)offer it
        to the heap when it is a good both-active pair."""
        a, b = (x, y) if x < y else (y, x)
        ver = version.get((a, b), 0) + 1
        version[(a, b)] = ver
        if not (active.get(a) and active.get(b)):
            return
        g, w_ab = goodness(a, b)
        if g is not None and g <= bound and w_ab >= min_merge_sim:
            heappush(heap, (g, a, b, ver, w_ab))

    for a in adj:
        for b in adj[a]:
            if a < b:
                refresh_edge(a, b)

    out_rows = []
    while heap:
        g, a, b, ver, w_ab = heappop(heap)
        if version.get((a, b)) != ver:
            continue  # stale entry — a fresher version was pushed
        if b not in adj.get(a, ()) or not (active.get(a) and active.get(b)):
            continue  # edge deleted with a merged-away endpoint
        keep, gone = a, b  # a < b by canonical heap key

        # record pre-merge sims of all edges that are about to change
        old_sim_keep = {x: sim(keep, x) for x in adj[keep]}
        old_sim_gone = {x: sim(gone, x) for x in adj[gone]}

        new_mm = min(mm[keep], mm[gone], w_ab)
        for x, w_gx in adj[gone].items():
            if x == keep:
                continue
            nw = adj[keep].get(x, 0.0) + w_gx
            adj[keep][x] = nw
            adj[x][keep] = nw
            del adj[x][gone]
        del adj[keep][gone]
        del adj[gone]
        size[keep] += size[gone]
        mm[keep] = new_mm
        active[gone] = False
        best.pop(gone, None)
        out_rows.append((gone, keep, w_ab))

        # maintain per-node bests: keep always rescans (every incident
        # sim changed); a neighbor rescans only when its previous best
        # was one of the removed contributions and the replacement is
        # smaller, or updates in O(1) when the new sim dominates
        best_changed = set()
        if adj[keep]:
            nb = max(sim(keep, y) for y in adj[keep])
            if nb != best.get(keep):
                best[keep] = nb
            best_changed.add(keep)  # mm/size changed ⇒ edges recompute anyway
        else:
            best.pop(keep, None)
        for x in adj[keep]:
            if x == keep:
                continue
            new_s = sim(x, keep)
            old_b = best.get(x)
            removed = []
            if x in old_sim_keep:
                removed.append(old_sim_keep[x])
            if x in old_sim_gone:
                removed.append(old_sim_gone[x])
            if old_b is None or new_s >= old_b:
                if new_s != old_b:
                    best[x] = new_s
                    best_changed.add(x)
            elif old_b in removed:
                nb = max(sim(x, y) for y in adj[x])
                if nb != old_b:
                    best[x] = nb
                    best_changed.add(x)

        # goodness can only have changed for edges incident to keep
        # (sim/mm/best) or to a node whose best changed
        for x in best_changed:
            for y in adj.get(x, ()):
                refresh_edge(x, y)
        if keep not in best_changed:
            for y in adj.get(keep, ()):
                refresh_edge(keep, y)
    return out_rows


def _subgraph_hac_kernel_py(pdf, epsilon: float):
    """Pure-python reference kernel (dict adjacency + per-edge version
    heap).  Kept as the differential oracle for the vectorized kernel
    below — `test_terahac.py::test_kernel_differential` asserts the two
    produce identical output on random graphs.  Not used in production.

    pdf columns: u, v, w (raw summed weight), su, sv (cluster sizes),
    mu, mv (min-merge similarities), act_v (v active in this
    partition).  All u rows are active members of the partition.
    Returns rows (vid=child cluster id, label=new cluster id, sim,
    new_mm, new_size) — one row per MERGED child, mapping it onto the
    surviving min-id cluster, plus one row per survivor with its
    updated mm/size.

    Candidate selection is incremental (the Spark-side analog of the
    reference's bucketed priority queue, approximate_subgraph_hac.cc:
    56-170): per-node best similarities are maintained under merges,
    and good edges live in a heap with versioned lazy invalidation.  A
    merge only recomputes goodness for edges incident to the surviving
    cluster and to neighbors whose best changed, so total kernel work
    is O(Σ per-merge degree) instead of the previous O(E·M) full
    rescans.  The popped candidate is still the exact global minimum
    of (goodness, a, b), so results are bit-identical to the naive
    scan.
    """
    import pandas as pd

    adj: dict = {}  # node -> {neighbor: raw summed weight}
    size: dict = {}
    mm: dict = {}
    active: dict = {}
    for u, v, w, su, sv, mu, mv, act_v in zip(
        pdf["u"], pdf["v"], pdf["w"], pdf["su"], pdf["sv"], pdf["mu"], pdf["mv"], pdf["act_v"]
    ):
        u, v = int(u), int(v)
        adj.setdefault(u, {})[v] = float(w)  # symmetric dups overwrite equal
        adj.setdefault(v, {})[u] = float(w)
        size[u], size[v] = float(su), float(sv)
        mm[u], mm[v] = float(mu), float(mv)
        # u rows are partition members (active); v is active only when
        # it belongs to this partition too (it then also appears as u)
        active[u] = True
        active.setdefault(v, bool(act_v))

    out_rows = _heap_core(adj, size, mm, active, epsilon)
    merged_into = {gone: keep for gone, keep, _ in out_rows}

    # path-compress merge targets
    def root(x):
        while x in merged_into:
            x = merged_into[x]
        return x

    part = int(pdf["part"].iloc[0])
    rows = []
    for seq, (child, into, s) in enumerate(out_rows):
        r = root(child)
        # `into` is the surviving cluster AT MERGE TIME and `seq` the
        # within-partition merge order — together they reconstruct the
        # binary dendrogram chain (label is the path-compressed final
        # root the contraction step needs)
        rows.append((part, child, r, s, mm[r], size[r], into, seq))
    for x, is_act in active.items():
        if is_act and x not in merged_into:
            rows.append((part, x, x, None, mm[x], size[x], None, None))
    return pd.DataFrame(
        rows,
        columns=["part", "vid", "label", "sim", "new_mm", "new_size", "into", "seq"],
    ).astype({"part": "int64", "vid": "int64", "label": "int64"})


def _subgraph_hac_kernel(pdf, epsilon: float, min_merge_sim: float = float("-inf")):
    """Batched NumPy ApproximateSubgraphHac over one partition's rows.

    Same contract as :func:`_subgraph_hac_kernel_py`, but instead of
    popping one globally-minimal good edge at a time, each batch round
    vectorizes over the WHOLE remaining subgraph:

      1. similarities, per-node bests (``np.maximum.at`` segment max
         over all incident edges, frozen neighbors included) and per-
         edge goodness are computed as flat array ops;
      2. every node picks its minimum-``(goodness, a, b)`` good edge;
         the round merges the MUTUAL-minimum matching (an edge both of
         whose endpoints picked it) — deterministic, node-disjoint;
      3. merged pairs contract and per-edge state refreshes — FULLY
         (one ``np.unique``/``np.bincount`` pass + recompute) when the
         round touched most edges, INCREMENTALLY otherwise: only the
         frontier (edges incident to a merged cluster, plus edges
         whose endpoint's best changed) is re-deduped and re-scored,
         merge-inserted into the key-sorted cached arrays.  Both paths
         produce bit-identical arrays — the frontier dedup sums
         duplicate weights in the same ascending-previous-key order
         the full pass would — so results don't depend on the route.

    Validity: average linkage is REDUCIBLE — merging clusters x, y
    gives sim(u, x∪y) = (w_ux + w_uy) / (s_u · (s_x + s_y)), a weighted
    average ≤ max(sim(u,x), sim(u,y)) — so a disjoint merge can only
    LOWER other nodes' best similarities, while w, mm of an untouched
    pair are unchanged: a good edge stays good after any disjoint
    merge.  Every edge in the matching is therefore still good at its
    sequential-equivalent merge time, which is exactly the reference's
    contract (approximate_subgraph_hac.cc picks ANY good edge from a
    bucketed queue, not the global minimum).  At ε = 0 good edges are
    mutual-best edges with sim ≤ mm, whose merge order is immaterial
    (nearest-neighbor-chain argument), so the result still equals
    exact sequential HAC — the parity gates stay green.

    When fewer than ``_TAIL_EDGES`` directed edges REMAIN (not good
    edges — the heap's entry cost is O(remaining edges) of python
    dict-building), the kernel hands the contracted remainder to
    :func:`_heap_core` (the sequential good-edge heap), so tiny test
    fixtures get the exact old sequential behavior while big subgraphs
    with a thin good-edge tail stay in the cheap frontier rounds.

    Replay gate: test_terahac.py::test_kernel_differential re-applies
    the emitted merge sequence one edge at a time and asserts each
    merge was (1+ε)-good at its merge time, plus exact ε=0 parity with
    the python kernel.
    """
    import numpy as np
    import pandas as pd

    u = pdf["u"].to_numpy(np.int64)
    v = pdf["v"].to_numpy(np.int64)
    w = pdf["w"].to_numpy(np.float64)
    uniq = np.unique(np.concatenate([u, v]))
    n = int(uniq.size)
    du = np.searchsorted(uniq, u)
    dv = np.searchsorted(uniq, v)

    size = np.zeros(n)
    mm = np.zeros(n)
    act = np.zeros(n, dtype=bool)
    size[du] = pdf["su"].to_numpy(np.float64)
    size[dv] = pdf["sv"].to_numpy(np.float64)
    mm[du] = pdf["mu"].to_numpy(np.float64)
    mm[dv] = pdf["mv"].to_numpy(np.float64)
    act[dv[pdf["act_v"].to_numpy(bool)]] = True
    act[du] = True

    # symmetric deduped directed edge list (symmetric duplicates carry
    # equal weights — keep the first occurrence), sorted by (a, b)
    ea = np.concatenate([du, dv])
    eb = np.concatenate([dv, du])
    ew = np.concatenate([w, w])
    _, first = np.unique(ea * n + eb, return_index=True)
    ea, eb, ew = ea[first], eb[first], ew[first]

    bound = 1.0 + epsilon + 1e-12
    dest = np.arange(n)
    merges: list = []  # (gone, keep, sim) in sequential-equivalent order
    old_err = np.seterr(divide="ignore", invalid="ignore")

    # Cached per-edge state, maintained INCREMENTALLY: a round only
    # recomputes sims/goodness for the merge frontier (edges incident
    # to a merged cluster, plus edges whose endpoint's best-similarity
    # changed).  The edge arrays stay sorted by (a, b) key, and the
    # frontier's weight-dedup sums duplicates in the same (ascending
    # previous-key) order the full np.unique contraction would — the
    # results are bit-identical to recomputing everything from scratch
    # each round, at a fraction of the cost once the frontier shrinks.
    sims = ew / (size[ea] * size[eb])
    best = np.full(n, -np.inf)
    np.maximum.at(best, ea, sims)
    denom = np.minimum(sims, np.minimum(mm[ea], mm[eb]))
    g = np.maximum(best[ea], best[eb]) / denom
    good = act[ea] & act[eb] & (denom > 0) & (g <= bound) & (sims >= min_merge_sim)

    while ea.size:
        n_good = int(np.count_nonzero(good))
        if n_good == 0:
            break
        if ea.size < _TAIL_EDGES:
            # tiny remainders (and tiny test fixtures) get the exact
            # sequential heap behavior; entry cost is O(remaining
            # edges) python dict-building, so the gate is on EDGES
            # left, not good edges — a big subgraph with few good
            # edges stays in the cheap frontier rounds
            merges.extend(
                _np_state_to_heap_tail(ea, eb, ew, size, mm, act, epsilon, min_merge_sim)
            )
            break
        idx = np.flatnonzero(good)
        ca_ = np.minimum(ea[idx], eb[idx])
        cb_ = np.maximum(ea[idx], eb[idx])
        gg, ss = g[idx], sims[idx]
        node = ea[idx]
        order = np.lexsort((cb_, ca_, gg, node))
        nsort = node[order]
        firsts = np.ones(order.size, dtype=bool)
        firsts[1:] = nsort[1:] != nsort[:-1]
        cpos = order[firsts]  # per-node argmin of (g, a, b)
        cx = nsort[firsts]
        ca, cb, cs = ca_[cpos], cb_[cpos], ss[cpos]
        CA = np.full(n, -1, dtype=np.int64)
        CB = np.full(n, -1, dtype=np.int64)
        CA[cx] = ca
        CB[cx] = cb
        sel = (
            (CA[ca] == ca) & (CB[ca] == cb) & (CA[cb] == ca) & (CB[cb] == cb)
            & (cx == ca)  # keep the a-side occurrence only
        )
        sel_a, sel_b, sel_s = ca[sel], cb[sel], cs[sel]
        # apply the matching (node-disjoint, so single-hop relabel)
        size[sel_a] += size[sel_b]
        mm[sel_a] = np.minimum(np.minimum(mm[sel_a], mm[sel_b]), sel_s)
        act[sel_b] = False
        dest[sel_b] = sel_a
        merges.extend(zip(sel_b.tolist(), sel_a.tolist(), sel_s.tolist()))

        affn = np.zeros(n, dtype=bool)
        affn[sel_a] = True
        affn[sel_b] = True
        em = affn[ea] | affn[eb]  # pool: edges incident to a merged cluster
        n_pool = int(np.count_nonzero(em))

        if n_pool * 2 >= ea.size:
            # ---- wide round: most edges touched — the full
            # contraction + full recompute is cheaper than the
            # frontier bookkeeping (early rounds of a fresh subgraph)
            ea = dest[ea]
            eb = dest[eb]
            live = ea != eb
            key = ea[live] * n + eb[live]
            ukey, inv = np.unique(key, return_inverse=True)
            ew = np.bincount(inv, weights=ew[live])
            ea = ukey // n
            eb = ukey % n
            sims = ew / (size[ea] * size[eb])
            best = np.full(n, -np.inf)
            np.maximum.at(best, ea, sims)
            denom = np.minimum(sims, np.minimum(mm[ea], mm[eb]))
            g = np.maximum(best[ea], best[eb]) / denom
            good = (
                act[ea] & act[eb] & (denom > 0) & (g <= bound) & (sims >= min_merge_sim)
            )
            continue

        # ---- narrow round: frontier-incremental contraction ----
        pe_a, pe_b, pw = ea[em], eb[em], ew[em]
        # nodes whose incident sims change = pool endpoints (mapped live)
        n1 = np.zeros(n, dtype=bool)
        n1[dest[pe_a]] = True
        n1[dest[pe_b]] = True
        # relabel + drop self-loops + dedup; boolean masking keeps the
        # pool in ascending previous-key order, so bincount sums
        # duplicate weights exactly as the full contraction would
        pa = dest[pe_a]
        pb = dest[pe_b]
        live = pa != pb
        pkey = pa[live] * n + pb[live]
        ukey, inv = np.unique(pkey, return_inverse=True)
        pw2 = np.bincount(inv, weights=pw[live])
        pa2 = ukey // n
        pb2 = ukey % n
        # untouched rest (cached sims/g/good stay valid except where a
        # best-endpoint changed, patched below)
        rm = ~em
        ra, rb, rw = ea[rm], eb[rm], ew[rm]
        rs, rg, rgood = sims[rm], g[rm], good[rm]
        # merge the two key-sorted lists (pool keys all contain a
        # merged cluster, rest keys none — no cross-duplicates)
        pos = np.searchsorted(ra * n + rb, ukey)
        ea = np.insert(ra, pos, pa2)
        eb = np.insert(rb, pos, pb2)
        ew = np.insert(rw, pos, pw2)
        ps2 = pw2 / (size[pa2] * size[pb2])
        sims = np.insert(rs, pos, ps2)
        g = np.insert(rg, pos, 0.0)
        good = np.insert(rgood, pos, False)
        pool_at = pos + np.arange(pos.size)

        # ---- frontier best recompute (sims only DECREASE under
        # average linkage, so a frontier node's best must rescan all
        # its incident edges) ----
        n1_nodes = np.flatnonzero(n1)
        prev_best = best[n1_nodes].copy()
        best[n1_nodes] = -np.inf
        bm = n1[ea]
        np.maximum.at(best, ea[bm], sims[bm])
        bc = np.zeros(n, dtype=bool)
        bc[n1_nodes[best[n1_nodes] != prev_best]] = True

        # ---- frontier goodness recompute: pool edges (sim/mm/act
        # moved) + edges with a changed-best endpoint ----
        gmask = bc[ea] | bc[eb]
        gmask[pool_at] = True
        ge, gb = ea[gmask], eb[gmask]
        gdn = np.minimum(sims[gmask], np.minimum(mm[ge], mm[gb]))
        gg2 = np.maximum(best[ge], best[gb]) / gdn
        g[gmask] = gg2
        good[gmask] = (
            act[ge] & act[gb] & (gdn > 0) & (gg2 <= bound) & (sims[gmask] >= min_merge_sim)
        )
    np.seterr(**old_err)

    # path-compress merge targets
    merged_into = {gone: keep for gone, keep, _ in merges}

    def root(x):
        while x in merged_into:
            x = merged_into[x]
        return x

    part = int(pdf["part"].iloc[0])
    rows = []
    for seq, (child, into, s) in enumerate(merges):
        r = root(child)
        rows.append(
            (part, int(uniq[child]), int(uniq[r]), float(s),
             float(mm[r]), float(size[r]), int(uniq[into]), seq)
        )
    for x in range(n):
        if act[x] and x not in merged_into:
            rows.append(
                (part, int(uniq[x]), int(uniq[x]), None, float(mm[x]), float(size[x]), None, None)
            )
    return pd.DataFrame(
        rows,
        columns=["part", "vid", "label", "sim", "new_mm", "new_size", "into", "seq"],
    ).astype({"part": "int64", "vid": "int64", "label": "int64"})


# below this many REMAINING directed edges the contracted subgraph is
# handed to the sequential heap kernel (exact old behavior for tiny
# fixtures / end-game remainders).  The heap's entry cost is O(edges)
# python dict-building, so big subgraphs with few good edges stay in
# the frontier-incremental batch rounds instead — a round there costs
# O(frontier) plus a handful of O(E) vectorized mask passes.
_TAIL_EDGES = 4096


def _np_state_to_heap_tail(ea, eb, ew, size, mm, act, epsilon, min_merge_sim=float("-inf")):
    """Finish a batched kernel run with :func:`_heap_core`: convert the
    contracted array state to dict state, run the sequential heap to
    completion, and write final size/mm/activity back into the arrays."""
    adj: dict = {}
    for a, b, wt in zip(ea.tolist(), eb.tolist(), ew.tolist()):
        adj.setdefault(a, {})[b] = wt
    nodes = set(adj)
    size_d = {x: float(size[x]) for x in nodes}
    mm_d = {x: float(mm[x]) for x in nodes}
    act_d = {x: bool(act[x]) for x in nodes}
    out = _heap_core(adj, size_d, mm_d, act_d, epsilon, min_merge_sim)
    for x in nodes:
        size[x] = size_d[x]
        mm[x] = mm_d[x]
        act[x] = act_d[x]
    return out


def terahac(
    edges: DataFrame,
    config: TeraHacConfig | None = None,
    already_symmetric: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Run TeraHac.  Returns ``(labels, merge_log)`` — or, with
    ``config.output_dendrogram``, ``(labels, merge_log, dendrogram)``:

    labels: (vid, label) flat clustering at the linkage threshold,
    label = min member vid (the reference Cluster() surface).
    merge_log: (round, vid, label, sim) — the per-round merges.
    dendrogram: (node_id, parent_id, merge_similarity) parent-array
    rows, the same surface :func:`hac.parhac` returns
    (dendrogram.h:29-97): leaves = vids, internal ids ≥ n in merge
    order, parent_id null for roots.
    """
    cfg = config or TeraHacConfig()
    eps = float(cfg.epsilon)
    spark = edges.sparkSession
    sym = edges if already_symmetric else symmetrize(edges)
    verts = vertex_ids(sym)

    cur = cut_lineage(remove_self_loops(sym).groupBy("src", "dst").agg(F.sum("weight").alias("w")))
    state = cut_lineage(
        verts.select(
            F.col("vid").alias("cid"),
            F.lit(1.0).alias("sz"),
            F.lit(float("inf")).alias("mm"),
        )
    )
    leaf_of = cut_lineage(verts.select("vid", F.col("vid").alias("cid")))
    merge_logs: list[DataFrame] = []
    dendro_logs: list[DataFrame] = []
    pruning = cfg.linkage_threshold / (1.0 + eps)
    part_cap = int(cfg.partition_max)
    salt = 0  # id-permutation key for stall-recovery re-partitioning
    salts_left = 2  # re-salt attempts per stall before growing the cap

    for rnd in range(cfg.max_rounds):
        st_s = state.select(F.col("cid").alias("src"), F.col("sz").alias("_ss"), F.col("mm").alias("_ms"))
        st_d = state.select(F.col("cid").alias("dst"), F.col("sz").alias("_sd"), F.col("mm").alias("_md"))
        scored = cur.join(st_s, "src").join(st_d, "dst").withColumn(
            "sim", F.col("w") / (F.col("_ss") * F.col("_sd"))
        )
        scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
        best = scored.groupBy(F.col("src").alias("cid")).agg(F.max("sim").alias("_best"))
        active = best.filter(F.col("_best") > pruning).select("cid")
        n_active = active.count()
        if n_active == 0:
            scored.unpersist()
            break

        # partition actives: size-capped affinity over the active
        # subgraph.  After a stalled round, ``salt`` XOR-permutes the
        # vertex ids first (a bijection on the non-negative int64
        # space), which re-rolls every id-based tie-break and
        # tree-partition split point — the Spark analog of the
        # reference re-randomizing its partitioner each round
        # (terahac.cc:83-140) — so a mutual-best pair split across
        # partitions gets a fresh chance to land together without
        # growing the cap.
        act_edges = (
            scored.join(active.withColumnRenamed("cid", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("cid", "dst"), "dst", "left_semi")
            .select("src", "dst", F.col("sim").alias("weight"))
        )
        act_verts = active.select(F.col("cid").alias("vid"))
        if salt:
            act_edges = act_edges.select(
                F.col("src").bitwiseXOR(F.lit(salt)).alias("src"),
                F.col("dst").bitwiseXOR(F.lit(salt)).alias("dst"),
                "weight",
            )
            act_verts = act_verts.select(F.col("vid").bitwiseXOR(F.lit(salt)).alias("vid"))
        parts = affinity_cluster(
            act_edges,
            AffinityConfig(
                num_iterations=1,
                edge_aggregation="max",
                size_constraint=SizeConstraint(max_cluster_size=part_cap),
            ),
            vertices=act_verts,
            # act_edges derives from the symmetric contracted table —
            # both orientations are present already
            already_symmetric=True,
        )
        if salt:
            # unpermute the member ids; the labels are only partition
            # KEYS (min permuted member id), no need to map them back
            parts = parts.select(F.col("vid").bitwiseXOR(F.lit(salt)).alias("vid"), "label")
        parts = cut_lineage(parts.select(F.col("vid").alias("cid"), F.col("label").alias("part")))

        # kernel input: every edge whose src is active & partitioned,
        # tagged with whether dst is in the same partition (active) —
        # boundary neighbors ride along frozen
        p_src = parts.select(F.col("cid").alias("src"), F.col("part"))
        p_dst = parts.select(F.col("cid").alias("dst"), F.col("part").alias("_pd"))
        rows = (
            scored.join(p_src, "src")
            .join(p_dst, "dst", "left")
            .select(
                "part",
                F.col("src").alias("u"),
                F.col("dst").alias("v"),
                "w",
                F.col("_ss").alias("su"),
                F.col("_sd").alias("sv"),
                F.col("_ms").alias("mu"),
                F.col("_md").alias("mv"),
                (F.col("_pd").isNotNull() & (F.col("_pd") == F.col("part"))).alias("act_v"),
            )
        )
        eps_local = eps

        def run(pdf):
            return _subgraph_hac_kernel(pdf, eps_local)

        obs = Observation()
        kout = cut_lineage(
            rows.groupBy("part")
            .applyInPandas(
                run,
                schema="part long, vid long, label long, sim double, "
                "new_mm double, new_size double, into long, seq long",
            )
            .observe(obs, F.sum(F.when(F.col("vid") != F.col("label"), 1).otherwise(0)).alias("n_merged"))
        )
        n_merged = int(obs.get["n_merged"] or 0)
        scored.unpersist()
        if n_merged == 0:
            # A mutual-best pair may be split across partitions.  First
            # RE-SALT the partitioner (the reference re-randomizes its
            # partitioner per round, terahac.cc:83-140): XOR-permuting
            # the ids re-rolls the tree-partition split points, which
            # usually reunites the pair at the SAME cap — a stalled
            # round then costs one retry, not a doubled partition size.
            # If re-salting doesn't help, grow the cap so the affinity
            # forests get room to reunite them.
            # NOTE: affinity with num_iterations=1 yields one partition
            # per best-neighbor-forest component regardless of cap, so
            # a large cap does NOT force a single partition; progress
            # instead relies on each component's maximum-similarity
            # edge being INTERNAL to its forest (both endpoints pick
            # each other under the deterministic (weight, id) argmax),
            # so some partition always contains a good edge.  When the
            # cap already clears the active count, no further growth
            # can change the partitioning — stop.
            if n_active <= part_cap and salt == 0:
                break
            if salts_left > 0:
                salts_left -= 1
                # deterministic 62-bit keys: non-negative ids stay
                # non-negative under XOR
                salt = (0x9E3779B97F4A7C15 ^ (0x5851F42D4C957F2D * (rnd + 1))) & ((1 << 62) - 1)
                continue
            salt = 0
            salts_left = 2
            part_cap *= 2
            continue
        salts_left = 2
        salt = 0

        merge_logs.append(
            kout.filter(F.col("vid") != F.col("label"))
            .select(F.lit(rnd).alias("round"), "vid", "label", "sim")
        )
        if cfg.output_dendrogram:
            dendro_logs.append(
                kout.filter(F.col("vid") != F.col("label")).select(
                    F.lit(rnd).alias("round"), "part", "seq",
                    F.col("vid").alias("gone"), "into", "sim",
                )
            )
        mapping = kout.filter(F.col("vid") != F.col("label")).select("vid", "label")
        # labels for leaves
        leaf_of = cut_lineage(
            leaf_of.join(mapping.withColumnRenamed("vid", "cid"), "cid", "left")
            .select("vid", F.coalesce("label", "cid").alias("cid"))
        )
        # contract edges
        map_s = mapping.select(F.col("vid").alias("src"), F.col("label").alias("_ns"))
        map_d = mapping.select(F.col("vid").alias("dst"), F.col("label").alias("_nd"))
        cur = cut_lineage(
            cur.join(map_s, "src", "left")
            .join(map_d, "dst", "left")
            .select(
                F.coalesce("_ns", F.col("src")).alias("src"),
                F.coalesce("_nd", F.col("dst")).alias("dst"),
                "w",
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
        # new state: survivors from the kernel + untouched clusters
        updated = kout.filter(F.col("vid") == F.col("label")).select(
            F.col("label").alias("cid"), F.col("new_size").alias("sz"), F.col("new_mm").alias("mm")
        )
        untouched = state.join(
            kout.select(F.col("vid").alias("cid")).distinct(), "cid", "left_anti"
        )
        state = cut_lineage(updated.unionByName(untouched))

    if merge_logs:
        log = merge_logs[0]
        for d in merge_logs[1:]:
            log = log.unionByName(d)
    else:
        log = spark.createDataFrame([], "round int, vid long, label long, sim double")

    canon = leaf_of.groupBy("cid").agg(F.min("vid").alias("_c"))
    labels = leaf_of.join(canon, "cid").select("vid", F.col("_c").alias("label"))
    if not cfg.output_dendrogram:
        return labels, log

    # ---- parent-array dendrogram (dendrogram.h:29-97), ParHac surface ----
    # Each raw merge (gone, into) at time t = (round, part, seq) becomes
    # an internal node; its two children are the dendrogram nodes that
    # represented `gone` and `into` just before t — i.e. each cluster
    # id's previous internal node (lag over its participation sequence),
    # or the leaf id itself.  Cluster ids are stable min-member vids, so
    # the participation chain is well-keyed across rounds.  Id
    # assignment uses the two-phase range-partition rank — the merge
    # log is vertex-scale (n-1 internal nodes), so a single-partition
    # window here would be a one-task funnel at 100x.
    n = verts.agg(F.max("vid")).first()[0]
    n = int(n) + 1 if n is not None else 0
    if dendro_logs:
        dlog = dendro_logs[0]
        for d in dendro_logs[1:]:
            dlog = dlog.unionByName(d)
    else:
        dlog = spark.createDataFrame(
            [], "round int, part long, seq long, gone long, into long, sim double"
        )
    m = (
        _two_phase_rank(dlog, ["round", "part", "seq"], _rank_partitions(spark))
        .withColumn("pid", F.col("_rank") + F.lit(n))
        .drop("_rank")
    )
    partic = m.select(
        F.col("gone").alias("cluster"), "round", "part", "seq", "pid", "sim"
    ).unionByName(
        m.select(F.col("into").alias("cluster"), "round", "part", "seq", "pid", "sim")
    )
    w_ch = Window.partitionBy("cluster").orderBy("round", "part", "seq")
    children = partic.select(
        F.coalesce(F.lag("pid").over(w_ch), F.col("cluster")).alias("node_id"),
        F.col("pid").alias("parent_id"),
        F.col("sim").alias("merge_similarity"),
    )
    # roots: every final cluster's last internal node (max pid = latest
    # by construction), or the untouched leaf itself
    last_pid = partic.groupBy("cluster").agg(F.max("pid").alias("_lp"))
    roots = (
        state.select(F.col("cid").alias("cluster"))
        .join(last_pid, "cluster", "left")
        .select(
            F.coalesce("_lp", F.col("cluster")).alias("node_id"),
            F.lit(None).cast("long").alias("parent_id"),
            F.lit(None).cast("double").alias("merge_similarity"),
        )
    )
    dendrogram = children.unionByName(roots)
    return labels, log, dendrogram
