"""Clique-aggregator clustering (dense-subgraph covers).

Parity target: /root/reference/in_memory/clustering/clique_aggregator/
clique_aggregator.cc:367-483 (recursive CliqueAggregator),
degeneracy_orientation.h:28-55 (DegeneracyOrdering, ties -> smallest id),
degeneracy_orientation.cc:57-121 (DirectGraph), clique_aggregator.proto
(CliqueAggregatorConfig: min_density, allow_disconnected_clusters,
bron_kerbosch_pruning).

Output guarantees (clique_aggregator.h:31-42):
  * every clique of size >= 2 is fully contained in at least one cluster;
  * every cluster has density >= min_density, where density =
    #edges / (#nodes choose 2);
  * with Bron-Kerbosch pruning, no cluster is a subset of another.
With min_density == 1.0 the output is exactly the maximal cliques of
size >= 2 (each cluster is a clique, every clique is covered, and no
subset survives) — that identity is the exact pytest oracle.

Spark shape: with ``allow_disconnected_clusters=False`` (the default)
every recursion stays inside one connected component — the top-level
density early-exits are skipped and each recursive subgraph is an
induced out-neighborhood — and the global degeneracy ordering restricted
to a component equals the component's own ordering (the (degree, id)
minimum over all nodes, when it lands in component C, is also the
minimum over C, and removals never touch other components).  So the
distributed form is exact: hash-shuffle edges by component label and run
the reference's sequential recursion per component in applyInPandas,
exactly like ``size_constraint.py``.  With
``allow_disconnected_clusters=True`` the density denominator spans the
whole graph, so the kernel runs as a single group (documented scale
caveat — that mode exists for density accounting across components and
is inherently global).

Scale: the per-component kernel is the same bound the reference's
shared-memory recursion has; the 100 TB path presplits giant components
upstream with :func:`k_core_presplit` (distributed (k−1)-core peel,
exact for cliques of size ≥ k — see its docstring), and the bitset
kernel bounds per-call work by the component's degeneracy, not its
size.
"""

from __future__ import annotations

from dataclasses import dataclass
from heapq import heappop, heappush

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_mining_spark.graph import symmetrize
from graph_mining_spark.operators.connected_components import connected_components


@dataclass
class CliqueAggregatorConfig:
    """clique_aggregator.proto:7-27."""

    min_density: float = 1.0
    allow_disconnected_clusters: bool = False
    bron_kerbosch_pruning: bool = True


# ---------------- pure-python kernel (reference recursion) ----------------


def _n_choose_2(n: float) -> float:
    return n * (n - 1.0) / 2.0


def _combined_density(num_nodes: int, num_edges: int, num_clique_nodes: int) -> float:
    """CombinedDensity (clique_aggregator.cc:60-66): density after gluing a
    clique of ``num_clique_nodes`` fully connected to the existing graph."""
    if num_nodes + num_clique_nodes <= 1:
        return 1.0
    return (
        num_edges + num_clique_nodes * num_nodes + _n_choose_2(num_clique_nodes)
    ) / _n_choose_2(num_nodes + num_clique_nodes)


def _degeneracy_ordering(adj: list[int]) -> list[int]:
    """Repeatedly remove the (degree, id)-minimum node
    (degeneracy_orientation.h:28-55; the reference's power-of-two
    FixedSizePriorityQueue breaks priority ties by smallest index)."""
    n = len(adj)
    deg = [a.bit_count() for a in adj]
    heap: list[tuple[int, int]] = []
    for v in range(n):
        heappush(heap, (deg[v], v))
    removed = 0
    gone = [False] * n
    order: list[int] = []
    while removed < n:
        d, v = heappop(heap)
        if gone[v] or d != deg[v]:
            continue  # stale entry
        gone[v] = True
        removed += 1
        order.append(v)
        m = adj[v]
        while m:
            low = m & -m
            u = low.bit_length() - 1
            m ^= low
            if not gone[u]:
                deg[u] -= 1
                heappush(heap, (deg[u], u))
    return order


def _bits(mask: int):
    while mask:
        low = mask & -mask
        yield low.bit_length() - 1
        mask ^= low


def _direct_graph(adj: list[int], order: list[int]) -> tuple[list[int], list[int]]:
    """Orient each edge from earlier to later in ``order``
    (degeneracy_orientation.cc:57-121); returns (directed, transposed)
    bitmask adjacencies."""
    n = len(adj)
    pos = [0] * n
    for i, v in enumerate(order):
        pos[v] = i
    directed = [0] * n
    transposed = [0] * n
    for v in range(n):
        for u in _bits(adj[v]):
            if pos[v] < pos[u]:
                directed[v] |= 1 << u
                transposed[u] |= 1 << v
    return directed, transposed


def _exists_node_with_edges_to_all_later(
    directed: list[int], order: list[int], last_idx: int
) -> bool:
    """ExistsNodeWithEdgesToAllLaterNodes (clique_aggregator.cc:236-262)."""
    n = len(order)
    later_mask = 0
    for j in range(last_idx + 1, n):
        later_mask |= 1 << order[j]
    want = n - (last_idx + 1)
    for i in range(last_idx + 1):
        if (directed[order[i]] & later_mask).bit_count() == want:
            return True
    return False


def _remaining_already_covered(
    directed: list[int], covered: list[int], order: list[int], last_idx: int
) -> bool:
    """RemainingNodesAreAlreadyCovered (clique_aggregator.cc:269-290)."""
    if covered:
        remaining = 0
        for j in range(last_idx + 1, len(order)):
            remaining |= 1 << order[j]
        for cs in covered:
            if cs & remaining == remaining:
                return True
    return _exists_node_with_edges_to_all_later(directed, order, last_idx)


def _aggregate(
    adj: list[int],
    node_id_map: list[int],
    partial: list[int],
    min_density: float,
    covered: list[int] | None,
    allow_disconnected: bool,
    out: list[tuple[list[int], float]],
) -> None:
    """CliqueAggregator recursion (clique_aggregator.cc:367-483).

    ``adj``: undirected bitmask adjacency over [0, n); ``node_id_map``
    maps local ids to global ids; ``partial`` is the set of ancestor
    pivots to prepend; ``covered`` is the Bron-Kerbosch X family (None
    disables pruning entirely)."""
    n = len(adj)
    pruning = covered is not None
    if pruning:
        for cs in covered:
            if cs.bit_count() == n:
                return
    num_edges = sum(a.bit_count() for a in adj) // 2

    if allow_disconnected or n <= 1:
        cd = _combined_density(n, num_edges, len(partial))
        if cd >= min_density:
            if len(partial) + n <= 1:
                return  # never emit singletons
            out.append((partial + node_id_map, cd))
            return

    order = _degeneracy_ordering(adj)
    directed, transposed = _direct_graph(adj, order)

    remaining_nodes = n
    for i, v in enumerate(order):
        # Recursive graph = induced subgraph on the directed
        # out-neighborhood of v, ids remapped first-touch in the
        # reference's iteration order (ascending neighbor id, then its
        # common neighbors ascending) — clique_aggregator.cc:409-420.
        index: dict[int, int] = {}

        def get_or_create(x: int) -> int:
            r = index.get(x)
            if r is None:
                r = len(index)
                index[x] = r
            return r

        dv = directed[v]
        rec_edges: list[tuple[int, int]] = []
        for u in _bits(dv):
            get_or_create(u)
            for w in _bits(dv & directed[u]):
                rec_edges.append((get_or_create(u), get_or_create(w)))
        rec_n = len(index)
        rec_adj = [0] * rec_n
        for a, b in rec_edges:
            rec_adj[a] |= 1 << b
            rec_adj[b] |= 1 << a

        rec_covered: list[int] | None = None
        if pruning:
            # BuildRecursiveCoveredSets (clique_aggregator.cc:302-339)
            rec_covered = []

            def add_covered_set(other_mask: int) -> None:
                common = dv & other_mask
                rec = 0
                for w in _bits(common):
                    rec |= 1 << index[w]
                if dv == 0 or rec:
                    rec_covered.append(rec)

            vbit = 1 << v
            for cs in covered:
                if cs & vbit:
                    add_covered_set(cs)
            for inn in _bits(transposed[v]):
                add_covered_set(directed[inn])

        inverse = [0] * rec_n
        for orig, idx in index.items():
            inverse[idx] = node_id_map[orig]

        _aggregate(
            rec_adj,
            inverse,
            partial + [node_id_map[v]],
            min_density,
            rec_covered,
            True,  # recursive nodes all connect to v
            out,
        )

        # Delete v and early-exit once the remainder is dense enough
        # (clique_aggregator.cc:453-478).
        remaining_nodes -= 1
        num_edges -= directed[v].bit_count()
        if allow_disconnected or remaining_nodes <= 1:
            cd = _combined_density(remaining_nodes, num_edges, len(partial))
            if cd >= min_density:
                if len(partial) + remaining_nodes <= 1:
                    return
                if pruning and _remaining_already_covered(
                    directed, covered, order, i
                ):
                    return
                cluster = partial + [node_id_map[order[j]] for j in range(i + 1, n)]
                out.append((cluster, cd))
                return


def clique_aggregator_kernel(
    nodes: list[int],
    edge_pairs: list[tuple[int, int]],
    config: CliqueAggregatorConfig,
) -> list[tuple[list[int], float]]:
    """Run the reference recursion on one (small) graph with arbitrary
    integer node ids.  Returns [(sorted members, density)] in emission
    order (ClusterWithStatisticsImpl sorts each cluster,
    clique_aggregator.cc:511-513)."""
    ids = sorted(set(nodes))
    local = {g: i for i, g in enumerate(ids)}
    adj = [0] * len(ids)
    for a, b in edge_pairs:
        if a == b:
            continue
        ia, ib = local[a], local[b]
        adj[ia] |= 1 << ib
        adj[ib] |= 1 << ia
    out: list[tuple[list[int], float]] = []
    _aggregate(
        adj,
        ids,
        [],
        config.min_density,
        [] if config.bron_kerbosch_pruning else None,
        config.allow_disconnected_clusters,
        out,
    )
    return [(sorted(members), density) for members, density in out]


# ---------------- distributed operator ----------------


def k_core_presplit(
    edges: DataFrame,
    min_clique_size: int = 3,
    max_iterations: int = 1000,
) -> DataFrame:
    """Giant-component guard for :func:`clique_aggregator` — the
    presplit the module docstring's 100 TB path calls for.

    Iteratively peels every vertex of degree < ``min_clique_size − 1``
    (the distributed (k−1)-core, the same peel the reference's
    degeneracy ordering performs eagerly in shared memory,
    degeneracy_orientation.cc:57-121).  EXACTNESS CONTRACT: every
    clique of size ≥ ``min_clique_size`` lies in the
    (min_clique_size−1)-core (each member has ≥ min_clique_size−1
    neighbors inside the clique), so running the aggregator on the
    peeled graph preserves every such clique; only cliques SMALLER than
    ``min_clique_size`` (e.g. bare edges when min_clique_size=3) can be
    lost, which is the caller's stated filter.  A giant sparse
    component — a web-scale link graph's tree/path periphery — unravels
    completely, leaving only dense cores for the per-component kernels.

    Returns the peeled undirected edge table (both orientations),
    ready for ``clique_aggregator(..., already_symmetric=True)``.
    """
    from graph_mining_spark.checkpoint import cut_lineage

    k = int(min_clique_size) - 1
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    cur = cut_lineage(
        symmetrize(e.withColumn("weight", F.lit(1.0))).select("src", "dst").distinct()
    )
    n_prev = None
    for _ in range(max_iterations):
        # the kept-vertex count from the degree aggregate IS the
        # fixpoint test — no separate distinct-count job per round
        deg = cur.groupBy("src").agg(F.count("*").alias("_d"))
        keep = deg.filter(F.col("_d") >= k).select("src").persist()
        n_now = keep.count()
        if n_now == n_prev:
            keep.unpersist()
            break
        n_prev = n_now
        cur = cut_lineage(
            cur.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
        )
        keep.unpersist()
    return cur


def clique_aggregator(
    edges: DataFrame,
    config: CliqueAggregatorConfig | None = None,
    already_symmetric: bool = False,
) -> DataFrame:
    """Distributed clique aggregator: per-connected-component kernels.

    ``edges``: (src, dst[, weight]) — weights are ignored (the reference
    clusters an UnweightedGbbsGraph, clique_aggregator.h:88).
    Returns (cluster_key string, member long, cluster_size int,
    density double); ``cluster_key`` = "<component label>:<emission
    index>" — deterministic because the per-component recursion is
    sequential and the component labels are canonical min-ids.
    Clusters may overlap, so the flat form repeats members across keys.
    """
    cfg = config or CliqueAggregatorConfig()
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = e if already_symmetric else symmetrize(e.withColumn("weight", F.lit(1.0))).select("src", "dst")
    # one canonical direction per undirected edge, deduped
    und = sym.filter(F.col("src") < F.col("dst")).distinct()

    if cfg.allow_disconnected_clusters:
        grouped = und.withColumn("label", F.lit(0))
    else:
        labels = connected_components(
            sym.withColumn("weight", F.lit(1.0)), already_symmetric=True
        )
        grouped = und.join(
            labels.select(F.col("vid").alias("src"), "label"), "src"
        )

    def run(pdf):
        import pandas as pd

        pairs = list(zip((int(s) for s in pdf["src"]), (int(d) for d in pdf["dst"])))
        nodes = sorted({v for p in pairs for v in p})
        label = int(pdf["label"].iloc[0])
        clusters = clique_aggregator_kernel(nodes, pairs, cfg)
        rows = [
            (f"{label}:{i}", int(m), len(members), float(d))
            for i, (members, d) in enumerate(clusters)
            for m in members
        ]
        return pd.DataFrame(
            rows, columns=["cluster_key", "member", "cluster_size", "density"]
        )

    return grouped.groupBy("label").applyInPandas(
        run, schema="cluster_key string, member long, cluster_size int, density double"
    )
