"""Pure-Python/NumPy oracles mirroring the reference semantics
(SURVEY.md §5, FIXTURES.md §4) — used for exact/allclose comparison
against the Spark operators on small graphs."""

from __future__ import annotations

import itertools
from collections import defaultdict

import numpy as np


def bfs_components(n_or_vids, edges) -> dict[int, int]:
    """Min-id component labels via BFS.  ``edges``: (u,v[,w]) iterable."""
    vids = set(range(n_or_vids)) if isinstance(n_or_vids, int) else set(n_or_vids)
    adj = defaultdict(set)
    for e in edges:
        u, v = int(e[0]), int(e[1])
        adj[u].add(v)
        adj[v].add(u)
        vids.add(u)
        vids.add(v)
    labels = {}
    for start in sorted(vids):
        if start in labels:
            continue
        comp, queue = [], [start]
        seen = {start}
        while queue:
            x = queue.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    queue.append(y)
        m = min(comp)
        for x in comp:
            labels[x] = m
    return labels


def pagerank_oracle(
    vids, directed_edges, damping=0.85, approx_precision=1e-6, max_iterations=10**6, sources=None
) -> dict[int, float]:
    """Dense power iteration with the reference convergence contract
    (pagerank.proto:29-34): stop when L1 diff < approx_precision * n.
    Dangling mass redistributed through the restart distribution."""
    vids = sorted(set(vids) | {int(u) for u, *_ in directed_edges} | {int(e[1]) for e in directed_edges})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    out = defaultdict(list)
    for e in directed_edges:
        out[idx[int(e[0])]].append(idx[int(e[1])])
    deg = np.array([len(out[i]) for i in range(n)], dtype=np.float64)
    p = np.zeros(n)
    if sources:
        for s in sources:
            p[idx[int(s)]] = 1.0 / len(sources)
    else:
        p[:] = 1.0 / n
    r = p.copy() if sources else np.full(n, 1.0 / n)
    for _ in range(max_iterations):
        contrib = np.zeros(n)
        for i in range(n):
            if deg[i] > 0:
                share = r[i] / deg[i]
                for j in out[i]:
                    contrib[j] += share
        dangling = float(r[deg == 0].sum())
        new = (1 - damping) * p + damping * (contrib + dangling * p)
        l1 = float(np.abs(new - r).sum())
        r = new
        if l1 < approx_precision * n:
            break
    return {v: float(r[idx[v]]) for v in vids}


def triangle_oracle(vids, edges) -> dict[int, int]:
    """Brute-force per-vertex triangle counts over undirected edges."""
    vids = set(vids)
    und = set()
    for e in edges:
        u, v = int(e[0]), int(e[1])
        if u != v:
            und.add((min(u, v), max(u, v)))
            vids.add(u)
            vids.add(v)
    counts = dict.fromkeys(vids, 0)
    nodes = sorted(vids)
    eset = und
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return counts


def canonicalize_clusters(labels: dict[int, int]) -> list[tuple[int, ...]]:
    """Reference comparison form (clustering_utils.h:30-40): sort ids
    within cluster, sort clusters lexicographically."""
    by_label = defaultdict(list)
    for v, lb in labels.items():
        by_label[lb].append(v)
    return sorted(tuple(sorted(m)) for m in by_label.values())


def seeded_er_edges(n: int, p: float, seed: int = 7, weighted: bool = False):
    """Deterministic Erdős–Rényi G(n, p) fixture (generator semantics
    mirror reference generation/erdos_renyi.cc:30-48)."""
    rng = np.random.default_rng(seed)
    edges = []
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < p:
                w = float(np.round(rng.random() * 10, 3)) if weighted else 1.0
                edges.append((u, v, w))
    return edges
