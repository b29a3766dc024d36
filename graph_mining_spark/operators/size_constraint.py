"""Size-constrained affinity merging (EnforceMaxClusterSize).

Parity target: /root/reference/in_memory/clustering/affinity/
parallel_affinity_internal.cc:513-645 (EnforceMaxClusterSize) and
/root/reference/in_memory/tree_partitioner/min_size_tree_partitioning.cc
(MinWeightedSizeTreePartitioning), config semantics
affinity.proto:115-160 (SizeConstraint).

Semantics per connected component of the best-neighbor forest:
  - sort member nodes by (best-edge weight desc, node weight asc, id asc);
  - sequential union-find over the sorted best edges:
      * skip when both endpoints already share a root;
      * prefer_min_cluster_size: skip when BOTH roots already weigh
        ≥ min_cluster_size (min has precedence over max);
      * unite when no max_cluster_size or combined weight ≤ max;
  - target_cluster_size: record the merges as a rooted forest and run
    min-weighted-size tree partitioning with threshold = target; the
    final clusters are the components of the partitioned forest.

Spark shape: the per-component sequential pass is exactly the
applyInPandas pattern SURVEY §2.2 prescribes — components are
independent, so the hash shuffle on the component label distributes
them and each group runs the reference's sequential algorithm on its
own (component-sized) pandas frame.  At 100 TB the bound is the
LARGEST component, which is the same bound the reference's
per-component sequential loop has; components beyond pandas scale
should be pre-split by a lower affinity threshold upstream.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SizeConstraint:
    """affinity.proto:115-160."""

    max_cluster_size: float | None = None
    min_cluster_size: float | None = None
    prefer_min_cluster_size: bool = False
    target_cluster_size: float | None = None


# ---------- min-weighted-size tree partitioning (pure python) ----------


def _partition_clusters(nodes_with_weights, thr, root_id):
    """PartitionClusters (min_size_tree_partitioning.cc:77-135): greedy
    sweep over nodes sorted by (unassigned weight asc, id asc)."""
    s = sorted(nodes_with_weights, key=lambda p: (p[1], p[0]))
    cmap = []
    last_w, cur_w = 0.0, 0.0
    last_id, cur_id = None, None
    for nid, w in s:
        cur_w += w
        if cur_id is None:
            cur_id = nid
        cmap.append([nid, cur_id])
        if cur_w >= thr:
            last_w, last_id = cur_w, cur_id
            cur_w, cur_id = 0.0, None
    if cur_id is not None and cur_w < thr:
        for p in cmap:
            if p[1] == cur_id:
                p[1] = last_id
    old = next(c for n, c in cmap if n == root_id)
    for p in cmap:
        if p[1] == old:
            p[1] = root_id
    return cmap


def _partition_subtree(root, thr, children, subtree_w, node_w, result_parent):
    """PartitionSubtree (min_size_tree_partitioning.cc:147-270), the
    reference's explicit-stack recursion ported 1:1."""
    stack = [
        {"root": root, "outside": 0.0, "nproc": 0, "unassigned": subtree_w[root], "nodes": []}
    ]
    while stack:
        st = stack[-1]
        ch = children.get(st["root"], ())
        if st["nproc"] < len(ch):
            c = ch[st["nproc"]]
            stack.append(
                {
                    "root": c,
                    "outside": st["unassigned"] - subtree_w[c],
                    "nproc": 0,
                    "unassigned": st["unassigned"],
                    "nodes": [],
                }
            )
            continue
        st["nodes"].append((st["root"], node_w[st["root"]]))
        in_tree = sum(w for _, w in st["nodes"])
        if in_tree < thr:
            pair = (st["root"], in_tree)
            up = st["outside"] + in_tree
            stack.pop()
            parent = stack[-1]
            parent["unassigned"] = up
            parent["nodes"].append(pair)
            parent["nproc"] += 1
            continue
        cmap = _partition_clusters(st["nodes"], thr, st["root"])
        old_parent_of_root = result_parent[st["root"]]
        for nid, cid in cmap:
            result_parent[nid] = -1 if nid == cid else cid
        if old_parent_of_root != -1 and st["outside"] < thr:
            w_root_cluster = sum(
                w
                for nid, w in st["nodes"]
                if result_parent[nid] == st["root"] or nid == st["root"]
            )
            pair = (st["root"], w_root_cluster)
            up = st["outside"] + w_root_cluster
            stack.pop()
            parent = stack[-1]
            parent["unassigned"] = up
            parent["nodes"].append(pair)
            parent["nproc"] += 1
        else:
            up = st["outside"]
            stack.pop()
            if stack:
                parent = stack[-1]
                parent["unassigned"] = up
                parent["nproc"] += 1


def min_weighted_size_tree_partitioning(parent_ids, node_weights, thr):
    """MinWeightedSizeTreePartitioning (min_size_tree_partitioning.cc:
    272-298) over dict-keyed node ids.  ``parent_ids``: {id: parent or
    -1}; returns the result parent map."""
    if thr < 0:
        raise ValueError("negative min_weight_threshold")
    from collections import deque

    # All iteration below runs in ascending-id order: the reference
    # builds children lists by a topological BFS seeded in node-id
    # order (min_size_tree_partitioning.cc:46-53), and child order
    # changes the partitioning result — seeding from dict insertion
    # order (= shuffle row order) would make results depend on the
    # partitioning of the input.
    ids = sorted(parent_ids)
    children: dict = {}
    subtree_w = dict(node_weights)
    indeg = {i: 0 for i in ids}
    for i in ids:
        p = parent_ids[i]
        if p != -1:
            indeg[p] += 1
    queue = deque(i for i in ids if indeg[i] == 0)
    processed = 0
    while queue:
        cur = queue.popleft()
        processed += 1
        p = parent_ids[cur]
        if p != -1:
            indeg[p] -= 1
            subtree_w[p] += subtree_w[cur]
            children.setdefault(p, []).append(cur)
            if indeg[p] == 0:
                queue.append(p)
    if processed != len(parent_ids):
        raise ValueError("invalid parent ids: cycle detected")
    result = dict(parent_ids)
    for i in ids:
        if parent_ids[i] == -1 and subtree_w[i] > thr:
            _partition_subtree(i, thr, children, subtree_w, node_weights, result)
    return result


# ---------- per-component sequential enforcement ----------


def _enforce_component(rows, sc: SizeConstraint):
    """rows: list of (vid, bn_vid, bn_weight, node_weight); returns
    {vid: final_label} with label = min member vid (canonical form of
    the reference's union-find roots)."""
    node_w = {v: nw for v, _, _, nw in rows}
    order = sorted(rows, key=lambda r: (-r[2], r[3], r[0]))

    parent: dict = {v: v for v in node_w}
    weight = dict(node_w)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    use_target = sc.target_cluster_size is not None and sc.target_cluster_size > 0
    forest_parent = {v: -1 for v in node_w} if use_target else None

    for vid, bn, _w, _nw in order:
        if bn is None or bn not in parent:
            continue
        ra, rb = find(vid), find(bn)
        if ra == rb:
            continue
        if (
            sc.prefer_min_cluster_size
            and sc.min_cluster_size is not None
            and weight[ra] >= sc.min_cluster_size
            and weight[rb] >= sc.min_cluster_size
        ):
            continue
        total = weight[ra] + weight[rb]
        if sc.max_cluster_size is None or total <= sc.max_cluster_size:
            parent[rb] = ra
            weight[find(ra)] = total
            if use_target:
                forest_parent[vid] = bn

    if use_target:
        result_parent = min_weighted_size_tree_partitioning(
            forest_parent, node_w, float(sc.target_cluster_size)
        )
        parent2 = {v: v for v in node_w}

        def find2(x):
            while parent2[x] != x:
                parent2[x] = parent2[parent2[x]]
                x = parent2[x]
            return x

        for v, p in result_parent.items():
            if p != -1:
                parent2[find2(v)] = find2(p)
        roots = {v: find2(v) for v in node_w}
    else:
        roots = {v: find(v) for v in node_w}

    by_root: dict = {}
    for v, r in roots.items():
        by_root.setdefault(r, []).append(v)
    return {v: min(by_root[r]) for v, r in roots.items()}


def enforce_max_cluster_size(
    best: DataFrame,
    components: DataFrame,
    size_constraint: SizeConstraint,
    node_weights: DataFrame | None = None,
) -> DataFrame:
    """Distributed EnforceMaxClusterSize: hash-distribute components,
    run the reference's sequential per-component pass in applyInPandas.

    ``best``: (src, dst, weight) — each node's best neighbor (the
    affinity forest).  ``components``: (vid, label) — connected
    components of that forest (the unconstrained affinity clusters).
    ``node_weights``: optional (vid, node_weight), default 1.0.
    Returns (vid, label) with label = min member vid per final cluster.
    """
    sc = size_constraint
    nw = (
        node_weights.select("vid", F.col("node_weight").cast("double"))
        if node_weights is not None
        else components.select("vid", F.lit(1.0).alias("node_weight"))
    )
    joined = (
        components.join(nw, "vid")
        .join(
            best.select(
                F.col("src").alias("vid"),
                F.col("dst").alias("_bn"),
                F.col("weight").alias("_bw"),
            ),
            "vid",
            "left",
        )
        .select("label", "vid", "_bn", F.coalesce("_bw", F.lit(0.0)).alias("_bw"), "node_weight")
    )

    def run(pdf):
        import pandas as pd

        # column access, not itertuples: pandas renames leading-underscore
        # fields to positional names in namedtuples
        rows = [
            (
                int(v),
                None if pd.isna(bn) else int(bn),
                float(bw),
                float(nw_),
            )
            for v, bn, bw, nw_ in zip(
                pdf["vid"], pdf["_bn"], pdf["_bw"], pdf["node_weight"]
            )
        ]
        out = _enforce_component(rows, sc)
        return pd.DataFrame({"vid": list(out.keys()), "label": list(out.values())})

    return joined.groupBy("label").applyInPandas(run, schema="vid long, label long")
