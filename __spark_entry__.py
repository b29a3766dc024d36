"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship run on sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator differential gate: the
driver runs each Spark query AND the DuckDB SQL twin at sf=0.01 and
compares row-count + schema + order-insensitive value hash.

Conventions keeping the two engines hash-identical:
  - every aggregate/computed column aliased the same on both sides;
  - integer outputs cast to BIGINT/long on both sides;
  - float outputs rounded (6dp; cosine 4dp) AFTER double arithmetic;
  - deterministic tie-breaks on every window.

Queries without an oracle entry (fixpoint iterations, LSH internals,
the synthesized link-graph pipeline) are gated instead by the exact
pytest oracles in tests/ (BFS / NumPy power iteration / brute force).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_mining_spark.functions.ann import cosine_topk, lsh_cosine_topk
from graph_mining_spark.functions.dedup import (
    dedup_exact,
    embedding_near_dup_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from graph_mining_spark.functions.text import (
    QUALITY_STOPWORDS,
    language_id,
    quality_scores,
    text_fingerprint,
    text_stats,
    token_counts,
)
from graph_mining_spark.graph import degrees, sparsify_top_k, symmetrize, vertex_ids
from graph_mining_spark.ingest import build_link_graph, synthesize_source_files
from graph_mining_spark.operators.affinity import (
    AffinityConfig,
    affinity_cluster,
    best_neighbor,
    cluster_stats,
    compress_graph,
)
from graph_mining_spark.operators.connected_components import (
    connected_components,
    connected_components_csr,
)
from graph_mining_spark.operators.correlation import (
    CorrelationConfig,
    correlation_cluster,
    modularity_cluster,
)
from graph_mining_spark.operators.pagerank import pagerank, pagerank_csr
from graph_mining_spark.operators.quick_cluster import quick_cluster
from graph_mining_spark.operators.shortest_paths import sssp
from graph_mining_spark.operators.similarity import pairwise_similarity
from graph_mining_spark.operators.triangles import triangle_counts
from graph_mining_spark.tpch_graph import (
    BIPARTITE_E_SQL,
    BIPARTITE_SYM_SQL,
    COPARTS_E_SQL,
    NATIONS_E_SQL,
    REGION_CLIQUE_LABELS_SQL,
    bipartite_sym,
    coparts_edges,
    nations_edges,
    region_clique_edges,
)

DOCS = "documents"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full link-graph pipeline on the sf0.001-scale derived
    graph — PageRank + components + communities joined per vertex."""
    sf_dir = "/root/testdata/sf0.001"
    sym = bipartite_sym(spark, sf_dir)
    ranks = pagerank(sym, max_iterations=20)
    labels = connected_components(sym, already_symmetric=True)
    comms = affinity_cluster(sym, AffinityConfig(num_iterations=1, edge_aggregation="sum"))
    out = (
        ranks.join(labels, "vid")
        .join(comms.withColumnRenamed("label", "community"), "vid")
        .select("vid", F.round("rank", 6).alias("rank"), "label", "community")
        .orderBy(F.desc("rank"), "vid")
        .limit(100)
    )
    return out


# ---------- helpers ----------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _mod7_labels(sym: DataFrame) -> DataFrame:
    return vertex_ids(sym).select("vid", (F.col("vid") % 7).alias("label"))


# ---------- queries ----------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # -- graph build / sources (SURVEY §2.1) --
    q["edge_build_bipartite"] = lambda s, d: bipartite_sym(s, d)
    q["degrees_bipartite"] = lambda s, d: degrees(bipartite_sym(s, d)).select(
        "vid", F.col("degree").cast("long").alias("degree"),
        F.round("weighted_degree", 6).alias("weighted_degree"),
    )
    q["sparsify_top5_soft"] = lambda s, d: sparsify_top_k(bipartite_sym(s, d), k=5, soft=True)

    # -- core per-round operators (SURVEY §2.2) --
    q["best_neighbor_bipartite"] = lambda s, d: best_neighbor(bipartite_sym(s, d))
    q["cc_nations"] = lambda s, d: connected_components(
        nations_edges(s, d),
        vertices=s.read.parquet(f"{d}/nation.parquet").select(
            F.col("n_nationkey").cast("long").alias("vid")
        ),
    )
    q["triangles_coparts"] = lambda s, d: triangle_counts(coparts_edges(s, d))

    def _cluster_stats(s, d):
        sym = bipartite_sym(s, d)
        st = cluster_stats(sym, _mod7_labels(sym))
        return st.select(
            "label", F.col("n_nodes").cast("long").alias("n_nodes"),
            F.round("intra_weight", 6).alias("intra_weight"),
            F.round("inter_weight", 6).alias("inter_weight"),
            F.round("volume", 6).alias("volume"),
            F.round("density", 6).alias("density"),
            F.round("conductance", 6).alias("conductance"),
        )

    q["cluster_stats_mod7"] = _cluster_stats

    def _contract(s, d):
        sym = bipartite_sym(s, d)
        labels = _mod7_labels(sym)
        nw = labels.select("vid", F.lit(1.0).alias("node_weight"))
        new_edges, _ = compress_graph(sym, labels, nw, agg="sum")
        return new_edges

    q["contract_sum_mod7"] = _contract

    q["pagerank_iter2_bipartite"] = lambda s, d: pagerank(
        bipartite_sym(s, d), max_iterations=2
    ).select("vid", F.round("rank", 6).alias("rank"))

    # all four neighbor-similarity metrics in ONE query (one driver
    # slot; each metric still hash-gated through the union)
    def _pairwise_all(s, d):
        e = nations_edges(s, d)
        out = None
        for metric in ("jaccard", "common", "cosine", "total"):
            part = pairwise_similarity(e, metric=metric).select(
                F.lit(metric).alias("metric"), "a", "b", "similarity"
            )
            out = part if out is None else out.unionByName(part)
        return out

    q["pairwise_all_nations"] = _pairwise_all

    q["sssp_nations"] = lambda s, d: sssp(
        symmetrize(nations_edges(s, d)), source_vid=0
    ).select("vid", F.round("distance", 6).alias("distance"))

    def _contract_avg(s, d):
        sym = bipartite_sym(s, d)
        labels = _mod7_labels(sym)
        nw = labels.select("vid", F.lit(1.0).alias("node_weight"))
        new_edges, _ = compress_graph(sym, labels, nw, agg="default_average")
        return new_edges.select("src", "dst", F.round("weight", 6).alias("weight"))

    q["contract_avg_mod7"] = _contract_avg

    def _contract_pct(s, d):
        sym = bipartite_sym(s, d)
        labels = _mod7_labels(sym)
        nw = labels.select("vid", F.lit(1.0).alias("node_weight"))
        new_edges, _ = compress_graph(
            sym, labels, nw, agg="percentile", percentile=0.5, min_edge_count_for_percentile=4
        )
        return new_edges

    q["contract_percentile_mod7"] = _contract_pct

    # CSR fast paths with the SAME oracles as their DataFrame twins
    q["cc_csr_nations"] = lambda s, d: connected_components_csr(
        nations_edges(s, d),
        vertices=s.read.parquet(f"{d}/nation.parquet").select(
            F.col("n_nationkey").cast("long").alias("vid")
        ),
        partitions=4,
    )
    q["pagerank_csr_iter2_bipartite"] = lambda s, d: pagerank_csr(
        bipartite_sym(s, d), max_iterations=2
    ).select("vid", F.round("rank", 6).alias("rank"))

    # -- fixpoint iterations (full-convergence twins of the iterN
    # oracles; the CSR/DataFrame equality itself is pytest-gated) --
    # NOTE: pagerank_bipartite / pagerank_csr_bipartite (rows-only
    # full-fixpoint twins of the oracle-gated iter2/iter20 queries)
    # were retired from the registry for the driver's 50-query budget;
    # tests/test_pagerank.py and tests/test_csr.py still gate them.
    q["cc_bipartite"] = lambda s, d: connected_components(
        bipartite_sym(s, d), already_symmetric=True
    )
    q["cc_csr_bipartite"] = lambda s, d: connected_components_csr(
        bipartite_sym(s, d), already_symmetric=True
    )
    q["affinity_bipartite"] = lambda s, d: affinity_cluster(
        bipartite_sym(s, d), AffinityConfig(num_iterations=2, edge_aggregation="sum")
    )

    # exactly-20-iteration PageRank (approx_precision=0 disables the
    # early stop) — the deep-iteration twin of the unrolled SQL oracle
    q["pagerank_iter20_bipartite"] = lambda s, d: pagerank(
        bipartite_sym(s, d), max_iterations=20, approx_precision=0.0, check_every=5
    ).select("vid", F.round("rank", 6).alias("rank"))

    def _ppr(s, d):
        sym = bipartite_sym(s, d)
        srcs = [r["vid"] for r in vertex_ids(sym).filter(F.col("vid") % 50 == 2).collect()]
        return pagerank(sym, max_iterations=2, source_vids=srcs).select(
            "vid", F.round("rank", 6).alias("rank")
        )

    q["pagerank_ppr_iter2_bipartite"] = _ppr

    # UndirectedConverter AVG / REMOVE modes on an asymmetric directed
    # input (the raw bipartite graph is one-directional, so the reverse
    # copy gets doubled weights to make the agg modes observable)
    def _asym(s, d):
        from graph_mining_spark.tpch_graph import bipartite_edges

        e = bipartite_edges(s, d)
        rev = e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), (F.col("weight") * 2).alias("weight")
        )
        return e.unionByName(rev)

    # both UndirectedConverter modes in one query (mode column keeps
    # each hash-gated)
    def _symmetrize_modes(s, d):
        avg = symmetrize(_asym(s, d), agg="avg").select(
            F.lit("avg").alias("mode"), "src", "dst", F.round("weight", 6).alias("weight")
        )
        rem = symmetrize(_asym_partial(s, d), agg="remove").select(
            F.lit("remove").alias("mode"), "src", "dst", F.round("weight", 6).alias("weight")
        )
        return avg.unionByName(rem)

    q["symmetrize_modes_asym"] = _symmetrize_modes

    def _asym_partial(s, d):
        from graph_mining_spark.tpch_graph import bipartite_edges

        e = bipartite_edges(s, d)
        rev = e.filter(F.col("src") % 6 == 0).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), (F.col("weight") * 2).alias("weight")
        )
        return e.unionByName(rev)

    # minla L2 (iterative weighted-mean placement, 3 unrolled
    # iterations, early stop disabled) — fully SQL-expressible
    def _minla(s, d):
        from graph_mining_spark.operators.minla import (
            MinlaConfig,
            minimum_linear_arrangement,
        )

        return minimum_linear_arrangement(
            nations_edges(s, d),
            MinlaConfig(cost_metric="l2", max_iterations=3, placement_convergence_delta=-1.0),
        )

    q["minla_l2_nations"] = _minla

    # one deterministic synchronous Louvain round from singletons
    # (correlation objective; swap-guard semantics — see correlation.py)
    q["louvain_round1_bipartite"] = lambda s, d: correlation_cluster(
        bipartite_sym(s, d),
        CorrelationConfig(
            edge_weight_offset=1.5, resolution=0.0,
            louvain_num_iterations=1, louvain_num_inner_iterations=1,
        ),
        already_symmetric=True,
    )

    # one synchronous BIPARTITE-objective round (use_bipartite_objective,
    # correlation.proto:141-157) on a mixed graph: the cross-part
    # bipartite edges plus planted customer–customer (same-part) edges.
    # From singletons, a same-part target costs no resolution penalty
    # while a cross-part target costs res — the SQL twin reproduces the
    # part-aware delta exactly
    def _corr_bip(s, d):
        from graph_mining_spark.graph import vertex_ids

        sym = bipartite_sym(s, d)
        cust = s.read.parquet(f"{d}/customer.parquet").select(
            (F.col("c_custkey") * 2).alias("vid")
        )
        a = cust.alias("a")
        b = cust.alias("b")
        extra = (
            a.join(b, F.col("b.vid") == F.col("a.vid") + 20)
            .filter((F.col("a.vid") / 2) % 10 == 0)
            .select(F.col("a.vid").alias("src"), F.col("b.vid").alias("dst"), F.lit(2.0).alias("weight"))
        )
        e = sym.unionByName(extra.unionByName(extra.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")))
        parts = vertex_ids(e).select("vid", (F.col("vid") % 2).cast("int").alias("part"))
        return correlation_cluster(
            e,
            CorrelationConfig(
                edge_weight_offset=1.5, resolution=0.25,
                louvain_num_iterations=1, louvain_num_inner_iterations=1,
                use_bipartite_objective=True,
            ),
            already_symmetric=True,
            parts=parts,
        )

    q["correlation_bipartite_round1"] = _corr_bip

    # multi-level Louvain (refinement + block-async schedules) +
    # modularity labels in ONE tagged slot, oracle-gated via provable
    # regimes: with edge_weight_offset=0 and resolution=0 every intra
    # edge carries a strictly positive margin, so merging any two
    # connected clusters strictly increases the correlation objective —
    # the unique objective maximum is one cluster per connected
    # component, and 4 compression levels reach it on the ≤5-vertex
    # nations paths (verified; both the refinement walk and the
    # block-Gauss-Seidel schedule, the deterministic Spark analog of
    # the reference's ASYNC default, run their full machinery to that
    # fixpoint).  Modularity runs on the region-clique graph, where the
    # partition into cliques is optimal (cross-component merges cost
    # −res·k_u·k_v with zero edge gain; within a clique every coarser
    # split has a positive-gain move).  DuckDB twins: recursive CC and
    # a per-region min-nationkey join.  The order-dependent bipartite
    # full fixpoints (offset 1.5) stay gated by the exact sequential
    # oracles in tests/test_correlation.py.
    def _louvain_modularity(s, d):
        e = nations_edges(s, d)
        merge_cfg = dict(
            edge_weight_offset=0.0, resolution=0.0,
            louvain_num_iterations=4, louvain_num_inner_iterations=4,
        )

        def canon(lab, tag):
            c = lab.groupBy("label").agg(F.min("vid").alias("_c"))
            return lab.join(c, "label").select(
                F.lit(tag).alias("variant"), "vid", F.col("_c").alias("label")
            )

        louv = canon(
            correlation_cluster(e, CorrelationConfig(use_refinement=True, **merge_cfg)),
            "louvain_refined",
        )
        blk = canon(
            correlation_cluster(
                e,
                CorrelationConfig(
                    move_schedule="block_async", num_move_blocks=2, **merge_cfg
                ),
            ),
            "louvain_block_async",
        )
        mod = canon(
            modularity_cluster(region_clique_edges(s, d), resolution=0.5),
            "modularity_cliques",
        )
        # classic synchronous LPA (north rule: "label-propagation
        # community detection"), two provable regimes: on disjoint
        # cliques sync LPA converges to the min-member labels (round 1
        # elects (min, second-min), round 2 is a strict majority for
        # the min — see operators/label_propagation.py); on the
        # weighted bipartite graph a FIXED 2-iteration run has a direct
        # SQL twin (iter1 votes reduce to best-neighbor because labels
        # start as the identity)
        from graph_mining_spark.operators.label_propagation import label_propagation

        lpa_c = label_propagation(region_clique_edges(s, d), max_iterations=20).select(
            F.lit("lpa_cliques").alias("variant"), "vid", "label"
        )
        lpa_2 = label_propagation(
            bipartite_sym(s, d), max_iterations=2, already_symmetric=True
        ).select(F.lit("lpa_sync_iter2").alias("variant"), "vid", "label")
        return louv.unionByName(blk).unionByName(mod).unionByName(lpa_c).unionByName(lpa_2)

    q["louvain_modularity_labels"] = _louvain_modularity

    # the correlation OBJECTIVE itself is a closed formula —
    # Σ_intra (w − offset) − res/2 · Σ_C (K_C² − Σ k_v²) — so the
    # evaluator gets a full DuckDB twin on fixed mod-7 labels with
    # non-uniform node weights
    def _corr_obj(s, d):
        from graph_mining_spark.operators.correlation import correlation_objective

        sym = bipartite_sym(s, d)
        labels = _mod7_labels(sym)
        nw = labels.select(
            "vid", (F.lit(1.0) + (F.col("vid") % 3)).cast("double").alias("node_weight")
        )
        val = correlation_objective(
            sym, labels, node_weights=nw, resolution=0.05, edge_weight_offset=0.1
        )
        return s.createDataFrame([(float(val),)], "objective double").select(
            F.round("objective", 4).alias("objective")
        )

    q["correlation_objective_mod7_bipartite"] = _corr_obj

    # size-constrained affinity (EnforceMaxClusterSize), oracle-gated
    # via two provable regimes in one tagged slot: (a) max_cluster_size
    # = 1 with unit node weights gates the size-constrained
    # BEST-NEIGHBOR pre-filter — every proposed merge would weigh
    # 1+1 > 1, so all edges are filtered, best_neighbor is empty, and
    # the provable output is all-singletons (NOTE: the tree-partitioner
    # recursion never runs in this regime; affinity breaks at the
    # empty-forest check first), and (b) the real max=8 run reports
    # coverage (every vertex labeled exactly once) and the operator's
    # hard cap contract (zero oversize clusters) — that run DOES
    # exercise the split recursion, contract-checked rather than
    # split-for-split.  The order-dependent WHICH-split surface stays
    # gated by reference-fixture parity in
    # tests/test_size_constraint.py.
    def _affinity_sized(s, d):
        from graph_mining_spark.operators.size_constraint import SizeConstraint

        sym = bipartite_sym(s, d)
        cap1 = affinity_cluster(
            sym,
            AffinityConfig(
                num_iterations=1, edge_aggregation="sum",
                size_constraint=SizeConstraint(max_cluster_size=1),
            ),
        ).select(
            F.lit("cap1_singletons").alias("variant"),
            F.col("vid").alias("id1"), F.col("label").alias("id2"),
        )
        cap8 = affinity_cluster(
            sym,
            AffinityConfig(
                num_iterations=1, edge_aggregation="sum",
                size_constraint=SizeConstraint(max_cluster_size=8),
            ),
        )
        coverage = cap8.agg(
            F.count("*").cast("long").alias("id1"),
            F.countDistinct("vid").cast("long").alias("id2"),
        ).select(F.lit("cap8_coverage").alias("variant"), "id1", "id2")
        oversize = (
            cap8.groupBy("label").agg(F.count("*").alias("_sz"))
            .agg(F.sum((F.col("_sz") > 8).cast("long")).alias("id1"))
            .select(
                F.lit("cap8_oversize").alias("variant"),
                F.col("id1").cast("long").alias("id1"),
                F.lit(0).cast("long").alias("id2"),
            )
        )
        return cap1.unionByName(coverage).unionByName(oversize)

    q["affinity_sized_bipartite"] = _affinity_sized

    # ParHac (1+ε)-approximate HAC + dynamic HAC in ONE tagged slot,
    # FULLY oracle-gated: on the nations fixture every feasible
    # average-linkage merge has similarity ≥ 1/6 > 0.05 (see the
    # terahac_nations note), so both runs at threshold 0.05 provably
    # merge each component completely and their min-member-canonical
    # flat labels equal connected components — for the dynamic variant,
    # the components OF THE POST-REMOVAL graph (insert all edges,
    # remove vids 3 and 17 through the CLUSTER-granular dirty unit).
    # A DuckDB twin runs recursive CC on both edge sets independently.
    # Merge sequences stay gated by the sequential oracle in
    # tests/test_hac.py; dynamic scratch-equivalence in
    # tests/test_dynamic_hac.py.
    def _hac_labels(s, d):
        from graph_mining_spark.operators.dynamic_hac import DynamicHac
        from graph_mining_spark.operators.hac import ParHacConfig, parhac

        _, labels = parhac(
            nations_edges(s, d), ParHacConfig(epsilon=0.1, linkage_threshold=0.05)
        )
        e = nations_edges(s, d)
        dyn = DynamicHac(s, weight_threshold=0.05, epsilon=0.0, dirty_unit="cluster")
        dyn.insert(e.filter(F.col("src") < 12))
        dyn.insert(e.filter(F.col("src") >= 12))
        dyn.remove(s.createDataFrame([(3,), (17,)], "vid long"))
        return labels.select(F.lit("parhac").alias("variant"), "vid", "label").unionByName(
            dyn.flat_cluster().select(F.lit("dynamic_seq").alias("variant"), "vid", "label")
        )

    q["hac_labels_nations"] = _hac_labels

    # string-keyed tie-breaking (MaxWeightTiebreaker) — driver gate runs
    # the md5 fingerprint mode, whose lowercase-hex fingerprints DuckDB
    # reproduces bit-for-bit (md5() twin), so the EXACT salted
    # (weight, fingerprint) argmax is oracle-checked end-to-end; the
    # default xxhash64 mode (no DuckDB twin) stays gated by the
    # python-argmax oracle in tests/test_tiebreaking.py
    def _tiebreak(s, d):
        from graph_mining_spark.operators.tiebreaking import best_neighbor_string_tiebreak

        sym = bipartite_sym(s, d)
        keys = vertex_ids(sym).select(
            "vid", F.concat(F.lit("node:"), F.col("vid").cast("string")).alias("key")
        )
        return best_neighbor_string_tiebreak(sym, keys, hash_fn="md5")

    q["best_neighbor_tiebreak_bipartite"] = _tiebreak

    # FDE point-cloud sketches (Chamfer-similarity embeddings) — the
    # seeded Philox hyperplanes are deterministic constants, so the
    # DuckDB twin embeds them as literals and recomputes the full
    # pipeline in SQL (_fde_oracle_sql); kernel parity + Chamfer
    # contract additionally gated in tests/test_fde.py.  Clouds =
    # embedding rows grouped by their synthetic label column.
    def _fde(s, d):
        from graph_mining_spark.functions.fde import FdeConfig, fde_encode

        emb = s.read.parquet(f"{d}/embeddings.parquet").select(
            F.col("label").cast("long").alias("doc_id"), "embedding"
        )
        cfg = FdeConfig(
            dimension=64, num_repetitions=2, num_simhash_projections=3,
            encoding_type="average", fill_empty_partitions=True,
        )
        out = fde_encode(emb, cfg)
        return out.select(
            "doc_id",
            F.size("fde").cast("long").alias("fde_dim"),
            F.round(
                F.sqrt(F.aggregate("fde", F.lit(0.0), lambda a, v: a + v * v)), 4
            ).alias("fde_l2"),
        )

    q["fde_embeddings_by_label"] = _fde

    # coconductance Louvain + ACN-pivot QuickCluster in ONE tagged
    # slot, oracle-gated on the region-clique fixture where the clique
    # partition is provably optimal and reachable: every clique cluster
    # attains coconductance 2E/vol = 1 (the per-cluster maximum,
    # coconductance_internal.h:60-66), and ACN pivot clusters a whole
    # clique with its first pivot regardless of the hash permutation
    # (no cross-component edges exist to mis-grab).  Both run their
    # full multi-level / dependence-resolution machinery to that
    # fixpoint (verified); labels canonicalized to min member.  The
    # order-dependent coparts fixpoints stay gated by the exact
    # sequential oracles in tests/test_coconductance.py /
    # tests/test_quick_cluster.py.
    def _pivot_cocond(s, d):
        from graph_mining_spark.operators.coconductance import (
            CoconductanceConfig,
            coconductance_cluster,
        )

        cliq = region_clique_edges(s, d)
        cc = coconductance_cluster(
            cliq, CoconductanceConfig(exponent=1.0, num_levels=2, num_inner_iterations=3)
        ).select(F.lit("coconductance").alias("variant"), "vid", "label")
        qc = quick_cluster(cliq, edge_weight_offset=0.5)
        qcanon = qc.groupBy("label").agg(F.min("vid").alias("_c"))
        qc = qc.join(qcanon, "label").select(
            F.lit("quick_cluster").alias("variant"), "vid", F.col("_c").alias("label")
        )
        return cc.unionByName(qc)

    q["pivot_coconductance_cliques"] = _pivot_cocond

    # TeraHac — per-partition subgraph HAC, now FULLY oracle-gated: on
    # the nations fixture (unit-weight paths of ≤5 vertices per region)
    # every feasible average-linkage merge joins adjacent sub-paths with
    # cut weight 1 and size product ≤ 2·3, so its similarity is
    # ≥ 1/6 > 0.05 — HAC at threshold 0.05 therefore merges each
    # component COMPLETELY regardless of ε or merge order.  Three
    # provable regimes in one tagged slot: (a) ε=0.1 flat labels ==
    # connected components (labels are min-member canonical,
    # terahac.py:572-573); (b) threshold=∞ == all singletons; (c) the
    # ε=0 dendrogram has exactly 2n−C nodes and C roots (C components,
    # full binary merge tree per component).  A DuckDB recursive-CC
    # twin derives all three independently; exact merge SEQUENCES stay
    # gated in tests/test_terahac.py (ε=0 parity with sequential HAC).
    def _terahac(s, d):
        from graph_mining_spark.operators.terahac import TeraHacConfig, terahac

        e = nations_edges(s, d)
        labels, _log = terahac(e, TeraHacConfig(epsilon=0.1, linkage_threshold=0.05))
        lab_rows = labels.select(
            F.lit("labels_eps01").alias("variant"),
            F.col("vid").alias("id1"), F.col("label").alias("id2"),
            F.lit(None).cast("double").alias("val"),
        )
        none_labels, _log2 = terahac(e, TeraHacConfig(epsilon=0.0, linkage_threshold=1e9))
        none_rows = none_labels.select(
            F.lit("merge_none").alias("variant"),
            F.col("vid").alias("id1"), F.col("label").alias("id2"),
            F.lit(None).cast("double").alias("val"),
        )
        _labels, _log3, dendro = terahac(
            e, TeraHacConfig(epsilon=0.0, linkage_threshold=0.05, output_dendrogram=True)
        )
        shape_rows = dendro.agg(
            F.count("*").cast("long").alias("id1"),
            F.sum(F.col("parent_id").isNull().cast("long")).alias("id2"),
        ).select(
            F.lit("dendrogram_eps0_shape").alias("variant"), "id1", "id2",
            F.lit(None).cast("double").alias("val"),
        )
        return lab_rows.unionByName(none_rows).unionByName(shape_rows)

    q["terahac_nations"] = _terahac

    # clique aggregator (dense-subgraph covers) — recursive
    # Bron-Kerbosch-pruned kernel.  Run at min_density=1.0, where the
    # output is EXACTLY the maximal cliques of size >= 2
    # (clique_aggregator.h:31-42), so a DuckDB k-clique-join
    # enumeration is an independent full-pipeline oracle; the
    # density<1 config surface stays pytest-gated
    # (tests/test_clique_aggregator.py).  Clusters are re-keyed by
    # their sorted member list (the kernel's emission-index key is
    # order-dependent and has no SQL twin).
    def _clique(s, d):
        from graph_mining_spark.operators.clique_aggregator import (
            CliqueAggregatorConfig,
            clique_aggregator,
        )

        out = clique_aggregator(
            coparts_edges(s, d, order_mod=200),
            CliqueAggregatorConfig(min_density=1.0),
        )
        return (
            out.groupBy("cluster_key")
            .agg(F.sort_array(F.collect_list("member")).alias("ms"))
            .select(
                F.concat_ws(",", F.transform("ms", lambda x: x.cast("string"))).alias(
                    "clique"
                ),
                F.explode("ms").alias("member"),
                F.size("ms").cast("long").alias("cluster_size"),
            )
            .distinct()
        )

    q["clique_aggregator_coparts"] = _clique

    # parline balanced partitioning — affinity-hierarchy embedding +
    # contiguous balanced slicing.  The WHICH-vertex-goes-where
    # assignment is pytest-gated (sequential-oracle parity,
    # tests/test_parline.py); the driver gate here is the INVARIANT
    # summary, which a DuckDB twin derives independently from n and k
    # alone: per-cluster (size, min_rank, max_rank, sum_rank) must
    # equal the deterministic ±1-balanced contiguous intervals of a
    # 0..n-1 rank permutation (parallel_line.cc:205-223 slicing).  Any
    # balance, contiguity, interval-order, or rank-coverage defect in
    # the real parline output hash-mismatches the closed form.
    def _parline(s, d):
        from graph_mining_spark.operators.parline import ParlineConfig, parline

        out = parline(coparts_edges(s, d, order_mod=200), ParlineConfig(num_clusters=8))
        return (
            out.groupBy("cluster")
            .agg(
                F.count("*").alias("size"),
                F.min("rank").alias("min_rank"),
                F.max("rank").alias("max_rank"),
                F.sum("rank").alias("sum_rank"),
            )
            .select("cluster", "size", "min_rank", "max_rank", "sum_rank")
        )

    q["parline_coparts"] = _parline

    def _linkgraph(s, d):
        # no vendored hub here so the component structure is non-trivial
        # (one shared-content component per language group)
        files = synthesize_source_files(s, n_repos=40, files_per_repo=10, seed=42, with_vendored=False)
        _, verts, edges = build_link_graph(files)
        labels = connected_components(edges, vertices=verts.select("vid"))
        return (
            labels.groupBy("label").agg(F.count("*").cast("long").alias("n_files"))
            .orderBy(F.desc("n_files"), "label").limit(20)
        )

    q["linkgraph_pipeline"] = _linkgraph

    # -- training-data pipeline: dedup / text / similarity --
    q["dedup_exact_documents"] = lambda s, d: dedup_exact(_docs(s, d))

    # text_stats + quality_scores (Gopher-style ratios + combined
    # score) in one slot — both fully oracle-gated
    def _text_stats(s, d):
        stats = text_stats(_docs(s, d)).select(
            "doc_id", F.col("n_chars").cast("long").alias("n_chars"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "n_spaces", "n_digits", "avg_token_len",
        )
        return stats.join(quality_scores(_docs(s, d)), "doc_id")

    q["text_stats_documents"] = _text_stats
    q["token_counts_documents"] = lambda s, d: token_counts(_docs(s, d)).select(
        "doc_id", F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )
    q["lang_id_documents"] = lambda s, d: language_id(_docs(s, d))
    q["fingerprint_documents"] = lambda s, d: text_fingerprint(_docs(s, d))
    q["minhash_documents"] = lambda s, d: minhash_signatures(_docs(s, d)).select(
        "doc_id", F.col("seed").cast("long").alias("seed"), "minhash"
    )
    # near-duplicate PAIRS, both families in one tagged slot: word-
    # n-gram Jaccard over documents AND embedding-cosine over the
    # embeddings table (exact all-pairs path — the oracle baseline;
    # the LSH-bucketed scale path is recall-gated in pytest).  The
    # synthetic embeddings are isotropic (max pairwise cosine ≈ 0.51),
    # so the demo threshold sits at the distribution's tail.
    def _near_dup(s, d):
        jac = ngram_jaccard_pairs(_docs(s, d), n=3, threshold=0.2, block_col="lang").select(
            F.lit("ngram_jaccard").alias("variant"),
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b"),
            F.col("jaccard").alias("similarity"),
        )
        emb = s.read.parquet(f"{d}/embeddings.parquet")
        cos = embedding_near_dup_pairs(emb, threshold=0.4).select(
            F.lit("embedding_cosine").alias("variant"), "a", "b",
            F.col("cosine").alias("similarity"),
        )
        return jac.unionByName(cos)

    q["near_dup_pairs"] = _near_dup
    q["simhash_documents"] = lambda s, d: simhash(_docs(s, d))
    q["lsh_pairs_documents"] = lambda s, d: lsh_candidate_pairs(
        minhash_signatures(_docs(s, d)), num_hashes=8, bands=4
    )

    def _ann(s, d):
        emb = s.read.parquet(f"{d}/embeddings.parquet")
        return cosine_topk(emb, emb.filter(F.col("vec_id") % 50 == 0), k=3).select(
            "query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank")
        )

    q["ann_cosine_top3"] = _ann

    def _ann_lsh(s, d):
        emb = s.read.parquet(f"{d}/embeddings.parquet")
        return lsh_cosine_topk(emb, emb.filter(F.col("vec_id") % 50 == 0), k=3, n_planes=4).select(
            "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )

    q["ann_lsh_top3"] = _ann_lsh

    # -- relational / windowed (inherited Spark SQL surface, SURVEY §2.4) --
    def _q1(s, d):
        li = s.read.parquet(f"{d}/lineitem.parquet")
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
                F.count("*").cast("long").alias("n_rows"),
            )
        )

    q["relational_q1"] = _q1

    def _topk(s, d):
        from pyspark.sql import Window

        o = s.read.parquet(f"{d}/orders.parquet")
        w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        return (
            o.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 3)
            .select(
                "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"),
                F.col("r").cast("long").alias("r"),
            )
        )

    q["topk_orders_per_customer"] = _topk

    # batch side of the streaming surface: the SAME hourly_event_rollup
    # AND gap-based sessionize_events used by the Structured Streaming
    # path (batch/stream parity incl. the applyInPandasWithState
    # stateful operator is pytest-gated in tests/test_streaming.py;
    # this tagged slot hash-gates both shared expression trees against
    # DuckDB)
    def _events(s, d):
        from graph_mining_spark.streaming import hourly_event_rollup, sessionize_events

        ev = s.read.parquet(f"{d}/events.parquet")
        hourly = hourly_event_rollup(ev).select(
            F.lit("hourly").alias("variant"),
            F.col("hour").cast("string").alias("k1"),
            F.col("event_type").alias("k2"),
            F.lit(None).cast("string").alias("k3"),
            F.col("n").cast("long").alias("n"), F.round("total", 4).alias("total"),
        )
        sess = sessionize_events(ev, gap_minutes=30).select(
            F.lit("sessions").alias("variant"),
            F.col("user_id").cast("string").alias("k1"),
            F.col("session_start").cast("string").alias("k2"),
            F.col("session_end").cast("string").alias("k3"),
            F.col("n_events").cast("long").alias("n"),
            F.round("total_value", 4).alias("total"),
        )
        return hourly.unionByName(sess)

    q["events_hourly_sessions"] = _events

    # IVF coarse-cell ANN (second scale path next to LSH), oracle-gated
    # in its provably-exact regime: at n_lists=1 the single coarse cell
    # holds every base vector, so the FULL pipeline (deterministic
    # k-means init + Lloyd iterations, cell assignment, probe join,
    # in-cell exact scoring, top-k window) must reproduce brute-force
    # cosine top-3 bit-for-bit — any defect in assignment, candidate
    # generation, or ranking breaks the hash.  Multi-list recall and
    # determinism (n_lists=8, n_probe=3) stay gated in
    # tests/test_functions.py.
    def _ann_ivf(s, d):
        from graph_mining_spark.functions.ann import ivf_cosine_topk

        emb = s.read.parquet(f"{d}/embeddings.parquet")
        return ivf_cosine_topk(
            emb, emb.filter(F.col("vec_id") % 50 == 0), k=3, n_lists=1, n_probe=1
        ).select(
            "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )

    q["ann_ivf_top3"] = _ann_ivf

    # Canonical registry order: every oracle-gated query first (the
    # driver caps its correctness report at 50 entries, in registration
    # order), then the rows-only / pytest-gated queries.  Exactly 50
    # registered — nothing falls off the cap (round-3 verdict #4:
    # related queries merged into tagged-union slots instead).
    order = [
        # oracle-gated (49)
        "edge_build_bipartite", "degrees_bipartite", "sparsify_top5_soft",
        "best_neighbor_bipartite", "cc_nations", "triangles_coparts",
        "cluster_stats_mod7", "contract_sum_mod7", "contract_avg_mod7",
        "contract_percentile_mod7", "pagerank_iter2_bipartite",
        "pagerank_iter20_bipartite", "pagerank_ppr_iter2_bipartite",
        "cc_bipartite", "cc_csr_nations", "cc_csr_bipartite",
        "pagerank_csr_iter2_bipartite", "affinity_bipartite", "sssp_nations",
        "minla_l2_nations", "pairwise_all_nations", "symmetrize_modes_asym",
        "louvain_round1_bipartite", "correlation_bipartite_round1",
        "correlation_objective_mod7_bipartite",
        "linkgraph_pipeline", "dedup_exact_documents", "text_stats_documents",
        "token_counts_documents", "lang_id_documents", "fingerprint_documents",
        "minhash_documents", "near_dup_pairs", "simhash_documents",
        "lsh_pairs_documents", "ann_cosine_top3", "ann_lsh_top3",
        "relational_q1", "topk_orders_per_customer", "events_hourly_sessions",
        "clique_aggregator_coparts", "parline_coparts", "terahac_nations",
        "hac_labels_nations", "best_neighbor_tiebreak_bipartite",
        "ann_ivf_top3", "louvain_modularity_labels",
        "affinity_sized_bipartite", "pivot_coconductance_cliques",
        # oracled via embedded-literal hyperplane SQL twin (r5)
        "fde_embeddings_by_label",
    ]
    assert len(order) == 50, len(order)
    assert set(order) == set(q), sorted(set(order) ^ set(q))
    return {k: q[k] for k in order}


# ---------- DuckDB oracle SQL ----------


def _maximal_clique_sql(max_k: int = 12) -> str:
    """Maximal cliques (size >= 2) of the order_mod=200 coparts graph by
    unrolled k-clique joins: c{k+1} extends the ordered tuples of c{k}
    by a neighbor of the last vertex adjacent to all others; a k-clique
    is maximal iff no vertex is adjacent to all k members (checked via
    a correlated grouped EXISTS over the symmetric edge list).  The
    independent twin of clique_aggregator at min_density=1.0
    (clique_aggregator.h:31-42 identity).  ``max_k`` bounds the
    unrolling; the fixture's max clique is 8 at sf0.01 (measured), and
    a larger-than-max_k clique would surface as a row-count mismatch,
    never a silent pass."""
    base = """SELECT CAST(a.l_partkey AS BIGINT) AS src, CAST(b.l_partkey AS BIGINT) AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      WHERE a.l_orderkey % 200 = 0 GROUP BY 1, 2"""
    ctes = [
        f"ce AS MATERIALIZED ({base})",
        "sym AS MATERIALIZED (SELECT src AS u, dst AS v FROM ce"
        " UNION ALL SELECT dst AS u, src AS v FROM ce)",
        "c2 AS MATERIALIZED (SELECT src AS v1, dst AS v2 FROM ce)",
    ]
    for k in range(2, max_k):
        cols = ", ".join(f"p.v{i}" for i in range(1, k + 1))
        closure = " AND ".join(
            f"EXISTS (SELECT 1 FROM ce WHERE ce.src = p.v{i} AND ce.dst = n.dst)"
            for i in range(1, k)
        )
        ctes.append(
            f"c{k + 1} AS MATERIALIZED (SELECT {cols}, n.dst AS v{k + 1}"
            f" FROM c{k} p JOIN ce n ON n.src = p.v{k}"
            + (f" WHERE {closure}" if closure else "")
            + ")"
        )
    levels = []
    for k in range(2, max_k + 1):
        members = ", ".join(f"p.v{i}" for i in range(1, k + 1))
        levels.append(
            f"SELECT concat_ws(',', {members}) AS clique,"
            f" unnest([{members}]) AS member,"
            f" CAST({k} AS BIGINT) AS cluster_size"
            f" FROM c{k} p WHERE NOT EXISTS ("
            f"SELECT 1 FROM sym s WHERE s.v IN ({members})"
            f" GROUP BY s.u HAVING count(*) = {k})"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(levels)


def _fde_oracle_sql() -> str:
    """Independent DuckDB twin of fde_embeddings_by_label: recomputes
    the full FDE pipeline (dimension=64, 2 repetitions, 3 SimHash
    projections, average encoding, fill_empty_partitions) in SQL.

    The seeded Philox Gaussian hyperplanes are deterministic module
    constants, so they are embedded as a 2*3*64-row VALUES literal —
    the SQL then does everything else itself: per-point dot products,
    sign bits, the Gray-code fold (for k=3 the partition index unrolls
    to 4*b0 + 2*(b0 XOR b1) + (b0 XOR b1 XOR b2); XOR of 0/1 bits is
    (a+b)%2), per-(rep, partition, dim) AVERAGEs, nearest-point fill of
    empty partitions by minimum SimHash bit disagreement with ties to
    the first point in canonical order (the engine encodes points in
    lexicographic-by-vector order — reproduced here by the rn window),
    and the final L2 over the 2*8*64 = 1024 blocks.  Fill targets are
    the bits of gray_to_binary(p) = p XOR (p >> 1)."""
    from graph_mining_spark.functions.fde import _simhash_matrix

    vals = []
    for rep in range(2):
        m = _simhash_matrix(1 + rep, 64, 3)  # cfg.seed=1 (default) + rep
        for d in range(64):
            for j in range(3):
                # float() first: numpy 2.x reprs scalars as np.float64(...)
                vals.append(f"({rep},{j},{d},{float(m[d, j])!r})")
    hyper = "hyper(rep, j, d, h) AS (VALUES " + ",".join(vals) + ")"
    tgt_rows = []
    for p in range(8):
        binary = p ^ (p >> 1)
        t0, t1, t2 = (binary >> 2) & 1, (binary >> 1) & 1, binary & 1
        tgt_rows.append(f"({p},{t0},{t1},{t2})")
    tgt = "tgt(part, t0, t1, t2) AS (VALUES " + ",".join(tgt_rows) + ")"
    return f"""
      WITH {hyper},
      {tgt},
      pts AS MATERIALIZED (
        SELECT CAST(label AS BIGINT) AS doc_id, CAST(embedding AS DOUBLE[]) AS v,
               row_number() OVER (PARTITION BY label ORDER BY CAST(embedding AS DOUBLE[])) AS rn
        FROM embeddings
      ),
      dots AS MATERIALIZED (
        SELECT p.doc_id, p.rn, h.rep, h.j, sum(p.v[h.d + 1] * h.h) AS dot
        FROM pts p CROSS JOIN hyper h
        GROUP BY 1, 2, 3, 4
      ),
      pidx AS MATERIALIZED (
        SELECT doc_id, rn, rep, b0, b1, b2,
               4 * b0 + 2 * ((b0 + b1) % 2) + ((b0 + b1 + b2) % 2) AS part
        FROM (
          SELECT doc_id, rn, rep,
                 max(CASE WHEN j = 0 AND dot > 0 THEN 1 ELSE 0 END) AS b0,
                 max(CASE WHEN j = 1 AND dot > 0 THEN 1 ELSE 0 END) AS b1,
                 max(CASE WHEN j = 2 AND dot > 0 THEN 1 ELSE 0 END) AS b2
          FROM dots GROUP BY 1, 2, 3
        )
      ),
      dimvals AS (
        SELECT x.doc_id, x.rep, x.part, g.d, avg(p.v[g.d + 1]) AS val
        FROM pidx x JOIN pts p USING (doc_id, rn)
        CROSS JOIN (SELECT CAST(range AS INT) AS d FROM range(64)) g
        GROUP BY 1, 2, 3, 4
      ),
      ne AS (SELECT doc_id, sum(val * val) AS s FROM dimvals GROUP BY 1),
      docs AS (SELECT DISTINCT doc_id FROM pts),
      empties AS (
        SELECT a.doc_id, a.rep, a.part
        FROM (SELECT doc_id, r.rep, q.part FROM docs
              CROSS JOIN (SELECT CAST(range AS INT) AS rep FROM range(2)) r
              CROSS JOIN (SELECT CAST(range AS INT) AS part FROM range(8)) q) a
        LEFT JOIN (SELECT DISTINCT doc_id, rep, part FROM pidx) pr
          USING (doc_id, rep, part)
        WHERE pr.doc_id IS NULL
      ),
      cand AS (
        SELECT e.doc_id, e.rep, e.part, x.rn,
               row_number() OVER (
                 PARTITION BY e.doc_id, e.rep, e.part
                 ORDER BY (CASE WHEN x.b0 <> t.t0 THEN 1 ELSE 0 END
                         + CASE WHEN x.b1 <> t.t1 THEN 1 ELSE 0 END
                         + CASE WHEN x.b2 <> t.t2 THEN 1 ELSE 0 END) ASC,
                          x.rn ASC) AS k
        FROM empties e JOIN tgt t USING (part)
        JOIN pidx x ON x.doc_id = e.doc_id AND x.rep = e.rep
      ),
      fill AS (
        SELECT c.doc_id, sum(sq.s2) AS s
        FROM cand c
        JOIN (SELECT doc_id, rn, list_sum(list_transform(v, y -> y * y)) AS s2
              FROM pts) sq USING (doc_id, rn)
        WHERE c.k = 1 GROUP BY 1
      )
      SELECT d.doc_id, CAST(1024 AS BIGINT) AS fde_dim,
             round(sqrt(coalesce(ne.s, 0) + coalesce(f.s, 0)), 4) AS fde_l2
      FROM docs d LEFT JOIN ne USING (doc_id) LEFT JOIN fill f USING (doc_id)
    """


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["edge_build_bipartite"] = f"SELECT src, dst, weight FROM ({BIPARTITE_SYM_SQL})"

    o["degrees_bipartite"] = f"""
      SELECT src AS vid, CAST(count(*) AS BIGINT) AS degree,
             round(sum(weight), 6) AS weighted_degree
      FROM ({BIPARTITE_SYM_SQL}) GROUP BY 1
    """

    o["sparsify_top5_soft"] = f"""
      WITH ranked AS (
        SELECT src, dst, weight,
               row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst ASC) AS r
        FROM ({BIPARTITE_SYM_SQL})
      ), kept AS (SELECT src, dst, weight FROM ranked WHERE r <= 5)
      SELECT src, dst, max(weight) AS weight FROM (
        SELECT src, dst, weight FROM kept
        UNION ALL
        SELECT dst AS src, src AS dst, weight FROM kept
      ) GROUP BY 1, 2
    """

    o["best_neighbor_bipartite"] = f"""
      SELECT src, dst, weight FROM (
        SELECT src, dst, weight,
               row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst DESC) AS r
        FROM ({BIPARTITE_SYM_SQL})
      ) WHERE r = 1
    """

    # md5-mode string tiebreak: DuckDB's md5() emits the identical
    # lowercase hex as Spark's, so the salted unordered-pair fingerprint
    # md5(least(fs,fd) || greatest(fs,fd)) and its lexicographic DESC
    # ordering reproduce the engine's exact (weight, fingerprint, dst)
    # argmax — tiebreaking.h:42-97 semantics, engine-portable hash.
    o["best_neighbor_tiebreak_bipartite"] = f"""
      WITH e AS MATERIALIZED (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      k AS (
        SELECT src, dst, weight,
               md5('node:' || CAST(src AS VARCHAR)) AS fs,
               md5('node:' || CAST(dst AS VARCHAR)) AS fd
        FROM e WHERE src <> dst AND weight >= 0.0
      )
      SELECT src, dst, weight FROM (
        SELECT src, dst, weight,
               row_number() OVER (
                 PARTITION BY src
                 ORDER BY weight DESC,
                          md5(least(fs, fd) || greatest(fs, fd)) DESC,
                          dst DESC
               ) AS r
        FROM k
      ) WHERE r = 1
    """

    o["cc_nations"] = f"""
      WITH RECURSIVE eu AS (
        SELECT src, dst FROM ({NATIONS_E_SQL})
        UNION
        SELECT dst AS src, src AS dst FROM ({NATIONS_E_SQL})
      ),
      verts AS (SELECT CAST(n_nationkey AS BIGINT) AS vid FROM nation),
      reach(a, b) AS (
        SELECT src AS a, dst AS b FROM eu
        UNION
        SELECT r.a, e.dst AS b FROM reach r JOIN eu e ON r.b = e.src
      ),
      mins AS (SELECT a AS vid, min(b) AS mb FROM reach GROUP BY 1)
      SELECT v.vid, least(v.vid, coalesce(m.mb, v.vid)) AS label
      FROM verts v LEFT JOIN mins m USING (vid)
    """

    o["triangles_coparts"] = f"""
      WITH und AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM ({COPARTS_E_SQL})),
      verts AS (SELECT src AS vid FROM und UNION SELECT dst FROM und),
      tri AS (
        SELECT a.src AS u, a.dst AS v, b.dst AS w
        FROM und a
        JOIN und b ON b.src = a.dst
        JOIN und c ON c.src = a.src AND c.dst = b.dst
      ),
      corners AS (
        SELECT u AS vid FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri
      ),
      cnt AS (SELECT vid, count(*) AS c FROM corners GROUP BY 1)
      SELECT v.vid, CAST(coalesce(cnt.c, 0) AS BIGINT) AS triangles
      FROM verts v LEFT JOIN cnt ON v.vid = cnt.vid
    """

    o["clique_aggregator_coparts"] = _maximal_clique_sql()

    # parline invariant twin: the ±1-balanced contiguous slicing of a
    # 0..n-1 rank permutation into k=8 intervals is a closed form of n
    # alone — size_c = n//8 (+1 for c < n%8), min_rank_c =
    # c*(n//8) + least(c, n%8), max = min+size-1, sum = arithmetic
    # series.  n is the order_mod=200 coparts vertex count, derived
    # here independently of the engine.
    o["parline_coparts"] = """
      WITH ce AS MATERIALIZED (
        SELECT CAST(a.l_partkey AS BIGINT) AS src, CAST(b.l_partkey AS BIGINT) AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_orderkey % 200 = 0 GROUP BY 1, 2
      ),
      verts AS (SELECT DISTINCT vid FROM (
        SELECT src AS vid FROM ce UNION ALL SELECT dst AS vid FROM ce
      )),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM verts),
      cl AS (SELECT CAST(unnest(generate_series(0, 7)) AS BIGINT) AS cluster),
      base AS (
        SELECT cl.cluster,
               CAST(n // 8 + CASE WHEN cl.cluster < n % 8 THEN 1 ELSE 0 END AS BIGINT) AS size,
               CAST(cl.cluster * (n // 8) + least(cl.cluster, n % 8) AS BIGINT) AS min_rank
        FROM cl, nn
      )
      SELECT cluster, size, min_rank,
             CAST(min_rank + size - 1 AS BIGINT) AS max_rank,
             CAST((min_rank + min_rank + size - 1) * size // 2 AS BIGINT) AS sum_rank
      FROM base
    """

    o["cluster_stats_mod7"] = f"""
      WITH e AS (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      labeled AS (SELECT src, dst, weight, src % 7 AS cs, dst % 7 AS cd FROM e),
      verts AS (SELECT DISTINCT src AS vid FROM e),
      sizes AS (SELECT vid % 7 AS label, CAST(count(*) AS BIGINT) AS n_nodes FROM verts GROUP BY 1),
      per AS (
        SELECT cs AS label,
               sum(CASE WHEN cs = cd THEN weight ELSE 0 END) / 2 AS intra_w,
               sum(CASE WHEN cs <> cd THEN weight ELSE 0 END) AS inter_w,
               sum(weight) AS vol
        FROM labeled GROUP BY 1
      ),
      tot AS (SELECT sum(weight) AS tv FROM e)
      SELECT s.label, s.n_nodes,
             round(coalesce(p.intra_w, 0), 6) AS intra_weight,
             round(coalesce(p.inter_w, 0), 6) AS inter_weight,
             round(coalesce(p.vol, 0), 6) AS volume,
             round(CASE WHEN s.n_nodes > 1
                        THEN coalesce(p.intra_w, 0) / (s.n_nodes * (s.n_nodes - 1) / 2.0)
                        ELSE 0 END, 6) AS density,
             round(CASE WHEN least(coalesce(p.vol, 0), tot.tv - coalesce(p.vol, 0)) > 0
                        THEN coalesce(p.inter_w, 0) / least(coalesce(p.vol, 0), tot.tv - coalesce(p.vol, 0))
                        ELSE 0 END, 6) AS conductance
      FROM sizes s LEFT JOIN per p USING (label) CROSS JOIN tot
    """

    o["contract_sum_mod7"] = f"""
      SELECT src % 7 AS src, dst % 7 AS dst, sum(weight) AS weight
      FROM ({BIPARTITE_SYM_SQL})
      WHERE src % 7 <> dst % 7
      GROUP BY 1, 2
    """

    o["pagerank_iter2_bipartite"] = f"""
      WITH e AS (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      deg AS (SELECT src AS vid, count(*) AS deg FROM e GROUP BY 1),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
      r0 AS (SELECT vid, 1.0 / n.n AS rank FROM deg, n),
      c1 AS (
        SELECT e.dst AS vid, sum(r0.rank / deg.deg) AS c
        FROM e JOIN r0 ON e.src = r0.vid JOIN deg ON e.src = deg.vid GROUP BY 1
      ),
      r1 AS (
        SELECT d.vid, 0.15 / n.n + 0.85 * coalesce(c1.c, 0) AS rank
        FROM deg d CROSS JOIN n LEFT JOIN c1 ON d.vid = c1.vid
      ),
      c2 AS (
        SELECT e.dst AS vid, sum(r1.rank / deg.deg) AS c
        FROM e JOIN r1 ON e.src = r1.vid JOIN deg ON e.src = deg.vid GROUP BY 1
      ),
      r2 AS (
        SELECT d.vid, 0.15 / n.n + 0.85 * coalesce(c2.c, 0) AS rank
        FROM deg d CROSS JOIN n LEFT JOIN c2 ON d.vid = c2.vid
      )
      SELECT vid, round(rank, 6) AS rank FROM r2
    """

    o["pairwise_all_nations"] = f"""
      WITH e0 AS (SELECT src, dst FROM ({NATIONS_E_SQL})),
      eu AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      deg AS (SELECT src AS v, count(*) AS d FROM eu GROUP BY 1),
      common AS (
        SELECT x.src AS a, y.src AS b, count(*) AS c
        FROM eu x JOIN eu y ON x.dst = y.dst AND x.src < y.src
        GROUP BY 1, 2
      )
      SELECT 'jaccard' AS metric, a, b, round(c / (da.d + db.d - c), 6) AS similarity
      FROM common JOIN deg da ON a = da.v JOIN deg db ON b = db.v
      UNION ALL
      SELECT 'common' AS metric, a, b, round(CAST(c AS DOUBLE), 6) AS similarity FROM common
      UNION ALL
      SELECT 'cosine' AS metric, a, b, round(c / sqrt(da.d * db.d), 6) AS similarity
      FROM common JOIN deg da ON a = da.v JOIN deg db ON b = db.v
      UNION ALL
      SELECT 'total' AS metric, a, b, round(CAST(da.d + db.d AS DOUBLE), 6) AS similarity
      FROM common JOIN deg da ON a = da.v JOIN deg db ON b = db.v
    """

    # -- minla L2: 3 unrolled iterations of the weighted-mean placement
    # with [0, n-1] rescaling, matching minimum_linear_arrangement's
    # update ((Σ w·l_v + l_u) / (Σw + Σw/deg)) exactly --
    _minla_step = """
      r{i} AS (
        SELECT e.src AS vid,
               (sum(e.weight * lv.l) + max(lu.l)) / (sum(e.weight) + sum(e.weight) / max(d.d)) AS l
        FROM eu e
        JOIN l{j} lv ON lv.vid = e.dst
        JOIN l{j} lu ON lu.vid = e.src
        JOIN deg d ON d.vid = e.src
        GROUP BY 1
      ),
      l{i} AS (
        SELECT vid,
               (l - min(l) OVER ()) * ((SELECT n - 1 FROM nn) / (max(l) OVER () - min(l) OVER ())) AS l
        FROM r{i}
      )"""
    _steps = ",".join(_minla_step.format(i=i, j=i - 1) for i in (1, 2, 3))
    o["minla_l2_nations"] = f"""
      WITH e0 AS (SELECT src, dst, weight FROM ({NATIONS_E_SQL})),
      eu AS (
        SELECT src, dst, max(weight) AS weight FROM (
          SELECT src, dst, weight FROM e0
          UNION ALL
          SELECT dst AS src, src AS dst, weight FROM e0
        ) GROUP BY 1, 2
      ),
      verts AS (SELECT DISTINCT src AS vid FROM eu),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
      l0 AS (
        SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS DOUBLE) AS l
        FROM verts
      ),
      deg AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS d FROM eu GROUP BY 1),
      {_steps}
      SELECT vid, CAST(row_number() OVER (ORDER BY l, vid) - 1 AS BIGINT) AS position
      FROM l3
    """

    o["sssp_nations"] = f"""
      WITH RECURSIVE e0 AS (SELECT src, dst FROM ({NATIONS_E_SQL})),
      eu AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      walk(v, d) AS (
        SELECT CAST(0 AS BIGINT) AS v, CAST(0.0 AS DOUBLE) AS d
        UNION
        SELECT e.dst AS v, CAST(w.d + 1.0 AS DOUBLE) AS d
        FROM walk w JOIN eu e ON e.src = w.v WHERE w.d < 30
      )
      SELECT v AS vid, round(min(d), 6) AS distance FROM walk GROUP BY 1
    """

    o["contract_avg_mod7"] = f"""
      WITH e AS (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      verts AS (SELECT DISTINCT src AS vid FROM e),
      sizes AS (SELECT vid % 7 AS label, CAST(count(*) AS DOUBLE) AS w FROM verts GROUP BY 1),
      summed AS (
        SELECT src % 7 AS src, dst % 7 AS dst, sum(weight) AS s
        FROM e WHERE src % 7 <> dst % 7 GROUP BY 1, 2
      )
      SELECT s.src, s.dst, round(s.s / (sa.w * sb.w), 6) AS weight
      FROM summed s JOIN sizes sa ON s.src = sa.label JOIN sizes sb ON s.dst = sb.label
    """

    o["contract_percentile_mod7"] = f"""
      WITH e AS (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      grouped AS (
        SELECT src % 7 AS src, dst % 7 AS dst, count(*) AS cnt, max(weight) AS mx,
               list_sort(list(weight)) AS ws
        FROM e WHERE src % 7 <> dst % 7 GROUP BY 1, 2
      )
      SELECT src, dst,
             CASE WHEN cnt < 4 THEN mx
                  ELSE ws[CAST(floor(0.5 * (cnt - 1)) AS INT) + 1] END AS weight
      FROM grouped
    """

    # CSR twins share the DataFrame-mode oracles
    o["cc_csr_nations"] = o["cc_nations"]
    o["pagerank_csr_iter2_bipartite"] = o["pagerank_iter2_bipartite"]

    # TeraHac invariant twin — on the nations fixture threshold 0.05
    # sits below the minimum feasible average-linkage similarity (1/6),
    # so flat labels == recursive-CC components (min-member labels),
    # threshold=∞ == singletons, and the ε=0 dendrogram has 2n−C nodes
    # with C roots.  All three derived here independently of the engine.
    o["terahac_nations"] = f"""
      WITH RECURSIVE eu AS (
        SELECT src, dst FROM ({NATIONS_E_SQL})
        UNION
        SELECT dst AS src, src AS dst FROM ({NATIONS_E_SQL})
      ),
      verts AS (SELECT DISTINCT src AS vid FROM eu),
      reach(a, b) AS (
        SELECT src AS a, dst AS b FROM eu
        UNION
        SELECT r.a, e.dst AS b FROM reach r JOIN eu e ON r.b = e.src
      ),
      mins AS (SELECT a AS vid, min(b) AS mb FROM reach GROUP BY 1),
      cc AS (
        SELECT v.vid, least(v.vid, coalesce(m.mb, v.vid)) AS label
        FROM verts v LEFT JOIN mins m USING (vid)
      ),
      shape AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT label) AS BIGINT) AS ncomp
        FROM cc
      )
      SELECT 'labels_eps01' AS variant, vid AS id1, label AS id2,
             CAST(NULL AS DOUBLE) AS val FROM cc
      UNION ALL
      SELECT 'merge_none', vid, vid, NULL FROM verts
      UNION ALL
      SELECT 'dendrogram_eps0_shape', 2 * n - ncomp, ncomp, NULL FROM shape
    """

    # ParHac + dynamic-HAC invariant twin: recursive CC on the full
    # nations graph (parhac variant) and on the graph with vids 3 and
    # 17 removed (dynamic insert/insert/remove script) — same
    # threshold-below-min-linkage argument as terahac_nations.
    o["hac_labels_nations"] = f"""
      WITH RECURSIVE eu AS (
        SELECT src, dst FROM ({NATIONS_E_SQL})
        UNION
        SELECT dst AS src, src AS dst FROM ({NATIONS_E_SQL})
      ),
      verts AS (SELECT DISTINCT src AS vid FROM eu),
      reach(a, b) AS (
        SELECT src AS a, dst AS b FROM eu
        UNION
        SELECT r.a, e.dst AS b FROM reach r JOIN eu e ON r.b = e.src
      ),
      mins AS (SELECT a AS vid, min(b) AS mb FROM reach GROUP BY 1),
      cc_all AS (
        SELECT v.vid, least(v.vid, coalesce(m.mb, v.vid)) AS label
        FROM verts v LEFT JOIN mins m USING (vid)
      ),
      e2 AS (
        SELECT src, dst FROM eu
        WHERE src NOT IN (3, 17) AND dst NOT IN (3, 17)
      ),
      verts2 AS (SELECT vid FROM verts WHERE vid NOT IN (3, 17)),
      reach2(a, b) AS (
        SELECT src AS a, dst AS b FROM e2
        UNION
        SELECT r.a, x.dst AS b FROM reach2 r JOIN e2 x ON r.b = x.src
      ),
      mins2 AS (SELECT a AS vid, min(b) AS mb FROM reach2 GROUP BY 1),
      cc_dyn AS (
        SELECT v.vid, least(v.vid, coalesce(m.mb, v.vid)) AS label
        FROM verts2 v LEFT JOIN mins2 m USING (vid)
      )
      SELECT 'parhac' AS variant, vid, label FROM cc_all
      UNION ALL
      SELECT 'dynamic_seq' AS variant, vid, label FROM cc_dyn
    """

    # size-constraint invariant twin: cap=1 forces singletons over the
    # bipartite vertex set; the cap=8 run must label each vertex exactly
    # once (coverage n, n) with zero clusters over the hard cap
    o["affinity_sized_bipartite"] = f"""
      WITH verts AS (SELECT DISTINCT src AS vid FROM ({BIPARTITE_SYM_SQL})),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM verts)
      SELECT 'cap1_singletons' AS variant, CAST(vid AS BIGINT) AS id1,
             CAST(vid AS BIGINT) AS id2 FROM verts
      UNION ALL
      SELECT 'cap8_coverage', n, n FROM nn
      UNION ALL
      SELECT 'cap8_oversize', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    """

    # Louvain merge-all regime (offset 0, resolution 0 ⇒ optimum = one
    # cluster per component) for both the refinement walk and the
    # block-async schedule, plus modularity's region-clique optimum
    o["louvain_modularity_labels"] = f"""
      WITH RECURSIVE eu AS (
        SELECT src, dst FROM ({NATIONS_E_SQL})
        UNION
        SELECT dst AS src, src AS dst FROM ({NATIONS_E_SQL})
      ),
      verts AS (SELECT DISTINCT src AS vid FROM eu),
      reach(a, b) AS (
        SELECT src AS a, dst AS b FROM eu
        UNION
        SELECT r.a, e.dst AS b FROM reach r JOIN eu e ON r.b = e.src
      ),
      mins AS (SELECT a AS vid, min(b) AS mb FROM reach GROUP BY 1),
      cc AS (
        SELECT v.vid, least(v.vid, coalesce(m.mb, v.vid)) AS label
        FROM verts v LEFT JOIN mins m USING (vid)
      )
      SELECT 'louvain_refined' AS variant, vid, label FROM cc
      UNION ALL
      SELECT 'louvain_block_async', vid, label FROM cc
      UNION ALL
      SELECT 'modularity_cliques', vid, label FROM ({REGION_CLIQUE_LABELS_SQL})
      UNION ALL
      SELECT 'lpa_cliques', vid, label FROM ({REGION_CLIQUE_LABELS_SQL})
      UNION ALL
      SELECT 'lpa_sync_iter2', vid, label FROM (
        -- two synchronous LPA rounds on the weighted bipartite graph:
        -- labels start as the identity, so round-1 votes are exactly
        -- the (deduped) edge weights and the winner is the
        -- (weight DESC, dst ASC) best neighbor; round 2 sums weights
        -- by the round-1 label of each neighbor
        WITH be AS ({BIPARTITE_SYM_SQL}),
        l1 AS (
          SELECT src AS vid, dst AS label FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY weight DESC, dst ASC) AS rn
            FROM be) WHERE rn = 1
        ),
        v2 AS (
          SELECT be.src AS vid, l1.label, sum(be.weight) AS w
          FROM be JOIN l1 ON be.dst = l1.vid
          GROUP BY 1, 2
        )
        SELECT vid, label FROM (
          SELECT vid, label,
                 row_number() OVER (PARTITION BY vid
                                    ORDER BY w DESC, label ASC) AS rn
          FROM v2) WHERE rn = 1
      )
    """

    # clique-partition optimum twin for coconductance (per-cluster
    # objective maxes at 1) and ACN pivot (first pivot per clique grabs
    # the whole clique under any permutation)
    o["pivot_coconductance_cliques"] = f"""
      SELECT 'coconductance' AS variant, vid, label FROM ({REGION_CLIQUE_LABELS_SQL})
      UNION ALL
      SELECT 'quick_cluster' AS variant, vid, label FROM ({REGION_CLIQUE_LABELS_SQL})
    """

    # -- pipeline --
    o["dedup_exact_documents"] = """
      SELECT doc_id, md5(text) AS content_key,
             doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
      FROM documents
    """

    stop_sql = "[" + ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS) + "]"
    o["text_stats_documents"] = rf"""
      WITH q AS (
        SELECT doc_id, text,
               length(text) AS n_chars,
               list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
                           _qt -> _qt <> '') AS toks,
               length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS n_punct,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper
        FROM documents
      ),
      q2 AS (
        SELECT *,
               greatest(n_chars, 1) AS safe_chars,
               greatest(len(toks), 1) AS safe_tok,
               len(list_filter(toks, _qs -> list_contains({stop_sql}, _qs))) AS n_stop,
               list_sum(list_transform(toks, _qx -> length(_qx))) AS tok_chars
        FROM q
      )
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
             CAST(n_digit AS BIGINT) AS n_digits,
             round(length(replace(text, ' ', '')) * 1.0
                   / len(regexp_split_to_array(trim(text), '\s+')), 6) AS avg_token_len,
             round(n_punct * 1.0 / safe_chars, 6) AS punct_ratio,
             round(n_digit * 1.0 / safe_chars, 6) AS digit_ratio,
             round(n_upper * 1.0 / safe_chars, 6) AS upper_ratio,
             round(n_stop * 1.0 / safe_tok, 6) AS stopword_ratio,
             round(COALESCE(tok_chars, 0) * 1.0 / safe_tok, 6) AS mean_token_len,
             round(least(n_stop * 2.0 / safe_tok, 1.0) * 0.4
                   + (1.0 - least(n_punct * 4.0 / safe_chars, 1.0)) * 0.3
                   + (1.0 - least(n_digit * 4.0 / safe_chars, 1.0)) * 0.3, 6) AS quality_score
      FROM q2
    """

    o["token_counts_documents"] = r"""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
      FROM documents
    """

    _occ = lambda m: f"(length(text) - length(replace(text, '{m}', ''))) / {len(m)}"
    _g = f"greatest({_occ(' the ')}, {_occ(' der ')}, {_occ(' le ')}, {_occ(' el ')}, {_occ('的')})"
    o["lang_id_documents"] = f"""
      SELECT doc_id,
             CASE WHEN {_g} <= 0 THEN 'und'
                  WHEN {_occ(' the ')} = {_g} THEN 'en'
                  WHEN {_occ(' der ')} = {_g} THEN 'de'
                  WHEN {_occ(' le ')} = {_g} THEN 'fr'
                  WHEN {_occ(' el ')} = {_g} THEN 'es'
                  ELSE 'zh' END AS lang_guess,
             CAST({_occ(' the ')} AS BIGINT) AS score_en,
             CAST({_occ(' der ')} AS BIGINT) AS score_de,
             CAST({_occ(' le ')} AS BIGINT) AS score_fr,
             CAST({_occ(' el ')} AS BIGINT) AS score_es,
             CAST({_occ('的')} AS BIGINT) AS score_zh
      FROM documents
    """

    o["fingerprint_documents"] = """
      SELECT doc_id, md5(substr(text, 1, 64)) AS fingerprint,
             CAST(floor(length(text) / 64.0) AS BIGINT) AS len_bucket
      FROM documents
    """

    o["minhash_documents"] = """
      WITH sh0 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(length(text) - 4, 0)),
                                     i -> substr(text, CAST(i AS INT), 5))) AS sh
        FROM documents
      ),
      sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      seeds AS (SELECT CAST(seed AS BIGINT) AS seed FROM generate_series(0, 7) t(seed))
      SELECT doc_id, seed,
             min(CAST('0x' || substr(md5(seed::VARCHAR || ':' || sh), 1, 15) AS BIGINT)) AS minhash
      FROM sh, seeds GROUP BY 1, 2
    """

    o["near_dup_pairs"] = r"""
      WITH toks AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
      ),
      sh0 AS (
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                     i -> array_to_string(t[CAST(i AS INT):CAST(i AS INT)+2], ' '))) AS sh
        FROM toks
      ),
      sh AS (SELECT DISTINCT doc_id, lang, sh FROM sh0 WHERE sh <> ''),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT 'ngram_jaccard' AS variant, doc_a AS a, doc_b AS b,
             round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS similarity
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.2
      UNION ALL
      SELECT 'embedding_cosine' AS variant, a, b, similarity FROM (
        SELECT ea.vec_id AS a, eb.vec_id AS b,
               round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                            CAST(eb.embedding AS DOUBLE[])), 4) AS similarity
        FROM embeddings ea JOIN embeddings eb ON ea.vec_id < eb.vec_id
      ) WHERE similarity >= 0.4
    """

    o["ann_cosine_top3"] = """
      WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % 50 = 0),
      scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.qv, e.v), 4) AS cosine
        FROM q, emb e WHERE q.query_id <> e.vec_id
      ),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS r
        FROM scored
      )
      SELECT query_id, neighbor_id, cosine, CAST(r AS BIGINT) AS rank FROM ranked WHERE r <= 3
    """
    # IVF at n_lists=1 is exhaustive by construction (the single cell
    # holds every base vector), so a brute-force twin gates it — but
    # with its OWN ranking key: ivf_cosine_topk ranks on the unrounded
    # cosine (rounding only in the output projection), while the
    # ann_cosine_top3 twin ranks on the 4dp-rounded value (matching
    # cosine_topk's round_to=4).  Two candidates straddling a 4dp
    # rounding boundary at the k=3 cut would order differently under
    # the borrowed oracle and flake the hash gate.
    o["ann_ivf_top3"] = """
      WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % 50 = 0),
      scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, e.v) AS cosine
        FROM q, emb e WHERE q.query_id <> e.vec_id
      ),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS r
        FROM scored
      )
      SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, CAST(r AS BIGINT) AS rank
      FROM ranked WHERE r <= 3
    """

    o["fde_embeddings_by_label"] = _fde_oracle_sql()

    o["relational_q1"] = """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 4) AS sum_qty,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY 1, 2
    """

    o["topk_orders_per_customer"] = """
      WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS r
        FROM orders
      )
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
             CAST(r AS BIGINT) AS r
      FROM ranked WHERE r <= 3
    """

    o["events_hourly_sessions"] = """
      SELECT 'hourly' AS variant,
             CAST(date_trunc('hour', ts) AS VARCHAR) AS k1, event_type AS k2,
             CAST(NULL AS VARCHAR) AS k3,
             CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT 'sessions', k1, k2, k3, n, total FROM (
        WITH l AS (
          SELECT user_id, ts, event_id, value,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        ),
        marked AS (
          SELECT *, CASE WHEN prev IS NULL
                           OR epoch_us(ts) - epoch_us(prev) > 1800000000
                         THEN 1 ELSE 0 END AS new_s
          FROM l
        ),
        sess AS (
          SELECT *, sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT CAST(user_id AS VARCHAR) AS k1,
               CAST(min(ts) AS VARCHAR) AS k2, CAST(max(ts) AS VARCHAR) AS k3,
               CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
        FROM sess GROUP BY user_id, sid
      )
    """

    # -- fixpoint CC on the full bipartite graph: recursive hash-to-min.
    # Only labels smaller than the receiving vertex are kept — the
    # component MINIMUM always survives the filter along every path, so
    # min(lab) per vertex is exact while the closure stays bounded.
    o["cc_bipartite"] = f"""
      WITH RECURSIVE eu AS (SELECT src, dst FROM ({BIPARTITE_SYM_SQL})),
      walk(v, lab) AS (
        SELECT DISTINCT src AS v, src AS lab FROM eu
        UNION
        SELECT e.dst AS v, w.lab FROM walk w JOIN eu e ON e.src = w.v WHERE w.lab < e.dst
      )
      SELECT v AS vid, min(lab) AS label FROM walk GROUP BY 1
    """
    o["cc_csr_bipartite"] = o["cc_bipartite"]

    # -- exactly-20-iteration PageRank: unrolled power iteration --
    # MATERIALIZED stops DuckDB's CTE inlining, which otherwise makes
    # planning blow up exponentially on the 20-stage chain
    _pr20 = [
        f"WITH e AS MATERIALIZED (SELECT * FROM ({BIPARTITE_SYM_SQL})),",
        "deg AS MATERIALIZED (SELECT src AS vid, count(*) AS deg FROM e GROUP BY 1),",
        "n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),",
        "r0 AS MATERIALIZED (SELECT vid, 1.0 / n.n AS rank FROM deg, n),",
    ]
    for i in range(1, 21):
        _pr20.append(
            f"""c{i} AS MATERIALIZED (
              SELECT e.dst AS vid, sum(r{i-1}.rank / deg.deg) AS c
              FROM e JOIN r{i-1} ON e.src = r{i-1}.vid JOIN deg ON e.src = deg.vid GROUP BY 1
            ),
            r{i} AS MATERIALIZED (
              SELECT d.vid, 0.15 / n.n + 0.85 * coalesce(c{i}.c, 0) AS rank
              FROM deg d CROSS JOIN n LEFT JOIN c{i} ON d.vid = c{i}.vid
            ),"""
        )
    _pr20.append("fin AS (SELECT 1)")
    _pr20.append("SELECT vid, round(rank, 6) AS rank FROM r20")
    o["pagerank_iter20_bipartite"] = "\n".join(_pr20)

    # -- personalized PageRank, 2 iterations, sources vid % 50 = 2 --
    o["pagerank_ppr_iter2_bipartite"] = f"""
      WITH e AS (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      deg AS (SELECT src AS vid, count(*) AS deg FROM e GROUP BY 1),
      ns AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM deg WHERE vid % 50 = 2),
      p AS (
        SELECT d.vid, CASE WHEN d.vid % 50 = 2 THEN 1.0 / ns.ns ELSE 0.0 END AS p
        FROM deg d CROSS JOIN ns
      ),
      r0 AS (SELECT vid, p AS rank FROM p),
      c1 AS (
        SELECT e.dst AS vid, sum(r0.rank / deg.deg) AS c
        FROM e JOIN r0 ON e.src = r0.vid JOIN deg ON e.src = deg.vid GROUP BY 1
      ),
      r1 AS (
        SELECT p.vid, 0.15 * p.p + 0.85 * coalesce(c1.c, 0) AS rank
        FROM p LEFT JOIN c1 ON p.vid = c1.vid
      ),
      c2 AS (
        SELECT e.dst AS vid, sum(r1.rank / deg.deg) AS c
        FROM e JOIN r1 ON e.src = r1.vid JOIN deg ON e.src = deg.vid GROUP BY 1
      ),
      r2 AS (
        SELECT p.vid, 0.15 * p.p + 0.85 * coalesce(c2.c, 0) AS rank
        FROM p LEFT JOIN c2 ON p.vid = c2.vid
      )
      SELECT vid, round(rank, 6) AS rank FROM r2
    """

    # -- UndirectedConverter AVG / REMOVE on the asymmetric input --
    o["symmetrize_modes_asym"] = f"""
      WITH e0 AS (SELECT * FROM ({BIPARTITE_E_SQL})),
      inp_avg AS (
        SELECT src, dst, weight FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst, weight * 2 AS weight FROM e0
      ),
      inp_rem AS (
        SELECT src, dst, weight FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst, weight * 2 AS weight FROM e0 WHERE src % 6 = 0
      ),
      kept AS (
        SELECT a.src, a.dst, a.weight FROM inp_rem a
        WHERE EXISTS (SELECT 1 FROM inp_rem b WHERE b.src = a.dst AND b.dst = a.src)
      )
      SELECT 'avg' AS mode, src, dst, round(avg(weight), 6) AS weight FROM (
        SELECT src, dst, weight FROM inp_avg
        UNION ALL
        SELECT dst AS src, src AS dst, weight FROM inp_avg
      ) GROUP BY 2, 3
      UNION ALL
      SELECT 'remove' AS mode, src, dst, round(max(weight), 6) AS weight FROM (
        SELECT src, dst, weight FROM kept
        UNION ALL
        SELECT dst AS src, src AS dst, weight FROM kept
      ) GROUP BY 2, 3
    """

    # -- 2-round affinity (sum linkage): best-neighbor forest → CC →
    # SUM contraction → best-neighbor → CC → flatten --
    o["affinity_bipartite"] = f"""
      WITH RECURSIVE e1 AS (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      bn1 AS (
        SELECT src, dst FROM (
          SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst DESC) AS r
          FROM e1
        ) WHERE r = 1
      ),
      f1 AS (SELECT src, dst FROM bn1 UNION SELECT dst AS src, src AS dst FROM bn1),
      verts AS (SELECT DISTINCT src AS vid FROM e1),
      walk1(v, lab) AS (
        SELECT vid AS v, vid AS lab FROM verts
        UNION
        SELECT e.dst AS v, w.lab FROM walk1 w JOIN f1 e ON e.src = w.v WHERE w.lab < e.dst
      ),
      lab1 AS (SELECT v AS vid, min(lab) AS label FROM walk1 GROUP BY 1),
      e2 AS (
        SELECT la.label AS src, lb.label AS dst, sum(e1.weight) AS weight
        FROM e1 JOIN lab1 la ON e1.src = la.vid JOIN lab1 lb ON e1.dst = lb.vid
        WHERE la.label <> lb.label GROUP BY 1, 2
      ),
      bn2 AS (
        SELECT src, dst FROM (
          SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY weight DESC, dst DESC) AS r
          FROM e2
        ) WHERE r = 1
      ),
      f2 AS (SELECT src, dst FROM bn2 UNION SELECT dst AS src, src AS dst FROM bn2),
      verts2 AS (SELECT DISTINCT label AS vid FROM lab1),
      walk2(v, lab) AS (
        SELECT vid AS v, vid AS lab FROM verts2
        UNION
        SELECT e.dst AS v, w.lab FROM walk2 w JOIN f2 e ON e.src = w.v WHERE w.lab < e.dst
      ),
      lab2 AS (SELECT v AS vid, min(lab) AS label FROM walk2 GROUP BY 1)
      SELECT l1.vid AS vid, l2.label AS label
      FROM lab1 l1 JOIN lab2 l2 ON l1.label = l2.vid
    """

    # -- one synchronous Louvain round from singletons: with every
    # cluster a singleton the swap guard admits only targets dst < src,
    # delta = w − offset (resolution 0), applied iff > 0; canonical
    # label = min member vid --
    o["louvain_round1_bipartite"] = f"""
      WITH e AS (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      ranked AS (
        SELECT src, dst, weight - 1.5 AS delta,
               row_number() OVER (PARTITION BY src ORDER BY weight - 1.5 DESC, dst ASC) AS r
        FROM e WHERE dst < src AND weight - 1.5 > 0
      ),
      tgt AS (SELECT src AS vid, dst AS label FROM ranked WHERE r = 1),
      verts AS (SELECT DISTINCT src AS vid FROM e),
      lab AS (
        SELECT v.vid, coalesce(t.label, v.vid) AS label
        FROM verts v LEFT JOIN tgt t ON v.vid = t.vid
      )
      SELECT vid, min(vid) OVER (PARTITION BY label) AS label FROM lab
    """

    # -- one synchronous BIPARTITE-objective round: from singletons the
    # resolution penalty applies only to CROSS-part targets (part =
    # vid % 2), delta = w − 1.5 − 0.25·[(src+dst) odd]; swap guard
    # admits dst < src; canonical label = min member vid --
    o["correlation_bipartite_round1"] = f"""
      WITH bsym AS (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      cust AS (SELECT CAST(c_custkey * 2 AS BIGINT) AS vid FROM customer),
      extra0 AS (
        SELECT a.vid AS src, b.vid AS dst, CAST(2.0 AS DOUBLE) AS weight
        FROM cust a JOIN cust b ON b.vid = a.vid + 20
        WHERE (a.vid / 2) % 10 = 0
      ),
      e AS (
        SELECT * FROM bsym
        UNION ALL SELECT src, dst, weight FROM extra0
        UNION ALL SELECT dst AS src, src AS dst, weight FROM extra0
      ),
      ranked AS (
        SELECT src, dst,
               weight - 1.5 - 0.25 * (CASE WHEN (src + dst) % 2 = 1 THEN 1 ELSE 0 END) AS delta,
               row_number() OVER (
                 PARTITION BY src
                 ORDER BY weight - 1.5 - 0.25 * (CASE WHEN (src + dst) % 2 = 1 THEN 1 ELSE 0 END) DESC,
                          dst ASC
               ) AS r
        FROM e WHERE dst < src
      ),
      tgt AS (SELECT src AS vid, dst AS label FROM ranked WHERE r = 1 AND delta > 0),
      verts AS (SELECT DISTINCT src AS vid FROM e),
      lab AS (
        SELECT v.vid, coalesce(t.label, v.vid) AS label
        FROM verts v LEFT JOIN tgt t ON v.vid = t.vid
      )
      SELECT vid, min(vid) OVER (PARTITION BY label) AS label FROM lab
    """

    # correlation objective on fixed mod-7 labels / mod-3 node weights:
    # Σ_intra (w − offset) − res/2 · Σ_C (K_C² − Σ_v k_v²)
    # (correlation_objective, operators/correlation.py — the same
    # closed formula over the symmetric edge table, each unordered
    # intra pair counted once via the /2)
    o["correlation_objective_mod7_bipartite"] = f"""
      WITH sym AS (SELECT * FROM ({BIPARTITE_SYM_SQL})),
      lab AS (
        SELECT DISTINCT src AS vid, src % 7 AS label,
               1.0 + CAST(src % 3 AS DOUBLE) AS nw
        FROM sym
      ),
      intra AS (
        SELECT COALESCE(sum(e.weight - 0.1), 0) / 2.0 AS s
        FROM sym e JOIN lab a ON e.src = a.vid JOIN lab b ON e.dst = b.vid
        WHERE e.src <> e.dst AND a.label = b.label
      ),
      grp AS (
        SELECT (pow(sum(nw), 2) - sum(nw * nw)) / 2.0 AS pairs
        FROM lab GROUP BY label
      ),
      pc AS (SELECT COALESCE(sum(pairs), 0) AS p FROM grp)
      SELECT round((SELECT s FROM intra) - 0.05 * (SELECT p FROM pc), 4) AS objective
    """

    # -- the synthesized link-graph pipeline, re-derived independently:
    # the deterministic synthesis (ingest.synthesize_source_files,
    # n_repos=40, files_per_repo=10, seed=42, with_vendored=False)
    # yields vid = dense rank of (repo, path); edges = import tree
    # (f>0 → (f-1)//2 within a repo, all resolvable) plus
    # shared-content groups {(lang, f): f % 5 == 4} of size 10 > 8
    # (star to min vid); components via a transitive-closure recursive
    # CTE — an actual independent CC computation, not the engine's --
    o["linkgraph_pipeline"] = """
      WITH files AS (
        SELECT r, f,
               printf('org%03d/repo%05d', CAST(r % 97 AS INT), CAST(r AS INT)) AS repo,
               printf('src/mod_%04d.%s', CAST(f AS INT),
                      ['py','cc','java','go'][CAST(r % 4 AS INT) + 1]) AS path,
               CAST(r % 4 AS INT) AS lang_id
        FROM generate_series(0, 39) t1(r), generate_series(0, 9) t2(f)
      ),
      vids AS (
        SELECT r, f, lang_id,
               CAST(row_number() OVER (ORDER BY repo, path) - 1 AS BIGINT) AS vid
        FROM files
      ),
      import_e AS (
        SELECT a.vid AS src, b.vid AS dst
        FROM vids a JOIN vids b ON b.r = a.r AND b.f = (a.f - 1) // 2
        WHERE a.f > 0
      ),
      dup AS (SELECT lang_id, f, vid FROM vids WHERE f % 5 = 4),
      dup_min AS (SELECT lang_id, f, min(vid) AS mv FROM dup GROUP BY 1, 2),
      content_e AS (
        SELECT m.mv AS src, d.vid AS dst
        FROM dup d JOIN dup_min m USING (lang_id, f)
        WHERE d.vid <> m.mv
      ),
      eu AS (
        SELECT src, dst FROM import_e UNION SELECT dst, src FROM import_e
        UNION SELECT src, dst FROM content_e UNION SELECT dst, src FROM content_e
      ),
      reach AS (
        WITH RECURSIVE r2(a, b) AS (
          SELECT src AS a, dst AS b FROM eu
          UNION
          SELECT r2.a, e.dst AS b FROM r2 JOIN eu e ON r2.b = e.src
        ) SELECT * FROM r2
      ),
      mins AS (SELECT a AS vid, min(b) AS mb FROM reach GROUP BY 1),
      lab AS (
        SELECT v.vid, least(v.vid, coalesce(m.mb, v.vid)) AS label
        FROM vids v LEFT JOIN mins m USING (vid)
      )
      SELECT label, CAST(count(*) AS BIGINT) AS n_files
      FROM lab GROUP BY 1 ORDER BY n_files DESC, label LIMIT 20
    """

    # -- SimHash (32-bit, md5-derived) --
    _bits = ",\n             ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(32)
    )
    _simsum = " + ".join(f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32))
    o["simhash_documents"] = rf"""
      WITH toks0 AS (
        SELECT doc_id,
               unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
        FROM documents
      ),
      toks AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        FROM toks0 WHERE tok <> ''
      ),
      sums AS (
        SELECT doc_id,
             {_bits}
        FROM toks GROUP BY 1
      )
      SELECT doc_id, CAST({_simsum} AS BIGINT) AS simhash FROM sums
    """

    # -- MinHash-LSH banding candidate pairs (8 hashes, 4 bands) --
    o["lsh_pairs_documents"] = """
      WITH sh0 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(length(text) - 4, 0)),
                                     i -> substr(text, CAST(i AS INT), 5))) AS sh
        FROM documents
      ),
      sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
      seeds AS (SELECT CAST(seed AS BIGINT) AS seed FROM generate_series(0, 7) t(seed)),
      mh AS (
        SELECT doc_id, seed,
               min(CAST('0x' || substr(md5(seed::VARCHAR || ':' || sh), 1, 15) AS BIGINT)) AS minhash
        FROM sh, seeds GROUP BY 1, 2
      ),
      keys AS (
        SELECT doc_id, seed // 2 AS band,
               md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed, minhash)) AS band_key
        FROM mh GROUP BY 1, 2
      ),
      sizes AS (SELECT band, band_key, count(*) AS n FROM keys GROUP BY 1, 2),
      ok AS (
        SELECT k.doc_id, k.band, k.band_key
        FROM keys k JOIN sizes s USING (band, band_key) WHERE s.n <= 1000
      )
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ok a JOIN ok b USING (band, band_key)
      WHERE a.doc_id < b.doc_id
    """

    # -- hyperplane-LSH ANN (4 planes, md5-derived components) --
    _planes = ",\n      ".join(
        f"""pl{p} AS (
        SELECT list_transform(generate_series(0, 63),
               d -> CAST('0x' || substr(md5('plane{p}:' || CAST(d AS VARCHAR)), 1, 8) AS BIGINT)
                    / 4294967296.0 - 0.5) AS v)"""
        for p in range(4)
    )
    _bkt = " + ".join(
        f"CASE WHEN list_dot_product(e.v, pl{p}.v) > 0 THEN {1 << p} ELSE 0 END" for p in range(4)
    )
    o["ann_lsh_top3"] = f"""
      WITH {_planes},
      emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      bucketed AS (
        SELECT e.vec_id, e.v, {_bkt} AS bkt
        FROM emb e, pl0, pl1, pl2, pl3
      ),
      q AS (SELECT vec_id AS query_id, v AS qv, bkt FROM bucketed WHERE vec_id % 50 = 0),
      scored AS (
        SELECT q.query_id, b.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, b.v) AS cosine
        FROM q JOIN bucketed b USING (bkt) WHERE q.query_id <> b.vec_id
      ),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS r
        FROM scored
      )
      SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, CAST(r AS BIGINT) AS rank
      FROM ranked WHERE r <= 3
    """

    return o
