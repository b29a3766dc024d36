from pyspark.sql import functions as F

from graph_mining_spark.graph import (
    canonical_undirected,
    dedup_edges,
    degrees,
    sparsify_top_k,
    symmetrize,
    vertex_ids,
)
from tests.conftest import make_edges


def test_dedup_keeps_max_weight(spark):
    # parallel-edge dedup keeps MAX (reference graph.h:78-82)
    e = make_edges(spark, [(0, 1, 1.0), (0, 1, 5.0), (0, 1, 3.0)])
    out = dedup_edges(e).collect()
    assert len(out) == 1 and out[0]["weight"] == 5.0


def test_symmetrize_max_and_self_loop_drop(spark):
    e = make_edges(spark, [(0, 1, 2.0), (1, 0, 7.0), (2, 2, 9.0), (1, 2, 1.0)])
    out = {(r["src"], r["dst"]): r["weight"] for r in symmetrize(e).collect()}
    assert out == {(0, 1): 7.0, (1, 0): 7.0, (1, 2): 1.0, (2, 1): 1.0}


def test_symmetrize_sum_asymmetric(spark):
    e = make_edges(spark, [(0, 1, 2.0), (1, 0, 7.0)])
    out = {(r["src"], r["dst"]): r["weight"] for r in symmetrize(e, agg="sum").collect()}
    assert out == {(0, 1): 9.0, (1, 0): 9.0}


def test_canonical_undirected(spark):
    e = symmetrize(make_edges(spark, [(0, 1, 2.0), (1, 2, 3.0)]))
    out = sorted((r["src"], r["dst"]) for r in canonical_undirected(e).collect())
    assert out == [(0, 1), (1, 2)]


def test_degrees_and_vertex_ids(spark):
    sym = symmetrize(make_edges(spark, [(0, 1, 2.0), (0, 2, 3.0)]))
    deg = {r["vid"]: r["degree"] for r in degrees(sym).collect()}
    assert deg == {0: 2, 1: 1, 2: 1}
    assert sorted(r["vid"] for r in vertex_ids(sym).collect()) == [0, 1, 2]


def test_sparsify_soft_vs_hard(spark):
    # star 0-{1,2,3} with weights 3,2,1 plus edge 1-2.
    sym = symmetrize(make_edges(spark, [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 1.0), (1, 2, 0.5)]))
    # k=1: node 0 keeps (0,1); 1 keeps (1,0); 2 keeps (2,0); 3 keeps (3,0)
    soft = sparsify_top_k(sym, k=1, soft=True)
    pairs = sorted({(min(r["src"], r["dst"]), max(r["src"], r["dst"])) for r in soft.collect()})
    assert pairs == [(0, 1), (0, 2), (0, 3)]  # soft: kept by either side
    hard = sparsify_top_k(sym, k=1, soft=False)
    pairs_h = sorted({(min(r["src"], r["dst"]), max(r["src"], r["dst"])) for r in hard.collect()})
    assert pairs_h == [(0, 1)]  # hard: only mutual top-1


def test_sparsify_tie_break_prefers_smaller_id(spark):
    # equal weights → (weight desc, dst asc): node 0 keeps neighbor 1
    sym = symmetrize(make_edges(spark, [(0, 1, 1.0), (0, 2, 1.0)]))
    hard = sparsify_top_k(sym, k=1, soft=False)
    kept = {(r["src"], r["dst"]) for r in hard.collect()}
    assert kept == {(0, 1), (1, 0)}
