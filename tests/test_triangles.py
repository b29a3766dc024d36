from graph_mining_spark.operators.triangles import global_triangle_count, triangle_counts
from tests.conftest import make_edges
from tests.oracles import seeded_er_edges, triangle_oracle


def _counts(df):
    return {r["vid"]: r["triangles"] for r in df.collect()}


def test_k3(spark):
    e = make_edges(spark, [(0, 1, 1), (1, 2, 1), (0, 2, 1)])
    assert _counts(triangle_counts(e)) == {0: 1, 1: 1, 2: 1}
    assert global_triangle_count(e) == 1


def test_k4(spark):
    e = make_edges(spark, [(u, v, 1.0) for u in range(4) for v in range(u + 1, 4)])
    assert _counts(triangle_counts(e)) == {i: 3 for i in range(4)}
    assert global_triangle_count(e) == 4


def test_k3_plus_pendant(spark):
    e = make_edges(spark, [(0, 1, 1), (1, 2, 1), (0, 2, 1), (2, 3, 1)])
    assert _counts(triangle_counts(e)) == {0: 1, 1: 1, 2: 1, 3: 0}


def test_square_no_triangles(spark):
    e = make_edges(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)])
    assert _counts(triangle_counts(e)) == {i: 0 for i in range(4)}


def test_barbell_k5(spark):
    tri = [(u, v, 1.0) for u in range(5) for v in range(u + 1, 5)]
    tri += [(u + 5, v + 5, 1.0) for u in range(5) for v in range(u + 1, 5)]
    tri += [(0, 5, 1.0)]
    e = make_edges(spark, tri)
    assert _counts(triangle_counts(e)) == {i: 6 for i in range(10)}


def test_er_graph_vs_bruteforce(spark):
    edges = seeded_er_edges(30, 0.25, seed=9)
    e = make_edges(spark, edges)
    got = _counts(triangle_counts(e))
    want = triangle_oracle(range(30), edges)
    # vertices absent from the edge list don't appear in engine output
    want = {k: v for k, v in want.items() if k in got}
    assert got == want


def test_duplicate_and_reversed_input_edges(spark):
    # parallel + reversed duplicates must not double-count
    e = make_edges(spark, [(0, 1, 1), (1, 0, 1), (1, 2, 1), (0, 2, 1), (2, 0, 3.0)])
    assert _counts(triangle_counts(e)) == {0: 1, 1: 1, 2: 1}
