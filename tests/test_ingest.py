from pyspark.sql import functions as F

from graph_mining_spark.ingest import (
    build_link_graph,
    dense_vertex_ids,
    sha256_mismatches,
    synthesize_source_files,
    with_sha256,
)
from graph_mining_spark.operators.connected_components import connected_components
from tests.oracles import bfs_components


def test_synthesis_deterministic(spark):
    a = synthesize_source_files(spark, n_repos=6, files_per_repo=8).orderBy("repo", "path").collect()
    b = synthesize_source_files(spark, n_repos=6, files_per_repo=8).orderBy("repo", "path").collect()
    assert a == b
    assert len(a) == 48
    assert set(r["lang"] for r in a) == {"py", "cc", "java", "go"}
    assert all(len(r["commit"]) == 40 for r in a)


def test_sha256_preserved_through_repartition_and_write(spark, tmp_path):
    files = with_sha256(synthesize_source_files(spark, n_repos=5, files_per_repo=6))
    assert sha256_mismatches(files) == 0
    out = str(tmp_path / "files.parquet")
    files.repartition(7).write.mode("overwrite").parquet(out)
    assert sha256_mismatches(spark.read.parquet(out)) == 0


def test_dense_vertex_ids_dense_and_ordered(spark):
    files = synthesize_source_files(spark, n_repos=4, files_per_repo=5)
    verts = dense_vertex_ids(files, partitions=3).collect()
    vids = sorted(r["vid"] for r in verts)
    assert vids == list(range(20))
    # vid order must follow (repo, path) order — determinism contract
    by_key = sorted(verts, key=lambda r: (r["repo"], r["path"]))
    assert [r["vid"] for r in by_key] == list(range(20))


def test_vendored_hub_and_duplicate_groups(spark):
    files = with_sha256(synthesize_source_files(spark, n_repos=8, files_per_repo=6, dup_every=3))
    hashes = files.groupBy("content_sha256").count()
    sizes = sorted([r["count"] for r in hashes.collect() if r["count"] > 1], reverse=True)
    assert sizes and sizes[0] == 8  # vendored file: one group of all repos


def test_import_edges_within_repo(spark):
    fh, verts, edges = build_link_graph(synthesize_source_files(spark, n_repos=2, files_per_repo=6, with_vendored=False))
    vmap = {(r["repo"], r["path"]): r["vid"] for r in verts.collect()}
    e = {(r["src"], r["dst"]) for r in edges.collect()}
    repos = sorted({rr for rr, _ in vmap})
    for r0 in repos:
        ext = next(p for rr, p in vmap if rr == r0).rsplit(".", 1)[1]
        # file f imports (f-1)//2 within the same repo: mod_0001 → mod_0000
        src = vmap[(r0, f"src/mod_0001.{ext}")]
        dst = vmap[(r0, f"src/mod_0000.{ext}")]
        assert (src, dst) in e


def test_star_vs_clique_same_components(spark):
    files = synthesize_source_files(spark, n_repos=10, files_per_repo=4, dup_every=2)
    _, _, e_clique = build_link_graph(files, max_clique_group=1000)
    _, _, e_star = build_link_graph(files, max_clique_group=2)
    lab_c = {r["vid"]: r["label"] for r in connected_components(e_clique).collect()}
    lab_s = {r["vid"]: r["label"] for r in connected_components(e_star).collect()}
    shared = set(lab_c) & set(lab_s)
    assert {v: lab_c[v] for v in shared} == {v: lab_s[v] for v in shared}
    # star emits O(g) edges, clique O(g^2)
    assert e_star.count() < e_clique.count()


def test_end_to_end_components_vs_oracle(spark):
    files = synthesize_source_files(spark, n_repos=6, files_per_repo=8)
    fh, verts, edges = build_link_graph(files)
    el = [(r["src"], r["dst"]) for r in edges.collect()]
    vl = [r["vid"] for r in verts.collect()]
    got = {r["vid"]: r["label"] for r in connected_components(edges, vertices=verts.select("vid")).collect()}
    assert got == bfs_components(vl, el)
    # vendored hub connects every repo's file 0 → one giant component
    assert list(got.values()).count(min(got.values())) > 6


def test_read_source_table_path_view_and_schema_check(spark, tmp_path):
    import pytest

    from graph_mining_spark.ingest import read_source_table

    files = synthesize_source_files(spark, n_repos=4, files_per_repo=5)
    p = str(tmp_path / "src_files")
    files.write.mode("overwrite").parquet(p)

    # path form (contains '/') → parquet read
    via_path = read_source_table(spark, p)
    assert via_path.count() == 20

    # catalog/table-identifier form → spark.read.table (a temp view is
    # the sandbox stand-in for an Iceberg identifier; the call path is
    # identical)
    files.createOrReplaceTempView("src_files_view")
    via_table = read_source_table(spark, "src_files_view")
    assert via_table.count() == 20

    # downstream pipeline accepts either
    fh, verts, edges = build_link_graph(via_path)
    assert verts.count() == 20 and edges.count() > 0

    # schema check: missing required columns must raise loudly
    files.drop("content", "lang").createOrReplaceTempView("src_files_bad")
    with pytest.raises(ValueError, match="content"):
        read_source_table(spark, "src_files_bad")
