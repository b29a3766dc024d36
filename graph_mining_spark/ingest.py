"""Ingestion: the north-rule input table → vertices + edges.

Input shape (BASELINE.json ``input_hint``): a table of source-code
repositories ``(repo: string, path: string, commit: string,
lang: string, content: string)``.  This module

  - synthesizes that table deterministically at any scale (seeded pure
    column expressions — no Python RNG in executors, no external data);
  - computes the per-row invariant ``sha256(content)`` (F.sha2, JVM-side)
    and checks it survives ingestion bit-exact;
  - assigns dense 0-based vertex ids keyed by ``repo:path`` without a
    single global sort (range-partition + per-partition offsets — the
    scalable analog of the reference's dense NodeId space,
    in_memory_clusterer.h:44-91);
  - derives edges:
      * shared-content: files whose content hashes are equal.  Groups
        up to ``max_clique_group`` emit the full clique; larger groups
        emit a STAR to the min-vid member — same connectivity for
        components at O(g) instead of O(g²) edges.  This is the
        explicit skew control for "vendored file shared by 10⁶ repos"
        (a clique there would be 5·10¹¹ edges from one content group);
      * import/path: per-lang import statements parsed with
        regexp_extract_all (JVM regex, no Python), resolved against the
        same repo's path set.

All joins on the vertex dictionary broadcast when small and fall back
to shuffled joins (AQE) beyond the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"

_LANGS = ["py", "cc", "java", "go"]
# import-line template per lang; %s = module stem
_IMPORT_FMT = {
    "py": "import %s",
    "cc": '#include "%s.h"',
    "java": "import pkg.%s;",
    "go": 'import "pkg/%s"',
}
_EXT = {"py": "py", "cc": "cc", "java": "java", "go": "go"}
# regex to pull imported module stems back out, per lang
IMPORT_REGEX = {
    "py": r"^import ([a-z0-9_]+)$",
    "cc": r'^#include "([a-z0-9_]+)\.h"$',
    "java": r"^import pkg\.([a-z0-9_]+);$",
    "go": r'^import "pkg/([a-z0-9_]+)"$',
}


def read_source_table(spark: SparkSession, source: str) -> DataFrame:
    """Load the source-file table from an Iceberg/catalog table
    identifier or a file path, schema-checked.

    ``source`` with no path separator (e.g. ``lake.code.files`` or a
    registered view name) goes through ``spark.read.table`` — for an
    Iceberg catalog that is the scan that takes partition pruning,
    column pruning, and predicate pushdown from every downstream plan
    (this module only ever selects the columns it needs, so hidden
    partitioning on e.g. ``lang`` or ``repo`` buckets prunes for
    free).  Anything containing ``/`` is read as a Parquet path (the
    sandbox form; the DataFrame contract downstream is identical).

    Raises ``ValueError`` if the required north-rule columns
    ``(repo, path, commit, lang, content)`` are missing or carry the
    wrong type (e.g. binary ``content`` or int ``lang`` fail HERE with
    a clear message, not later in a confusing downstream expression);
    extra columns are allowed and ignored by downstream selects.
    """
    import os

    # a bare relative filename like "files.parquet" has no "/" but is
    # NOT a catalog identifier — route it (and any existing filesystem
    # path) to the Parquet reader before falling back to read.table
    is_path = (
        "/" in source
        or source.endswith(".parquet")
        or os.path.exists(source)
    )
    df = spark.read.parquet(source) if is_path else spark.read.table(source)
    expected = {
        f.split()[0]: f.split()[1] for f in SOURCE_SCHEMA.split(", ")
    }
    missing = [c for c in expected if c not in df.columns]
    if missing:
        raise ValueError(
            f"source table {source!r} is missing required columns {missing}; "
            f"expected at least: {SOURCE_SCHEMA}"
        )
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    wrong = [
        f"{c}: {actual[c]} (expected {t})"
        for c, t in expected.items()
        if actual.get(c) != t
    ]
    if wrong:
        raise ValueError(
            f"source table {source!r} has wrong column type(s): {wrong}; "
            f"expected: {SOURCE_SCHEMA}"
        )
    return df


def synthesize_source_files(
    spark: SparkSession,
    n_repos: int = 20,
    files_per_repo: int = 10,
    seed: int = 42,
    dup_every: int = 5,
    with_vendored: bool = True,
) -> DataFrame:
    """Deterministic synthesis of the north-rule input table.

    Structure per repo (lang = langs[repo_idx % 4]):
      - file 0 is a "vendored" file with IDENTICAL content in every
        repo (the planted high-degree shared-content hub / skew case);
      - file f>0 imports file (f-1)//2 → an import tree within a repo;
      - files with f % dup_every == dup_every-1 carry content keyed
        only by f (not repo) ⇒ duplicated across all repos with the
        same lang (planted duplicate-content groups);
      - all other files carry repo-unique content.

    Everything derives from (seed, repo_idx, file_idx) through md5 —
    rerunning at any parallelism yields identical rows.
    """
    df = (
        spark.range(n_repos)
        .select(F.col("id").alias("r"))
        .join(spark.range(files_per_repo).select(F.col("id").alias("f")), how="cross")
    )
    lang = F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (F.col("r") % 4 + 1).cast("int"))
    repo = F.format_string("org%03d/repo%05d", (F.col("r") % 97).cast("int"), F.col("r").cast("int"))
    stem = F.format_string("mod_%04d", F.col("f").cast("int"))
    ext = F.element_at(
        F.create_map(*[x for kv in _EXT.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]), lang
    )
    path = F.concat(F.lit("src/"), stem, F.lit("."), ext)

    parent_stem = F.format_string("mod_%04d", ((F.col("f") - 1) / 2).cast("int"))
    # per-lang import line (format strings must be literals → when-chain)
    import_line_by_lang = None
    for lg, fmt in _IMPORT_FMT.items():
        expr = F.replace(F.lit(fmt), F.lit("%s"), parent_stem)
        import_line_by_lang = (
            F.when(lang == lg, expr) if import_line_by_lang is None else import_line_by_lang.when(lang == lg, expr)
        )
    import_line = F.when(F.col("f") > 0, import_line_by_lang).otherwise(F.lit(""))

    seed_lit = F.lit(str(seed))
    unique_body = F.md5(F.concat(seed_lit, F.lit(":u:"), repo, F.lit(":"), path))
    dup_body = F.md5(F.concat(seed_lit, F.lit(":d:"), F.col("f").cast("string")))
    vendored_body = F.md5(F.concat(seed_lit, F.lit(":vendored")))

    is_vendored = (F.col("f") == 0) & F.lit(with_vendored)
    is_dup = (F.col("f") % dup_every) == (dup_every - 1)

    # vendored content is lang-independent (one global content group);
    # dup content varies by f only (per-lang identical across repos via
    # identical import lines and bodies — imports reference identical
    # sibling stems in every repo)
    body = F.when(is_vendored, vendored_body).when(is_dup, dup_body).otherwise(unique_body)
    header = F.when(is_vendored, F.lit("// vendored common header\n")).otherwise(
        F.format_string("// module %s\n", stem)
    )
    content = F.when(is_vendored, F.concat(header, vendored_body)).otherwise(
        F.concat(header, import_line, F.lit("\n"), body)
    )
    commit = F.md5(F.concat(seed_lit, F.lit(":c:"), repo))

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        F.concat(commit, commit).substr(1, 40).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def with_sha256(files: DataFrame) -> DataFrame:
    """Attach the per-row invariant column (input_hint: content sha256
    equality vs the reference must hold through ingestion)."""
    return files.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def sha256_mismatches(files_with_hash: DataFrame) -> int:
    """Recompute sha256 after any repartition/write and count rows where
    the carried invariant no longer matches (must be 0)."""
    return files_with_hash.filter(
        F.sha2(F.col("content"), 256) != F.col("content_sha256")
    ).count()


def dense_vertex_ids(files: DataFrame, partitions: int = 32) -> DataFrame:
    """Dense 0-based vid keyed by (repo, path), without a global
    single-partition sort: range-partition by key, then
    vid = per-partition row_number − 1 + exclusive prefix of partition
    counts.  Two jobs, every stage fully parallel — the scalable analog
    of the reference's dense NodeId import (SURVEY.md §1.4).
    """
    # _two_phase_rank persists the range-partitioned table across its
    # two jobs and cuts lineage after — WITHOUT that, the counts job
    # and the ranking job would re-sample RangePartitioner boundaries
    # independently, and a recomputation-order change between them
    # could make the collected offsets inconsistent with the second
    # job's partitions (duplicate/missing vids)
    from graph_mining_spark.operators.minla import _two_phase_rank

    ranked = _two_phase_rank(files.select("repo", "path"), ["repo", "path"], partitions)
    return ranked.select(F.col("_rank").alias("vid"), "repo", "path")


def shared_content_edges(
    files_v: DataFrame, max_clique_group: int = 8
) -> DataFrame:
    """Edges between files with identical content.

    ``files_v``: files joined with vids (columns vid, content_sha256).
    Groups of size ≤ ``max_clique_group`` → full clique; larger → star
    to the group's min vid (skew control; identical connectivity).
    Output: directed (src < dst), weight 1.0.
    """
    g = files_v.select("vid", F.col("content_sha256").alias("h"))
    stats = g.groupBy("h").agg(F.min("vid").alias("_min"), F.count("*").alias("_n")).filter(F.col("_n") > 1)
    members = g.join(stats, "h")
    small = members.filter(F.col("_n") <= max_clique_group)
    clique = (
        small.alias("a")
        .join(small.alias("b"), (F.col("a.h") == F.col("b.h")) & (F.col("a.vid") < F.col("b.vid")))
        .select(F.col("a.vid").alias("src"), F.col("b.vid").alias("dst"), F.lit(1.0).alias("weight"))
    )
    star = (
        members.filter((F.col("_n") > max_clique_group) & (F.col("vid") != F.col("_min")))
        .select(F.col("_min").alias("src"), F.col("vid").alias("dst"), F.lit(1.0).alias("weight"))
    )
    return clique.unionByName(star)


def import_edges(files_v: DataFrame) -> DataFrame:
    """Edges from import statements to same-repo files.

    ``files_v`` columns: vid, repo, path, lang, content.  Import stems
    are extracted JVM-side (regexp_extract_all over split lines) and
    resolved against (repo, path); unresolved imports drop out.
    Output: directed src→imported, weight 1.0.
    """
    ext = F.element_at(
        F.create_map(*[x for kv in _EXT.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]),
        F.col("lang"),
    )
    lines = files_v.select(
        "vid",
        "repo",
        "lang",
        ext.alias("_ext"),
        F.explode(F.split(F.col("content"), "\n")).alias("_line"),
    )
    # regexp_extract patterns must be literals → per-lang extract, pick by lang
    stem_expr = None
    for lg, rx in IMPORT_REGEX.items():
        expr = F.regexp_extract(F.col("_line"), rx, 1)
        stem_expr = F.when(F.col("lang") == lg, expr) if stem_expr is None else stem_expr.when(F.col("lang") == lg, expr)
    stems = lines.select("vid", "repo", "_ext", stem_expr.alias("_stem")).filter(F.col("_stem") != "")
    targets = stems.select(
        "vid", "repo", F.concat(F.lit("src/"), F.col("_stem"), F.lit("."), F.col("_ext")).alias("path")
    )
    vdict = files_v.select("repo", "path", F.col("vid").alias("dst"))
    return (
        targets.join(vdict, ["repo", "path"])
        .select(F.col("vid").alias("src"), "dst", F.lit(1.0).alias("weight"))
        .filter(F.col("src") != F.col("dst"))
    )


def build_link_graph(
    files: DataFrame, max_clique_group: int = 8, partitions: int = 32
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full ingestion: input table → (files_with_hash, vertices, edges).

    ``edges`` is the directed union of shared-content and import edges,
    parallel edges deduped keeping MAX weight (reference graph.h:78-82).
    Symmetrize downstream per algorithm need.
    """
    fh = with_sha256(files)
    verts = dense_vertex_ids(fh, partitions=partitions)
    files_v = fh.join(verts, ["repo", "path"])
    sc = shared_content_edges(files_v.select("vid", "content_sha256"), max_clique_group)
    imp = import_edges(files_v.select("vid", "repo", "path", "lang", "content"))
    from graph_mining_spark.graph import dedup_edges

    edges = dedup_edges(sc.unionByName(imp), agg="max")
    return fh, verts, edges
