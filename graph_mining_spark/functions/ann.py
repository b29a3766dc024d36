"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline (expressible entirely
with F.zip_with/F.aggregate — JVM-side, codegen'd, no Python); the
scale path is random-hyperplane LSH bucketing, which turns the O(n·q)
scan into per-bucket joins.  At 100 TB the bucketed variant (or an IVF
over k-means centroids) is the only viable plan; brute force remains
the correctness oracle on samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_mining_spark.checkpoint import cut_lineage


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine(qcol, bcol):
    """Cosine with the zero-norm guard shared by all three searchers.

    A zero vector has no direction: its pairs score 0.0 instead of
    0/0 = NaN — NaN sorts ABOVE every real double under Spark's desc
    ordering, so one all-zeros embedding row would otherwise rank as
    the #1 neighbor of EVERY query."""
    denom = _norm(qcol) * _norm(bcol)
    return F.when(denom > 0, _dot(qcol, bcol) / denom).otherwise(F.lit(0.0))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k by (cosine desc, neighbor_id asc) — the one
    place the rank/tie-break contract lives for all three searchers."""
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries``: subset with the same (id, vec) schema.  Output
    (query_id, neighbor_id, cosine, rank) — deterministic tie-break by
    neighbor id asc.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_bv")
    )
    scored = (
        q.crossJoin(base)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cosine(F.col("_qv"), F.col("_bv")).alias("cosine"))
    )
    if round_to is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_to))
    return _topk(scored, k)


def _hyperplane_bits(vec_sql_col: str, n_planes: int, plane_offset: int = 0):
    """Deterministic random-hyperplane signature: plane p component d =
    uniform(-0.5, 0.5) derived from md5(p:d); bit p = sign(dot).

    Built as a SQL expr with EXPLICITLY UNIQUE lambda-variable names per
    plane: composing several same-shaped python-lambda higher-order
    functions (transform inside zip_with inside aggregate) in one select
    cross-wires the unresolved lambda variables in pyspark 4.1 — the md5
    input silently binds to another lambda's variable, corrupting every
    bucket (caught by the DuckDB differential oracle).  ``vec_sql_col``
    is the column NAME of an array<double> column; the dimension is read
    from the array itself (size()), no driver-side probe action."""
    terms = []
    for p in range(n_planes):
        g = p + plane_offset
        comp = (
            f"transform(sequence(0, size({vec_sql_col}) - 1), d{g} -> "
            f"cast(conv(substring(md5(concat('plane{g}:', cast(d{g} as string))), 1, 8), 16, 10) as double) "
            f"/ cast(4294967296 as double) - cast(0.5 as double))"
        )
        dot = (
            f"aggregate(zip_with({vec_sql_col}, {comp}, (x{g}, y{g}) -> x{g} * y{g}), "
            f"cast(0.0 as double), (a{g}, v{g}) -> a{g} + v{g})"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN cast({1 << p} as bigint) ELSE cast(0 as bigint) END)")
    return F.expr(" + ".join(terms))


def _hyperplane_tables(n_planes: int, n_tables: int, vec_sql_col: str = "_v"):
    """Array of (table id, bucket) structs over ``n_tables`` independent
    hyperplane signatures — the shared table-bucketing block for every
    LSH consumer (lsh_cosine_topk here, embedding_near_dup_pairs in
    functions/dedup.py), so the pyspark-4.1 unique-lambda-variable
    workaround lives in exactly one place."""
    return F.array(*[
        F.struct(
            F.lit(t).alias("t"),
            _hyperplane_bits(vec_sql_col, n_planes, plane_offset=t * n_planes).alias("b"),
        )
        for t in range(n_tables)
    ])


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's
    hyperplane-sign buckets, exact cosine within.  Trades recall for
    per-bucket joins instead of a full scan (the 100 TB plan).

    ``n_tables`` > 1 ORs candidates over that many INDEPENDENT hash
    tables (each with its own ``n_planes`` hyperplanes, Indyk–Motwani
    style): single-table recall collapses as n grows because a near
    neighbor only needs ONE disagreeing plane to land elsewhere;
    P(miss) = (1 − p^n_planes)^n_tables decays with tables.  The
    recall gate vs brute force is tests/test_functions.py."""
    tables = _hyperplane_tables(n_planes, n_tables)
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_v"))
        .withColumn("_tb", F.explode(tables))
        .select("query_id", F.col("_v").alias("_qv"), "_tb")
    )
    base = (
        embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_v"))
        .withColumn("_tb", F.explode(tables))
        .select("neighbor_id", F.col("_v").alias("_bv"), "_tb")
    )
    # score BEFORE dedup so the distinct shuffle carries only three
    # scalar columns instead of two dim-sized vectors per candidate
    # (the cosine of a duplicate candidate is identical, so deduping on
    # the scored row is exact)
    scored = (
        q.join(base, "_tb")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cosine(F.col("_qv"), F.col("_bv")).alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _topk(scored, k)


def _with_unit(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    """Project a unit-normalized copy of ``vec_col`` as ``out_col``,
    with the norm HOISTED into its own projected column first: a
    ``transform`` lambda that embeds the norm aggregate re-evaluates
    it per ELEMENT (O(d²) per vector — measured 29× slower at d=512;
    Catalyst does not hoist lambda-invariant subexpressions, and the
    double reference below keeps CollapseProject from inlining the
    aggregate back into the lambda).  Zero vectors stay zero instead
    of dividing to NaN."""
    safe = F.when(F.col("_nrm") > 0, F.col("_nrm")).otherwise(F.lit(1.0))
    return (
        df.withColumn("_nrm", _norm(F.col(vec_col)))
        .withColumn(out_col, F.transform(F.col(vec_col), lambda x: x / safe))
        .drop("_nrm")
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: spherical k-means over
    unit vectors partitions the base into ``n_lists`` coarse cells;
    each query probes its ``n_probe`` nearest centroids and scores
    exact cosine only within those cells — the second 100 TB scale path
    next to LSH (candidate count ≈ n·n_probe/n_lists per query).

    Fully deterministic: centroids initialize from the ``n_lists``
    smallest xxhash64(id) base vectors, and Lloyd iterations are
    fixed-count mean updates (assignment tie-break by centroid id).
    The centroid table is tiny and broadcasts; base vectors are scanned
    once per iteration with a broadcast join — no all-pairs shuffle
    anywhere."""
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_bv"),
    ).persist()
    unit_base = _with_unit(base, "_bv", "_uv").select("neighbor_id", "_uv").persist()

    # deterministic init: n_lists smallest hash(id)
    seed_rows = (
        unit_base.withColumn("_h", F.xxhash64(F.col("neighbor_id").cast("string")))
        .orderBy("_h", "neighbor_id")
        .limit(n_lists)
        .select("_uv")
        .collect()
    )
    spark = embeddings.sparkSession
    cent = spark.createDataFrame(
        [(i, row["_uv"]) for i, row in enumerate(seed_rows)], "cid int, cv array<double>"
    )

    def nearest(df, id_field, vec_field):
        scored = df.join(F.broadcast(cent), how="cross").select(
            df["*"],
            "cid",
            _dot(F.col(vec_field), F.col("cv")).alias("_sim"),
        )
        w = Window.partitionBy(id_field).orderBy(F.col("_sim").desc(), F.col("cid").asc())
        return scored.withColumn("_r", F.row_number().over(w))

    for _ in range(kmeans_iters):
        assigned = nearest(unit_base, "neighbor_id", "_uv").filter(F.col("_r") == 1)
        means = (
            assigned.select("cid", F.posexplode("_uv").alias("d", "x"))
            .groupBy("cid", "d")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("_dm"))
            .select("cid", F.col("_dm.m").alias("raw"))
        )
        means = _with_unit(means, "raw", "cv").select("cid", "cv")
        # empty cells keep their previous centroid
        cent_new = cent.select("cid").join(means, "cid", "left").join(
            cent.select("cid", F.col("cv").alias("_old")), "cid"
        ).select("cid", F.coalesce("cv", "_old").alias("cv"))
        cent = spark.createDataFrame(
            [(r["cid"], r["cv"]) for r in cent_new.collect()], "cid int, cv array<double>"
        )

    lists = nearest(unit_base, "neighbor_id", "_uv").filter(F.col("_r") == 1).select("neighbor_id", "cid")
    inv = base.join(lists, "neighbor_id")

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    q_unit = _with_unit(q, "_qv", "_uv").select("query_id", "_qv", "_uv")
    probes = (
        nearest(q_unit, "query_id", "_uv").filter(F.col("_r") <= n_probe).select("query_id", "_qv", "cid")
    )

    scored = (
        probes.join(inv, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cosine(F.col("_qv"), F.col("_bv")).alias("cosine"))
    )
    out = cut_lineage(_topk(scored, k))
    base.unpersist()
    unit_base.unpersist()
    return out
