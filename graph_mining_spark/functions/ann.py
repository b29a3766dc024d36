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


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


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
    cos = _dot(F.col("_qv"), F.col("_bv")) / (_norm(F.col("_qv")) * _norm(F.col("_bv")))
    scored = (
        q.crossJoin(base)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    if round_to is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_to))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplane_bits(vec_col, dim: int, n_planes: int):
    """Deterministic random-hyperplane signature: plane p component d =
    uniform(-0.5, 0.5) derived from md5(p:d); bit p = sign(dot)."""
    bits = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d, p=p: (
                F.conv(F.substring(F.md5(F.concat(F.lit(f"plane{p}:"), d.cast("string"))), 1, 8), 16, 10).cast("double")
                / F.lit(float(2**32))
                - 0.5
            ),
        )
        dot = F.aggregate(F.zip_with(vec_col, plane, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v)
        bits = bits + F.when(dot > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bits


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's
    hyperplane-sign bucket, exact cosine within.  Trades recall for a
    per-bucket join instead of a full scan (the 100 TB plan)."""
    dim = len(embeddings.select(vec_col).first()[0])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_bkt", _hyperplane_bits(F.col("_qv"), dim, n_planes))
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_bv"),
    ).withColumn("_bkt", _hyperplane_bits(F.col("_bv"), dim, n_planes))
    cos = _dot(F.col("_qv"), F.col("_bv")) / (_norm(F.col("_qv")) * _norm(F.col("_bv")))
    scored = (
        q.join(base, "_bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
