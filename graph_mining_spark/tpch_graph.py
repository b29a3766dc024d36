"""Graphs derived from the driver's TPC-H-ish testdata tables.

The north-rule input (source-code repos) is synthesized by
``ingest.synthesize_source_files``; these derivations exist so the
DuckDB differential harness can gate every graph operator on the SAME
parquet inputs the driver pre-registers (region nation customer
supplier part orders lineitem events documents embeddings).

Vertex-id encoding for the bipartite graph keeps both key spaces
disjoint: customer c → 2c, supplier s → 2s+1 (pure arithmetic — the
oracle SQL reproduces it verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_mining_spark.graph import symmetrize


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed customer→supplier edges weighted by lineitem count."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )


def bipartite_sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    return symmetrize(bipartite_edges(spark, sf_dir))


def coparts_edges(spark: SparkSession, sf_dir: str, order_mod: int = 20) -> DataFrame:
    """Part co-occurrence graph: parts appearing in the same order
    (orders subsampled by ``o % order_mod == 0``), weight = number of
    co-occurrences.  Canonical direction src < dst."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").filter(
        F.col("l_orderkey") % order_mod == 0
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .agg(F.count("*").cast("double").alias("weight"))
    )


def region_clique_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint-clique fixture: nations of the same region form a
    unit-weight clique (25 vertices, 5 disjoint K5s) — the provable
    optimum of clique-seeking objectives (modularity / coconductance /
    pivot) is the region partition, which gives those clusterers a
    closed-form DuckDB twin (REGION_CLIQUE_LABELS_SQL)."""
    n = _read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"), F.col("n_regionkey").alias("r")
    )
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b, (F.col("a.r") == F.col("b.r")) & (F.col("a.k") < F.col("b.k"))
    ).select(
        F.col("a.k").alias("src"), F.col("b.k").alias("dst"), F.lit(1.0).alias("weight")
    )


def nations_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny deterministic graph: consecutive nations (by nationkey)
    within each region form a path — 25 vertices, 5 components."""
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    r = n.withColumn("rn", F.row_number().over(w))
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("b.rn") == F.col("a.rn") + 1),
        )
        .select(
            F.col("a.n_nationkey").cast("long").alias("src"),
            F.col("b.n_nationkey").cast("long").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )


# ---- SQL twins (DuckDB dialect = plain ANSI here) used by oracle_sql ----

BIPARTITE_E_SQL = """
  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
"""

BIPARTITE_SYM_SQL = f"""
  SELECT src, dst, max(weight) AS weight FROM (
    SELECT src, dst, weight FROM ({BIPARTITE_E_SQL})
    UNION ALL
    SELECT dst AS src, src AS dst, weight FROM ({BIPARTITE_E_SQL})
  ) GROUP BY 1, 2
"""

COPARTS_E_SQL = """
  SELECT a.l_partkey AS src, b.l_partkey AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_orderkey % 20 = 0
  GROUP BY 1, 2
"""

# min-member canonical labels of the region-clique partition — the
# provable optimum twin for clique-seeking clusterers on
# region_clique_edges
REGION_CLIQUE_LABELS_SQL = """
  SELECT CAST(n.n_nationkey AS BIGINT) AS vid, CAST(m.m AS BIGINT) AS label
  FROM nation n
  JOIN (SELECT n_regionkey AS rr, min(n_nationkey) AS m FROM nation GROUP BY 1) m
    ON n.n_regionkey = m.rr
"""

NATIONS_E_SQL = """
  WITH rn AS (
    SELECT n_nationkey AS k, n_regionkey AS r,
           row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
    FROM nation
  )
  SELECT CAST(a.k AS BIGINT) AS src, CAST(b.k AS BIGINT) AS dst, 1.0 AS weight
  FROM rn a JOIN rn b ON a.r = b.r AND b.rn = a.rn + 1
"""
