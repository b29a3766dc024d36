"""Deterministic synthetic graph generators (test/bench fixtures).

Parity: /root/reference/generation/erdos_renyi.cc:30-48 (G(n, p)),
generation/barabasi_albert.h:22-40 (preferential attachment),
generation/add_edge_weights.h:22-27 (uniform random weights).

Erdős–Rényi and the edge-weight decorator are pure column expressions
(seeded hashes — identical at any parallelism).  Barabási–Albert is
inherently sequential (each arrival samples ∝ current degrees), so it
runs driver-side in NumPy — it exists to build fixtures, not datasets;
the reference's generator is equally sequential per node.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def erdos_renyi(spark: SparkSession, n: int, p: float, seed: int = 42) -> DataFrame:
    """G(n, p) over unordered pairs, emitted as src < dst, weight 1.0.

    Pair (i, j) is present iff a seeded uniform hash < p.  The pair
    enumeration is O(n²) rows before the filter — fixture scale only;
    for bench-scale inputs use a fixed-m hash graph instead
    (scripts/scaling_bench._hash_graph)."""
    pairs = (
        spark.range(n)
        .select(F.col("id").alias("src"))
        .join(spark.range(n).select(F.col("id").alias("dst")), how="cross")
        .filter(F.col("src") < F.col("dst"))
    )
    u = (
        F.pmod(F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed)), F.lit(1 << 30)).cast("double")
        / F.lit(float(1 << 30))
    )
    return pairs.filter(u < p).withColumn("weight", F.lit(1.0))


def add_uniform_edge_weights(
    edges: DataFrame, low: float = 0.0, high: float = 1.0, seed: int = 42
) -> DataFrame:
    """Replace weights with seeded uniform(low, high) keyed by the edge."""
    u = (
        F.pmod(F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed)), F.lit(1 << 30)).cast("double")
        / F.lit(float(1 << 30))
    )
    return edges.select("src", "dst", (F.lit(low) + u * (high - low)).alias("weight"))


def barabasi_albert(spark: SparkSession, n: int, m: int, seed: int = 42) -> DataFrame:
    """Preferential attachment: node t attaches to ``m`` distinct
    existing nodes sampled ∝ degree.  Driver-side NumPy (sequential by
    definition); returns an edge DataFrame src < dst, weight 1.0."""
    if n <= m:
        raise ValueError("need n > m")
    rng = np.random.default_rng(seed)
    # start from a star on m+1 nodes so degrees are nonzero
    targets = list(range(m))
    repeated: list[int] = []
    edges: list[tuple[int, int]] = []
    for v in range(m, n):
        chosen = set()
        pool = repeated if repeated else targets
        while len(chosen) < m:
            chosen.add(int(pool[rng.integers(0, len(pool))]))
        for t in sorted(chosen):
            edges.append((min(t, v), max(t, v)))
            repeated.extend((t, v))
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
