"""String-keyed deterministic tie-breaking (MaxWeightTiebreaker).

Parity target: /root/reference/in_memory/clustering/tiebreaking.h:42-97
and its use in sequential affinity's best-neighbor selection
(affinity_internal.cc:224-260).  Semantics: argmax over incident edges
by lexicographic (weight, fingerprint), fingerprint = hash of the
neighbor's STRING id; in salted mode the fingerprint hashes the
*unordered* {salt, key} pair — with salt = the node's own key this
perturbs every edge by a symmetric random function of both endpoints,
making uniform-weight selections follow one consistent random linear
order over edges (tiebreaking.h:30-41).

The hash is xxhash64 (Spark-native, seedable) rather than farmhash —
the contract is determinism/partition-invariance/salt-sensitivity, not
a specific hash function; farmhash has no JVM-side Spark twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_mining_spark.graph import remove_self_loops


def _pair_fingerprint(salt_hash, key_hash):
    """Unordered {salt, key} fingerprint (tiebreaking.h:57-61:
    Hash64WithSeed(str(min), max) — order-insensitive by construction)."""
    return F.xxhash64(
        F.least(salt_hash, key_hash).cast("string"),
        F.greatest(salt_hash, key_hash).cast("string"),
    )


def best_neighbor_string_tiebreak(
    edges: DataFrame,
    string_ids: DataFrame,
    threshold: float = 0.0,
    salted: bool = True,
) -> DataFrame:
    """Per-node best neighbor by (weight desc, fingerprint desc) with
    string-keyed fingerprints — the sequential-affinity tie-break
    (reference keeps the max (weight, fingerprint) pair, so ties on
    weight resolve to the LARGER fingerprint).

    ``edges``: symmetrized (src, dst, weight).  ``string_ids``:
    (vid, key) — e.g. repo:path for the link graph.  Returns
    (src, dst, weight), one row per node with a qualifying edge;
    the result is partition-layout invariant.
    """
    keys_src = string_ids.select(F.col("vid").alias("src"), F.col("key").alias("_ks"))
    keys_dst = string_ids.select(F.col("vid").alias("dst"), F.col("key").alias("_kd"))
    e = (
        remove_self_loops(edges)
        .filter(F.col("weight") >= threshold)
        .join(keys_src, "src")
        .join(keys_dst, "dst")
    )
    fp_key = F.xxhash64(F.col("_kd"))
    if salted:
        fp = _pair_fingerprint(F.xxhash64(F.col("_ks")), fp_key)
    else:
        fp = fp_key
    w = Window.partitionBy("src").orderBy(
        F.col("weight").desc(), fp.desc(), F.col("dst").desc()
    )
    return (
        e.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("src", "dst", "weight")
    )
