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
``hash_fn="md5"`` selects an md5-hex fingerprint instead (compared
lexicographically) — identical across engines that implement RFC-1321
md5, which gives the operator an exact ANSI-SQL differential twin
(DuckDB ``md5()`` emits the same lowercase hex as Spark's).
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
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-node best neighbor by (weight desc, fingerprint desc) with
    string-keyed fingerprints — the sequential-affinity tie-break
    (reference keeps the max (weight, fingerprint) pair, so ties on
    weight resolve to the LARGER fingerprint).

    ``edges``: symmetrized (src, dst, weight).  ``string_ids``:
    (vid, key) — e.g. repo:path for the link graph.  Returns
    (src, dst, weight), one row per node with a qualifying edge;
    the result is partition-layout invariant.

    ``hash_fn``: ``"xxhash64"`` (default; int64 fingerprints) or
    ``"md5"`` (lowercase-hex fingerprints compared lexicographically;
    engine-portable, so a SQL engine with ``md5()`` can reproduce the
    exact selection — the driver's DuckDB differential gate uses it).
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    keys_src = string_ids.select(F.col("vid").alias("src"), F.col("key").alias("_ks"))
    keys_dst = string_ids.select(F.col("vid").alias("dst"), F.col("key").alias("_kd"))
    e = (
        remove_self_loops(edges)
        .filter(F.col("weight") >= threshold)
        .join(keys_src, "src")
        .join(keys_dst, "dst")
    )
    if hash_fn == "md5":
        fp_key = F.md5(F.col("_kd"))
        if salted:
            fp_salt = F.md5(F.col("_ks"))
            fp = F.md5(
                F.concat(F.least(fp_salt, fp_key), F.greatest(fp_salt, fp_key))
            )
        else:
            fp = fp_key
    else:
        fp_key = F.xxhash64(F.col("_kd"))
        if salted:
            fp = _pair_fingerprint(F.xxhash64(F.col("_ks")), fp_key)
        else:
            fp = fp_key
    # top-1 by (weight desc, fp desc, dst desc) == max over the
    # (weight, fp, dst) struct (field-wise comparison; md5 hex strings
    # compare lexicographically, matching the reference's max-pair
    # rule) — map-side-combined, so only vertex-sized partials shuffle
    return (
        e.groupBy("src")
        .agg(F.max(F.struct(F.col("weight"), fp.alias("_fp"), F.col("dst"))).alias("_b"))
        .select("src", F.col("_b.dst").alias("dst"), F.col("_b.weight").alias("weight"))
    )
