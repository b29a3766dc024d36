"""Salted, range-partitioned CSR shard materialization (north rule).

The reference computes on columnar CSR built by sort + prefix-sum
(gbbs_graph.h:461-529, parallel_graph_utils.cc:34-61).  The Spark
analog: map external vids to DENSE indices, emit an int-pair edge
table hash-partitioned by destination shard, and let vectorized NumPy
kernels (mapInArrow / mapInPandas) consume each partition as arrays.

Skew splitting: a destination with degree > ``salt_threshold`` has its
in-edges spread across ``ceil(deg/threshold)`` salt buckets, so no
single task owns a hub vertex's whole edge list.  Salted partials are
re-merged in the second-stage combine (np.add.at on the consumer
side), which is exactly the two-stage salted aggregation SURVEY §7.1
prescribes.  Results are bitwise-independent of the salting (the
combine is an integer-indexed sum of the same terms).

Scale envelope: the vertex *vector* (ranks/labels) lives on the driver
as NumPy in this mode — viable to ~10⁸ vertices at 8 B each; the edge
set stays fully distributed.  Beyond that, the pure-DataFrame
supersteps in operators/ are the fallback (unbounded, ~5-10× more wall
per superstep).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from graph_mining_spark.graph import vertex_ids


@dataclass
class CsrShards:
    """Distributed CSR-ish shards + driver-side vertex dictionary."""

    edges_idx: DataFrame  # (s: int src index, d: int dst index), partitioned by salted dst shard
    vids: np.ndarray  # dense index -> external vid (sorted ascending)
    out_deg: np.ndarray  # dense index -> out-degree
    n: int

    def index_of(self, vid_array: np.ndarray) -> np.ndarray:
        return np.searchsorted(self.vids, vid_array)

    def unpersist(self) -> None:
        self.edges_idx.unpersist()


def materialize_csr_shards(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    partitions: int = 32,
    salt_threshold: int = 100_000,
) -> CsrShards:
    """Build the salted dst-sharded int-pair edge table.

    ``edges`` is directed (src → dst); the consumer gathers by dst.
    """
    spark = edges.sparkSession
    verts = vertex_ids(edges) if vertices is None else vertices.select(F.col("vid").cast("long")).distinct()
    vids = np.sort(np.array([r["vid"] for r in verts.collect()], dtype=np.int64))
    n = len(vids)

    bvids = spark.sparkContext.broadcast(vids)

    def pack(batches):
        # dense index via broadcast binary search, vectorized per Arrow batch
        import pyarrow as pa

        for b in batches:
            s = np.searchsorted(bvids.value, b.column("src").to_numpy(zero_copy_only=False))
            d = np.searchsorted(bvids.value, b.column("dst").to_numpy(zero_copy_only=False))
            yield pa.RecordBatch.from_arrays(
                [pa.array(s.astype(np.int32)), pa.array(d.astype(np.int32))], names=["s", "d"]
            )

    e_idx = edges.select("src", "dst").mapInArrow(pack, schema="s int, d int")

    # in-degree per dst index for salting decisions
    indeg = e_idx.groupBy("d").agg(F.count("*").alias("_deg"))
    salted = (
        e_idx.join(indeg, "d")
        .withColumn(
            "_salt",
            F.when(
                F.col("_deg") > salt_threshold,
                F.pmod(F.hash("s"), F.ceil(F.col("_deg") / salt_threshold).cast("int")),
            ).otherwise(F.lit(0)),
        )
        .select("s", "d", "_salt")
    )
    packed = (
        salted.repartition(partitions, "d", "_salt")
        .drop("_salt")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    packed.count()  # materialize

    deg = np.zeros(n, dtype=np.int64)
    out_rows = edges.groupBy("src").agg(F.count("*").alias("c")).collect()
    src_arr = np.array([r["src"] for r in out_rows], dtype=np.int64)
    cnt_arr = np.array([r["c"] for r in out_rows], dtype=np.int64)
    deg[np.searchsorted(vids, src_arr)] = cnt_arr

    return CsrShards(edges_idx=packed, vids=vids, out_deg=deg, n=n)


def gather_sum(shards: CsrShards, values: np.ndarray) -> np.ndarray:
    """One gather superstep: out[d] = Σ_{(s,d)∈E} values[s], computed as
    a single distributed map over the CSR shards with per-partition
    NumPy accumulation (np.add.at over Arrow batches — never per-row
    Python), then a driver-side combine of per-partition sparse
    partials (the salted second stage)."""
    spark = shards.edges_idx.sparkSession
    bvals = spark.sparkContext.broadcast(values)
    n = shards.n

    def kernel(batches):
        import pyarrow as pa

        acc = np.zeros(n, dtype=np.float64)
        touched = np.zeros(n, dtype=bool)
        for batch in batches:
            s = batch.column("s").to_numpy(zero_copy_only=False)
            d = batch.column("d").to_numpy(zero_copy_only=False)
            # bincount is the fast scatter-add (≫ np.add.at)
            acc += np.bincount(d, weights=bvals.value[s], minlength=n)
            touched[d] = True
        nz = np.flatnonzero(touched)
        yield pa.RecordBatch.from_arrays(
            [pa.array(nz.astype(np.int32)), pa.array(acc[nz])], names=["d", "v"]
        )

    pdf = shards.edges_idx.mapInArrow(kernel, schema="d int, v double").toPandas()
    out = np.bincount(
        pdf["d"].to_numpy(), weights=pdf["v"].to_numpy(), minlength=n
    ).astype(np.float64)
    bvals.destroy()
    return out


def gather_min(shards: CsrShards, values: np.ndarray) -> np.ndarray:
    """One min-gather superstep: out[d] = min(values[d],
    min_{(s,d)∈E} values[s]) — the hash-to-min kernel for connected
    components, vectorized per partition."""
    spark = shards.edges_idx.sparkSession
    bvals = spark.sparkContext.broadcast(values)
    n = shards.n

    def kernel(batches):
        import pyarrow as pa

        acc = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        touched = np.zeros(n, dtype=bool)
        for batch in batches:
            s = batch.column("s").to_numpy(zero_copy_only=False)
            d = batch.column("d").to_numpy(zero_copy_only=False)
            np.minimum.at(acc, d, bvals.value[s])
            touched[d] = True
        nz = np.flatnonzero(touched)
        yield pa.RecordBatch.from_arrays(
            [pa.array(nz.astype(np.int32)), pa.array(acc[nz])], names=["d", "v"]
        )

    pdf = shards.edges_idx.mapInArrow(kernel, schema="d int, v long").toPandas()
    out = values.copy()
    np.minimum.at(out, pdf["d"].to_numpy(), pdf["v"].to_numpy())
    bvals.destroy()
    return out
