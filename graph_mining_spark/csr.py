"""Salted CSR shard materialization + vectorized gather kernels.

The reference computes on columnar CSR built by sort + prefix-sum
(gbbs_graph.h:461-529, parallel_graph_utils.cc:34-61).  The Spark
analog here:

  1. external vids → DENSE int32 indices (broadcast binary search,
     vectorized per Arrow batch);
  2. the int-pair edge table is hash-partitioned by (dst, salt) and
     written ONCE as parquet shards through the Hadoop FS abstraction
     (SPARK_GRAFT_CKPT_DIR may be file:, hdfs:, s3a:, ...); the shard
     list comes from the same FS API and executors read shards by URI,
     so driver and executors need no shared local disk;
  3. each gather superstep maps over a tiny shard-descriptor DataFrame;
     the kernel loads its shard through a WORKER-PROCESS-LOCAL LRU
     cache (Spark reuses Python workers across jobs, so steady-state
     supersteps ship only the broadcast value vector — profiling showed
     re-streaming 8M edge rows through Arrow costs ~2.2 s/superstep,
     while a cached-shard gather is dominated by the np.bincount).

Skew splitting: a destination with degree > ``salt_threshold`` has its
in-edges spread across ``ceil(deg/threshold)`` salt buckets so no
single task owns a hub's whole edge list; the driver-side combine
(np.bincount over per-shard partials) is the second stage of the
two-stage salted aggregation (SURVEY §7.1).  Results are bitwise
independent of salting.

Scale envelope: the vertex VECTOR (ranks/labels) lives on the driver
as NumPy — viable to ~10⁸ vertices; the edge set stays distributed.
Beyond that, the pure-DataFrame supersteps in operators/ are the
fallback (unbounded, more wall per superstep).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections import OrderedDict
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_mining_spark.graph import vertex_ids

# Worker-process-local shard cache (Python workers are reused across
# jobs).  Bounded LRU so a worker that sees many shards doesn't hold
# the whole graph.
_SHARD_CACHE: OrderedDict = OrderedDict()
_SHARD_CACHE_MAX = int(os.environ.get("SPARK_GRAFT_SHARD_CACHE", "8"))


def _load_shard(path: str):
    """Read one shard by URI — local, HDFS, S3A, ... via pyarrow's
    filesystem resolution, so executors read from whatever shared store
    the shards were written to (they are NOT assumed to sit on the
    driver's local disk)."""
    hit = _SHARD_CACHE.get(path)
    if hit is not None:
        _SHARD_CACHE.move_to_end(path)
        return hit
    import pyarrow.parquet as pq

    if path.startswith("file:"):
        # Hadoop renders local URIs as file:/abs/path — parse properly
        # so a URI with an authority (file://host/path) keeps its
        # meaning instead of collapsing to /host/path
        from urllib.parse import urlparse

        parsed = urlparse(path)
        if parsed.netloc and parsed.netloc != "localhost":
            raise ValueError(f"non-local file URI authority: {path}")
        t = pq.read_table(parsed.path, columns=["s", "d"], memory_map=True)
    elif "://" in path:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        t = pq.read_table(rel, columns=["s", "d"], filesystem=fs)
    else:
        t = pq.read_table(path, columns=["s", "d"], memory_map=True)
    s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
    d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
    _SHARD_CACHE[path] = (s, d)
    while len(_SHARD_CACHE) > _SHARD_CACHE_MAX:
        _SHARD_CACHE.popitem(last=False)
    return s, d


def _hadoop_fs(spark, path: str):
    """Hadoop FileSystem handle for ``path`` — the same abstraction the
    write goes through, valid for any configured scheme."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _list_shard_uris(spark, shard_dir: str) -> list[str]:
    """Enumerate shard files through the Hadoop FS API (NOT os.listdir,
    which only sees the driver's local disk)."""
    fs, hpath = _hadoop_fs(spark, shard_dir)
    uris = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("part-") and not name.endswith(".crc"):
            uris.append(st.getPath().toString())
    return sorted(uris)


@dataclass
class CsrShards:
    """Disk-backed CSR shards + driver-side vertex dictionary."""

    shard_files: DataFrame  # one row per shard parquet file, 1 file/partition
    shard_dir: str
    vids: np.ndarray  # dense index -> external vid (sorted ascending)
    out_deg: np.ndarray  # dense index -> out-degree
    n: int
    _cleanup: bool = field(default=True)

    def index_of(self, vid_array: np.ndarray) -> np.ndarray:
        return np.searchsorted(self.vids, vid_array)

    def unpersist(self) -> None:
        if self._cleanup:
            try:
                spark = self.shard_files.sparkSession
                fs, hpath = _hadoop_fs(spark, self.shard_dir)
                fs.delete(hpath, True)
            except Exception:  # session gone — best-effort local cleanup
                shutil.rmtree(self.shard_dir, ignore_errors=True)
        # always release the cached descriptor DataFrame, even when the
        # shard files themselves are kept (_cleanup=False)
        self.shard_files.unpersist()


def materialize_csr_shards(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    partitions: int = 32,
    salt_threshold: int = 100_000,
    shard_root: str | None = None,
) -> CsrShards:
    """Build the salted dst-sharded int-pair shard files.

    ``edges`` is directed (src → dst); gathers aggregate by dst.
    """
    spark = edges.sparkSession
    verts = vertex_ids(edges) if vertices is None else vertices.select(F.col("vid").cast("long")).distinct()
    vids = np.sort(verts.toPandas()["vid"].to_numpy(dtype=np.int64))  # arrow collect
    n = len(vids)

    bvids = spark.sparkContext.broadcast(vids)

    def pack(batches):
        # dense index via broadcast binary search, vectorized per batch
        import pyarrow as pa

        for b in batches:
            s = np.searchsorted(bvids.value, b.column("src").to_numpy(zero_copy_only=False))
            d = np.searchsorted(bvids.value, b.column("dst").to_numpy(zero_copy_only=False))
            yield pa.RecordBatch.from_arrays(
                [pa.array(s.astype(np.int32)), pa.array(d.astype(np.int32))], names=["s", "d"]
            )

    # staged once: the reindex feeds both the degree probe and the
    # shard write, and recomputing the mapInArrow pass costs more than
    # caching the 8-byte int pairs
    from pyspark.storagelevel import StorageLevel

    e_idx = (
        edges.select("src", "dst")
        .mapInArrow(pack, schema="s int, d int")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # in-degree per dst index drives the salting decision; the groupBy
    # is map-side combined (≤ n keys cross the wire).  When NO dst
    # exceeds the threshold — the common case; hubs are the exception —
    # the per-edge degree join is pure overhead, so it is skipped and
    # the write partitions by d alone (bitwise-identical gathers: the
    # driver-side combine never depended on shard placement)
    indeg = e_idx.groupBy("d").agg(F.count("*").alias("_deg"))
    max_deg = indeg.agg(F.max("_deg")).first()[0] or 0
    if max_deg > salt_threshold:
        to_write = (
            e_idx.join(indeg, "d")
            .withColumn(
                "_salt",
                F.when(
                    F.col("_deg") > salt_threshold,
                    F.pmod(F.hash("s"), F.ceil(F.col("_deg") / salt_threshold).cast("int")),
                ).otherwise(F.lit(0)),
            )
            .repartition(partitions, "d", "_salt")
            .select("s", "d")
        )
    else:
        to_write = e_idx.repartition(partitions, "d")
    root = shard_root or os.environ.get("SPARK_GRAFT_CKPT_DIR", "/tmp/graph_mining_spark_ckpt")
    shard_dir = os.path.join(root, f"csr_{uuid.uuid4().hex[:12]}")
    to_write.write.mode("overwrite").parquet(shard_dir)
    files = _list_shard_uris(spark, shard_dir)
    shard_files = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        max(len(files), 1)
    )
    shard_files = shard_files.persist()
    shard_files.count()

    deg = np.zeros(n, dtype=np.int64)
    out_pdf = edges.groupBy("src").agg(F.count("*").alias("c")).toPandas()
    if len(out_pdf):
        src_arr = out_pdf["src"].to_numpy(dtype=np.int64)
        cnt_arr = out_pdf["c"].to_numpy(dtype=np.int64)
        deg[np.searchsorted(vids, src_arr)] = cnt_arr
    e_idx.unpersist()
    bvids.destroy()

    return CsrShards(shard_files=shard_files, shard_dir=shard_dir, vids=vids, out_deg=deg, n=n)


def _gather(shards: CsrShards, values: np.ndarray, mode: str) -> np.ndarray:
    """Shared driver for gather_sum / gather_min: one map over the
    shard descriptors, per-shard NumPy kernel over cached edge arrays,
    driver-side combine (the salted second stage)."""
    spark = shards.shard_files.sparkSession
    bvals = spark.sparkContext.broadcast(values)
    n = shards.n

    def kernel(batches):
        import pyarrow as pa

        if mode == "sum":
            acc = np.zeros(n, dtype=np.float64)
        else:
            acc = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        touched = np.zeros(n, dtype=bool)
        for batch in batches:
            for path in batch.column("path").to_pylist():
                s, d = _load_shard(path)
                if mode == "sum":
                    acc += np.bincount(d, weights=bvals.value[s], minlength=n)
                else:
                    np.minimum.at(acc, d, bvals.value[s])
                touched[d] = True
        nz = np.flatnonzero(touched)
        out_type = pa.array(acc[nz])
        yield pa.RecordBatch.from_arrays([pa.array(nz.astype(np.int32)), out_type], names=["d", "v"])

    out_schema = "d int, v double" if mode == "sum" else "d int, v long"
    pdf = shards.shard_files.mapInArrow(kernel, schema=out_schema).toPandas()
    if mode == "sum":
        out = np.bincount(pdf["d"].to_numpy(), weights=pdf["v"].to_numpy(), minlength=n).astype(
            np.float64
        )
    else:
        out = values.copy()
        np.minimum.at(out, pdf["d"].to_numpy(), pdf["v"].to_numpy())
    bvals.destroy()
    return out


def gather_sum(shards: CsrShards, values: np.ndarray) -> np.ndarray:
    """out[d] = Σ_{(s,d)∈E} values[s]."""
    return _gather(shards, values, "sum")


def gather_min(shards: CsrShards, values: np.ndarray) -> np.ndarray:
    """out[d] = min(values[d], min_{(s,d)∈E} values[s]) — the
    hash-to-min kernel for connected components."""
    return _gather(shards, values, "min")
