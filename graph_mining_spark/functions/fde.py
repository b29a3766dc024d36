"""Fixed Dimensional Encoding (FDE) — point-cloud sketches whose dot
products approximate Chamfer similarity.

Parity target: /root/reference/sketching/point_cloud/
fixed_dimensional_encoding.cc:30-310, config semantics
fixed_dimensional_encoding_config.proto:20-81 (arXiv:2405.19504,
"MUVERA").  A point cloud (e.g. all token embeddings of a document) is
encoded into ONE fixed-size vector:

  - per repetition r: a seeded Gaussian SimHash matrix partitions space
    into 2^k buckets (bit sequence folded through a Gray code,
    fixed_dimensional_encoding.cc:31-34, 67-74);
  - each point's (optionally AMS-projected) vector is SUMMED into its
    partition's block (query side) or AVERAGED per partition (document
    side), with optional nearest-point fill of empty partitions by
    minimum SimHash bit disagreement (:276-296);
  - optional final Count-Sketch projection to a smaller dimension
    (:84-99).

  dot(query_fde, doc_fde) ≈ Chamfer(Q, D) = Σ_{q∈Q} max_{p∈D} <q, p>.

RNG note: the reference derives its Gaussian/Rademacher matrices from
std::mt19937 + libstdc++ distributions, which are not portable;
this implementation derives them from numpy's seeded Philox — the
construction, shapes, and contract are identical, the sampled matrices
are not bit-equal.  The pytest gate asserts (a) exact parity with an
independent sequential Python oracle and (b) the Chamfer approximation
contract.

Spark shape: one applyInPandas over the point-cloud id — the kernel is
a few dense GEMMs per cloud (NumPy), the grouping shuffle is bounded by
Σ|cloud|, and the output is one row per cloud.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class FdeConfig:
    """fixed_dimensional_encoding_config.proto:20-81."""

    dimension: int
    num_repetitions: int = 1
    num_simhash_projections: int = 4
    seed: int = 1
    encoding_type: str = "sum"  # "sum" (query) | "average" (document)
    projection_type: str = "identity"  # "identity" | "ams_sketch"
    projection_dimension: int | None = None
    fill_empty_partitions: bool = False
    final_projection_dimension: int | None = None


def _simhash_matrix(seed: int, dim: int, k: int) -> np.ndarray:
    return np.random.default_rng(np.random.Philox(seed)).normal(size=(dim, k))


def _ams_matrix(seed: int, dim: int, proj: int) -> np.ndarray:
    rng = np.random.default_rng(np.random.Philox(seed))
    out = np.zeros((dim, proj))
    idx = rng.integers(0, proj, size=dim)
    sign = rng.integers(0, 2, size=dim) * 2.0 - 1.0
    out[np.arange(dim), idx] = sign
    return out


def _gray_append(codes: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """AppendToGrayCode vectorized over points (:31-34):
    g' = (g << 1) + (bit ^ (g & 1))."""
    return (codes << 1) + (bits ^ (codes & 1))


def _partition_indices(sketch: np.ndarray) -> np.ndarray:
    """SimHashPartitionIndex per point (:67-74): fold sign bits through
    the Gray code, column order = projection order."""
    codes = np.zeros(sketch.shape[0], dtype=np.int64)
    for j in range(sketch.shape[1]):
        codes = _gray_append(codes, (sketch[:, j] > 0).astype(np.int64))
    return codes


def _gray_to_binary(num: int) -> int:
    return num ^ (num >> 1)


def _count_sketch(vec: np.ndarray, final_dim: int, seed: int) -> np.ndarray:
    """ApplyCountSketchToVector (:84-99) with the numpy RNG."""
    rng = np.random.default_rng(np.random.Philox(seed))
    idx = rng.integers(0, final_dim, size=len(vec))
    sign = rng.integers(0, 2, size=len(vec)) * 2.0 - 1.0
    out = np.zeros(final_dim)
    np.add.at(out, idx, sign * vec)
    return out


def fde_encode_cloud(points: np.ndarray, cfg: FdeConfig) -> np.ndarray:
    """Encode one point cloud (n_points x dimension) to its FDE."""
    if points.ndim != 2 or points.shape[1] != cfg.dimension:
        raise ValueError(f"point cloud must be (n, {cfg.dimension})")
    if not (0 <= cfg.num_simhash_projections < 31):
        raise ValueError("unsupported number of simhash projections")
    is_query = cfg.encoding_type == "sum"
    if is_query and cfg.fill_empty_partitions:
        raise ValueError("query FDE does not support fill_empty_partitions")
    identity = cfg.projection_type == "identity"
    proj_dim = cfg.dimension if identity else int(cfg.projection_dimension or 0)
    if not identity and proj_dim <= 0:
        raise ValueError("positive projection_dimension required for ams_sketch")
    n_part = 1 << cfg.num_simhash_projections
    out = np.zeros(cfg.num_repetitions * n_part * proj_dim)

    for rep in range(cfg.num_repetitions):
        if cfg.num_simhash_projections > 0:
            sketch = points @ _simhash_matrix(cfg.seed + rep, cfg.dimension, cfg.num_simhash_projections)
            parts = _partition_indices(sketch)
        else:
            sketch = None
            parts = np.zeros(len(points), dtype=np.int64)
        projected = points if identity else points @ _ams_matrix(cfg.seed + rep, cfg.dimension, proj_dim)
        base = rep * n_part * proj_dim
        sizes = np.bincount(parts, minlength=n_part).astype(float)
        for p in range(n_part):
            mask = parts == p
            if not mask.any():
                if (
                    not is_query
                    and cfg.fill_empty_partitions
                    and cfg.num_simhash_projections > 0
                ):
                    # nearest point by SimHash bit disagreement (:276-296)
                    binary = _gray_to_binary(p)
                    target_bits = np.array(
                        [(binary >> (cfg.num_simhash_projections - 1 - j)) & 1 for j in range(cfg.num_simhash_projections)]
                    )
                    bits = (sketch > 0).astype(int)
                    dists = (bits != target_bits).sum(axis=1)
                    nearest = int(np.argmin(dists))
                    out[base + p * proj_dim : base + (p + 1) * proj_dim] = projected[nearest]
                continue
            block = projected[mask].sum(axis=0)
            if not is_query:
                block = block / sizes[p]
            out[base + p * proj_dim : base + (p + 1) * proj_dim] = block

    if cfg.final_projection_dimension:
        out = _count_sketch(out, cfg.final_projection_dimension, cfg.seed)
    return out


def chamfer_similarity(q: np.ndarray, d: np.ndarray) -> float:
    """Chamfer(Q, D) = Σ_{q∈Q} max_{p∈D} <q, p> — what FDE dot products
    approximate (fixed_dimensional_encoding.h:19-22)."""
    return float((q @ d.T).max(axis=1).sum())


def fde_encode(
    clouds: DataFrame,
    cfg: FdeConfig,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed FDE: ``clouds`` has one row per POINT
    (id, array<float>); output one row per cloud (id, fde array<double>).

    Points are put in CANONICAL (lexicographic-by-vector) order before
    encoding: Spark row order within a group is undefined, and both the
    floating-point summation order and the fill-empty-partition argmin
    tie-break (fixed_dimensional_encoding.cc:276-296 takes the FIRST
    minimum in point order) depend on it — the canonical order makes
    the sketch a pure function of the point SET, reproducible across
    runs and partitionings.  ``fde_encode_cloud`` itself stays
    order-honoring for exact kernel parity with the reference.
    """

    def run(pdf):
        import pandas as pd

        pts = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
        pts = pts[np.lexsort(pts.T[::-1])]
        fde = fde_encode_cloud(pts, cfg)
        return pd.DataFrame({id_col: [pdf[id_col].iloc[0]], "fde": [fde.tolist()]})

    # id field type follows the input (a string doc id is as natural a
    # cloud key as a long)
    id_type = clouds.schema[id_col].dataType.simpleString()
    return (
        clouds.select(id_col, vec_col)
        .groupBy(id_col)
        .applyInPandas(run, schema=f"{id_col} {id_type}, fde array<double>")
    )
