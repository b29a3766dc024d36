"""Fixed Dimensional Encoding vs an independent sequential oracle and
the Chamfer-approximation contract (fixed_dimensional_encoding.cc:
30-310, arXiv:2405.19504)."""

import numpy as np
import pytest

from graph_mining_spark.functions.fde import (
    FdeConfig,
    _gray_to_binary,
    chamfer_similarity,
    fde_encode,
    fde_encode_cloud,
)


def oracle_fde(points, cfg: FdeConfig):
    """Independent per-point sequential re-derivation (same seeded
    matrices, scalar loops instead of the vectorized kernel)."""
    from graph_mining_spark.functions.fde import _ams_matrix, _count_sketch, _simhash_matrix

    identity = cfg.projection_type == "identity"
    proj_dim = cfg.dimension if identity else cfg.projection_dimension
    n_part = 1 << cfg.num_simhash_projections
    out = np.zeros(cfg.num_repetitions * n_part * proj_dim)
    for rep in range(cfg.num_repetitions):
        g = _simhash_matrix(cfg.seed + rep, cfg.dimension, cfg.num_simhash_projections)
        proj = points if identity else points @ _ams_matrix(cfg.seed + rep, cfg.dimension, proj_dim)
        parts = []
        for row in points:
            s = row @ g
            code = 0
            for j in range(cfg.num_simhash_projections):
                bit = 1 if s[j] > 0 else 0
                code = (code << 1) + (bit ^ (code & 1))
            parts.append(code)
        base = rep * n_part * proj_dim
        counts = [0] * n_part
        for i, p in enumerate(parts):
            out[base + p * proj_dim : base + (p + 1) * proj_dim] += proj[i]
            counts[p] += 1
        if cfg.encoding_type == "average":
            for p in range(n_part):
                sl = slice(base + p * proj_dim, base + (p + 1) * proj_dim)
                if counts[p] > 0:
                    out[sl] = out[sl] / counts[p]
                elif cfg.fill_empty_partitions and cfg.num_simhash_projections > 0:
                    binary = _gray_to_binary(p)
                    best, bestd = None, 1 << 30
                    for i, row in enumerate(points):
                        s = row @ g
                        d = 0
                        b = binary
                        for j in range(cfg.num_simhash_projections - 1, -1, -1):
                            bit = 1 if s[j] > 0 else 0
                            d += bit != (b & 1)
                            b >>= 1
                        if d < bestd:
                            bestd, best = d, i
                    out[sl] = proj[best]
    if cfg.final_projection_dimension:
        out = _count_sketch(out, cfg.final_projection_dimension, cfg.seed)
    return out


@pytest.mark.parametrize(
    "enc,proj,fill,final",
    [
        ("sum", "identity", False, None),
        ("average", "identity", False, None),
        ("average", "identity", True, None),
        ("sum", "ams_sketch", False, None),
        ("average", "ams_sketch", True, 32),
    ],
)
def test_kernel_matches_oracle(enc, proj, fill, final):
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(17, 8))
    cfg = FdeConfig(
        dimension=8, num_repetitions=3, num_simhash_projections=3, seed=11,
        encoding_type=enc, projection_type=proj,
        projection_dimension=4 if proj == "ams_sketch" else None,
        fill_empty_partitions=fill, final_projection_dimension=final,
    )
    got = fde_encode_cloud(pts, cfg)
    want = oracle_fde(pts, cfg)
    assert np.allclose(got, want)


def test_chamfer_approximation_contract():
    # dot(query_fde, doc_fde) correlates with true Chamfer similarity
    # across documents (the ranking contract of arXiv:2405.19504)
    rng = np.random.default_rng(7)
    q = rng.normal(size=(6, 16))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    docs = [rng.normal(size=(rng.integers(8, 20), 16)) for _ in range(12)]
    docs = [d / np.linalg.norm(d, axis=1, keepdims=True) for d in docs]
    # make doc 0 a near-copy of the query cloud so it must rank first
    docs[0] = np.vstack([q + 0.05 * rng.normal(size=q.shape), docs[0]])

    qcfg = FdeConfig(dimension=16, num_repetitions=8, num_simhash_projections=4,
                     seed=3, encoding_type="sum")
    dcfg = FdeConfig(dimension=16, num_repetitions=8, num_simhash_projections=4,
                     seed=3, encoding_type="average", fill_empty_partitions=True)
    qf = fde_encode_cloud(q, qcfg)
    scores = [float(qf @ fde_encode_cloud(d, dcfg)) for d in docs]
    true = [chamfer_similarity(q, d) for d in docs]
    assert int(np.argmax(scores)) == int(np.argmax(true)) == 0
    # rank correlation over the rest is positive and strong
    from numpy import corrcoef

    r = corrcoef(np.argsort(np.argsort(scores)), np.argsort(np.argsort(true)))[0, 1]
    assert r > 0.6, f"rank correlation {r}"


def test_spark_plumbing(spark):
    rng = np.random.default_rng(2)
    rows = []
    for doc in range(5):
        for _ in range(10):
            rows.append((doc, [float(x) for x in rng.normal(size=8)]))
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    cfg = FdeConfig(dimension=8, num_repetitions=2, num_simhash_projections=3,
                    encoding_type="average", fill_empty_partitions=True)
    out = {r["doc_id"]: np.array(r["fde"]) for r in fde_encode(df, cfg).collect()}
    assert len(out) == 5
    assert all(len(v) == 2 * 8 * 8 for v in out.values())
    # deterministic: same input -> same sketch
    out2 = {r["doc_id"]: np.array(r["fde"]) for r in fde_encode(df, cfg).collect()}
    assert all(np.allclose(out[k], out2[k]) for k in out)
    # string-keyed clouds work too (output id type follows the input)
    df_s = df.selectExpr("concat('doc:', doc_id) as doc_id", "embedding")
    out_s = {r["doc_id"]: np.array(r["fde"]) for r in fde_encode(df_s, cfg).collect()}
    assert set(out_s) == {f"doc:{i}" for i in range(5)}
    assert all(np.allclose(out_s[f"doc:{k}"], out[k]) for k in out)
