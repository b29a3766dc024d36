import hashlib

import numpy as np
import pytest

from graph_mining_spark.functions.ann import cosine_topk, ivf_cosine_topk, lsh_cosine_topk
from graph_mining_spark.functions.dedup import (
    dedup_exact,
    hamming_near_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from graph_mining_spark.functions.multimodal import (
    decode_image,
    documents_as_media,
    extract_media_features,
)
from graph_mining_spark.functions.text import language_id, text_fingerprint, text_stats, token_counts

DOCS = [
    (0, "the cat sat on the mat", "src0"),
    (1, "the cat sat on the mat", "src0"),      # exact dup of 0
    (2, "the cat sat on the red mat", "src0"),  # near dup
    (3, "completely different words entirely here", "src1"),
    (4, "der hund und der ball", "src1"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_text_stats(spark):
    rows = {r["doc_id"]: r for r in text_stats(_docs(spark)).collect()}
    assert rows[0]["n_chars"] == 22
    assert rows[0]["n_tokens"] == 6
    assert rows[3]["n_tokens"] == 5
    assert rows[0]["n_digits"] == 0


def test_token_counts(spark):
    rows = {r["doc_id"]: r for r in token_counts(_docs(spark)).collect()}
    assert rows[0]["n_ws_tokens"] == 6
    assert rows[0]["n_bpe_tokens"] == 6


def test_language_id(spark):
    rows = {r["doc_id"]: r["lang_guess"] for r in language_id(_docs(spark)).collect()}
    assert rows[0] == "en"
    assert rows[4] == "de"
    assert rows[3] == "und"  # no markers


def test_fingerprint_groups_prefix_dups(spark):
    rows = {r["doc_id"]: r["fingerprint"] for r in text_fingerprint(_docs(spark), prefix=10).collect()}
    assert rows[0] == rows[1] == rows[2]  # same 10-char prefix
    assert rows[0] != rows[3]


def test_dedup_exact(spark):
    rows = {r["doc_id"]: r["keep"] for r in dedup_exact(_docs(spark)).collect()}
    assert rows == {0: True, 1: False, 2: True, 3: True, 4: True}


def test_minhash_identical_docs_identical_sigs(spark):
    sigs = minhash_signatures(_docs(spark), num_hashes=8, shingle_k=5)
    by_doc = {}
    for r in sigs.collect():
        by_doc.setdefault(r["doc_id"], {})[r["seed"]] = r["minhash"]
    assert by_doc[0] == by_doc[1]
    assert by_doc[0] != by_doc[3]
    assert all(len(v) == 8 for v in by_doc.values())
    # near-dup shares most minhashes
    shared = sum(by_doc[0][s] == by_doc[2][s] for s in range(8))
    assert shared >= 4


def test_lsh_candidate_pairs(spark):
    sigs = minhash_signatures(_docs(spark), num_hashes=8, shingle_k=5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sigs, num_hashes=8, bands=4).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_ngram_jaccard(spark):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_simhash_and_hamming(spark):
    sh = simhash(_docs(spark), bits=32)
    rows = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    assert rows[0] == rows[1]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in hamming_near_pairs(sh, max_distance=3).collect()}
    assert pairs.get((0, 1)) == 0


def test_simhash_python_oracle(spark):
    # replicate the definition: md5-derived 60-bit token hash, ±1 votes
    def oracle(text, bits=32):
        toks = set(text.split())
        votes = [0] * bits
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for b in range(bits):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(2**b for b in range(bits) if votes[b] > 0)

    rows = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark), bits=32).collect()}
    for doc_id, text, _ in DOCS:
        assert rows[doc_id] == oracle(text), f"doc {doc_id}"


def _embeddings(spark, n=40, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_cosine_topk_vs_numpy(spark):
    df, vecs = _embeddings(spark)
    queries = df.filter("vec_id < 5")
    got = cosine_topk(df, queries, k=3, round_to=None).collect()
    v = vecs.astype(np.float64)
    sims = v @ v.T / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :])
    for r in got:
        qi, ni = r["query_id"], r["neighbor_id"]
        assert abs(r["cosine"] - sims[qi, ni]) < 1e-9
    for q in range(5):
        want = sorted((i for i in range(40) if i != q), key=lambda i: (-sims[q, i], i))[:3]
        have = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == q]
        assert have == want


def test_lsh_cosine_topk_recall(spark):
    df, vecs = _embeddings(spark, n=60)
    queries = df.filter("vec_id < 10")
    approx = lsh_cosine_topk(df, queries, k=3, n_planes=2)
    rows = approx.collect()
    # structural checks: ranks contiguous, neighbors from same bucket only
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert sorted(x["rank"] for x in rs) == list(range(1, len(rs) + 1))
    # overlap with exact top-3 should be nontrivial on average
    exact = cosine_topk(df, queries, k=3, round_to=None).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len({x["neighbor_id"] for x in rs} & ex[q]) for q, rs in by_q.items())
    assert hits >= 5  # recall >> 0 with 2 planes on 60 vecs


def test_lsh_multi_table_recall_gate(spark):
    # recall@3 >= 0.9 vs brute force with OR over 6 independent tables
    # (the single-table variant trades recall away; multi-table is the
    # production configuration — Indyk–Motwani L-table OR).  The fixture
    # is CLUSTERED (centers + noise) like real embedding corpora: on
    # uniformly random vectors the top-3 "neighbors" sit near cosine
    # ~0.5 where no LSH family concentrates.
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(15, 12))
    vecs = np.stack(
        [centers[i % 15] + 0.15 * rng.normal(size=12) for i in range(150)]
    ).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 20")
    exact = cosine_topk(df, queries, k=3, round_to=None).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = lsh_cosine_topk(df, queries, k=3, n_planes=4, n_tables=6).collect()
    ap = {}
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(ap.get(q, set()) & ex[q]) for q in ex)
    total = sum(len(s) for s in ex.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_ivf_recall_gate(spark):
    # IVF with n_probe=4 of 8 lists on the clustered fixture: recall@3
    # >= 0.9 vs brute force, and results are deterministic across runs
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(15, 12))
    vecs = np.stack(
        [centers[i % 15] + 0.15 * rng.normal(size=12) for i in range(150)]
    ).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 20")
    exact = cosine_topk(df, queries, k=3, round_to=None).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = ivf_cosine_topk(df, queries, k=3, n_lists=8, n_probe=4, kmeans_iters=4)
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(ap.get(q, set()) & ex[q]) for q in ex)
    total = sum(len(s) for s in ex.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"
    # determinism
    again = ivf_cosine_topk(df, queries, k=3, n_lists=8, n_probe=4, kmeans_iters=4)
    a = sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in approx.collect())
    b = sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in again.collect())
    assert a == b


def test_hamming_pairs_exact_recall(spark):
    # pigeonhole blocking must find EVERY pair within max_distance —
    # compare against the brute-force O(n^2) pair set
    import itertools

    rng = np.random.default_rng(17)
    base = int(rng.integers(0, 2**32))
    hashes = [base]
    for _ in range(40):
        h = hashes[rng.integers(0, len(hashes))]
        flips = rng.choice(32, size=int(rng.integers(0, 5)), replace=False)
        for b in flips:
            h ^= 1 << int(b)
        hashes.append(int(h))
    df = spark.createDataFrame(list(enumerate(hashes)), "doc_id long, simhash long")
    got = {(r["doc_a"], r["doc_b"]) for r in hamming_near_pairs(df, max_distance=3).collect()}
    want = {
        (a, b)
        for (a, ha), (b, hb) in itertools.combinations(enumerate(hashes), 2)
        if bin(ha ^ hb).count("1") <= 3
    }
    assert got == want


def test_multimodal_plumbing(spark):
    media = documents_as_media(_docs(spark))
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    for doc_id, text, _ in DOCS:
        want = hashlib.sha256(text.encode()).hexdigest()
        assert feats[doc_id]["checksum"] == want
        assert feats[doc_id]["n_bytes"] == len(text.encode())
    # compressed/unknown formats still refuse inside the kernel
    with pytest.raises(Exception, match="unsupported image magic"):
        decode_image(media).collect()


def test_decode_image_bmp_ppm_roundtrip(spark):
    """Real in-sandbox decode: a deterministic gradient image encoded
    as 24-bit BMP and binary PPM must round-trip bit-exactly through
    the mapInPandas decode kernel (pure NumPy, no imaging library)."""
    import numpy as np

    from graph_mining_spark.functions.multimodal import _decode_bmp, encode_bmp

    h, w = 13, 17  # odd width exercises BMP 4-byte row padding
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 15) % 256, (y * 19) % 256, (x + y) % 256], axis=-1).astype(np.uint8)

    bmp = encode_bmp(img)
    assert bmp[:2] == b"BM"
    np.testing.assert_array_equal(_decode_bmp(bmp), img)  # kernel-level

    ppm = b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()
    media = spark.createDataFrame(
        [(0, bytearray(bmp), "image/bmp", len(bmp)), (1, bytearray(ppm), "image/x-ppm", len(ppm))],
        "media_id long, media binary, format string, n_bytes long",
    )
    out = {r["media_id"]: r for r in decode_image(media).collect()}
    for mid in (0, 1):
        r = out[mid]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        got = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(h, w, 3)
        np.testing.assert_array_equal(got, img)


def test_decode_image_png_roundtrip(spark):
    """PNG decode (stdlib zlib + NumPy unfiltering): every scanline
    filter (None/Sub/Up/Average/Paeth) and every supported color type
    (gray/RGB/RGBA) must round-trip bit-exactly through the
    mapInPandas decode kernel against the in-repo encoder twin."""
    import numpy as np

    from graph_mining_spark.functions.multimodal import _decode_png, encode_png

    h, w = 11, 14
    y, x = np.mgrid[0:h, 0:w]
    rgb = np.stack([(x * 23) % 256, (y * 31) % 256, (x * y) % 256], axis=-1).astype(np.uint8)
    gray = ((x * 7 + y * 13) % 256).astype(np.uint8)
    rgba = np.concatenate([rgb, ((x + 2 * y) % 256).astype(np.uint8)[..., None]], axis=-1)

    # kernel-level: each filter type on each color type
    for img in (gray, rgb, rgba):
        for f in range(5):
            np.testing.assert_array_equal(_decode_png(encode_png(img, filter_type=f)), img)
    # mixed per-row filters (the shape a real encoder emits)
    mixed = [fi % 5 for fi in range(h)]
    np.testing.assert_array_equal(_decode_png(encode_png(rgb, filter_type=mixed)), rgb)

    # through the Spark kernel, channels column carries the true count
    blobs = [(0, encode_png(rgb, filter_type=4), 3), (1, encode_png(rgba, filter_type=2), 4)]
    media = spark.createDataFrame(
        [(mid, bytearray(b), "image/png", len(b)) for mid, b, _ in blobs],
        "media_id long, media binary, format string, n_bytes long",
    )
    out = {r["media_id"]: r for r in decode_image(media).collect()}
    for mid, _, ch in blobs:
        r = out[mid]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        want = rgb if ch == 3 else rgba
        got = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(h, w, ch)
        np.testing.assert_array_equal(got, want)


def test_decode_image_error_channel(spark):
    """on_error='null' isolates bad blobs into an error column instead
    of failing the whole decode job; good rows still decode."""
    import numpy as np

    from graph_mining_spark.functions.multimodal import encode_png

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    good = encode_png(img)
    media = spark.createDataFrame(
        [
            (0, bytearray(good), "image/png", len(good)),
            (1, bytearray(b"RIFF....WEBP not-decodable-here"), "image/webp", 31),
            (2, bytearray(b"\xff\xd8\xff\xe0 truncated-jpeg"), "image/jpeg", 19),
        ],
        "media_id long, media binary, format string, n_bytes long",
    )
    out = {r["media_id"]: r for r in decode_image(media, on_error="null").collect()}
    assert out[0]["error"] is None and out[0]["channels"] == 3
    assert out[1]["pixels"] is None and "unsupported image magic" in out[1]["error"]
    assert out[2]["pixels"] is None and out[2]["error"]  # corrupt JPEG isolated too


def test_quality_scores(spark):
    from graph_mining_spark.functions.text import quality_scores

    docs = spark.createDataFrame(
        [
            (0, "The cat is on the mat."),
            (1, "1234 5678 !!!"),
            (2, "x"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    # doc 0: 22 chars, 1 punct ('.'), 0 digits, 1 upper ('T');
    # tokens = [the,cat,is,on,the,mat] -> stopwords {the,is,on,the} = 4/6
    r = out[0]
    assert r["punct_ratio"] == round(1 / 22, 6)
    assert r["digit_ratio"] == 0.0
    assert r["upper_ratio"] == round(1 / 22, 6)
    assert r["stopword_ratio"] == round(4 / 6, 6)
    assert r["mean_token_len"] == round((3 + 3 + 2 + 2 + 3 + 3) / 6, 6)
    # doc 1: digits and punctuation dominate -> low quality
    assert out[1]["quality_score"] < out[0]["quality_score"]
    assert out[1]["stopword_ratio"] == 0.0
    # doc 2: single token, no division blowups
    assert out[2]["punct_ratio"] == 0.0 and out[2]["mean_token_len"] == 1.0


def _clustered_vectors(n_clusters=8, per_cluster=12, dim=16, noise=0.06, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + noise * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_embedding_near_dup_exact_matches_numpy(spark):
    import numpy as np

    from graph_mining_spark.functions.dedup import embedding_near_dup_pairs

    rows = _clustered_vectors(n_clusters=4, per_cluster=6)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thr = 0.9
    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, thr).collect()
    }
    V = np.array([v for _, v in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    want = {
        (i, j): round(float(S[i, j]), 4)
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if round(float(S[i, j]), 4) >= thr
    }
    assert got == want and len(want) > 10


def test_embedding_near_dup_lsh_recall_and_precision(spark):
    from graph_mining_spark.functions.dedup import embedding_near_dup_pairs

    rows = _clustered_vectors()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thr = 0.9
    exact = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(emb, thr).collect()}
    assert len(exact) > 50
    approx_rows = embedding_near_dup_pairs(emb, thr, n_planes=6, n_tables=6).collect()
    approx = {(r["a"], r["b"]) for r in approx_rows}
    assert approx <= exact, "exact-cosine filter means precision 1.0"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f}"
    assert len(approx_rows) == len(approx), "pairs deduped across tables"


def test_sample_frames_y4m_roundtrip(spark):
    """Real in-sandbox video frame sampling: deterministic C420 and
    Cmono YUV4MPEG2 streams built by the encoder twin must yield every
    every_n-th frame bit-exactly (fixed-stride offset sampling, pure
    NumPy, no ffmpeg)."""
    import numpy as np

    from graph_mining_spark.functions.multimodal import encode_y4m, sample_frames

    h, w, t = 8, 12, 11
    c420 = []
    for i in range(t):
        y, x = np.mgrid[0:h, 0:w]
        yp = ((x * 3 + y * 5 + i * 17) % 256).astype(np.uint8)
        up = ((x[: h // 2, : w // 2] + i) % 256).astype(np.uint8)
        vp = ((y[: h // 2, : w // 2] * 2 + i) % 256).astype(np.uint8)
        c420.append((yp, up, vp))
    mono = np.stack([((np.arange(h * w) * (i + 1)) % 256).reshape(h, w) for i in range(t)]).astype(np.uint8)

    v420 = encode_y4m(c420, fps=(25, 1), colorspace="C420")
    vmono = encode_y4m(mono, colorspace="Cmono")
    media = spark.createDataFrame(
        [(0, bytearray(v420), "video/y4m", len(v420)), (1, bytearray(vmono), "video/y4m", len(vmono))],
        "media_id long, media binary, format string, n_bytes long",
    )
    out = sample_frames(media, every_n=4).collect()
    by_key = {(r["media_id"], r["frame_index"]): r for r in out}
    assert sorted(i for m, i in by_key if m == 0) == [0, 4, 8]
    assert sorted(i for m, i in by_key if m == 1) == [0, 4, 8]
    for i in (0, 4, 8):
        r = by_key[(0, i)]
        assert (r["width"], r["height"], r["colorspace"]) == (w, h, "C420")
        yp, up, vp = c420[i]
        assert bytes(r["pixels"]) == yp.tobytes() + up.tobytes() + vp.tobytes()
        rm = by_key[(1, i)]
        assert rm["colorspace"] == "Cmono"
        assert bytes(rm["pixels"]) == mono[i].tobytes()


def test_sample_frames_error_channel(spark):
    """Compressed containers refuse in-kernel; on_error='null' isolates
    them per-row instead of failing the job."""
    import numpy as np

    from graph_mining_spark.functions.multimodal import encode_y4m, sample_frames

    good = encode_y4m(np.zeros((2, 4, 4), dtype=np.uint8), colorspace="Cmono")
    media = spark.createDataFrame(
        [
            (0, bytearray(good), "video/y4m", len(good)),
            (1, bytearray(b"\x00\x00\x00\x1cftypisom fake-mp4"), "video/mp4", 20),
        ],
        "media_id long, media binary, format string, n_bytes long",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="unsupported video magic"):
        sample_frames(media).collect()
    out = {r["media_id"]: r for r in sample_frames(media, on_error="null").collect()}
    assert out[0]["error"] is None and out[0]["frame_index"] == 0
    assert out[1]["pixels"] is None and "unsupported video magic" in out[1]["error"]


def test_jpeg_codec_roundtrip():
    """Baseline JPEG codec (pure NumPy, functions/jpeg.py): the entropy
    layer is lossless, so decode_jpeg_coefficients must recover the
    encoder's quantized DCT blocks EXACTLY (independently recomputed
    here); pixel round-trips carry only the bounded float-DCT/quantize
    error."""
    import numpy as np

    from graph_mining_spark.functions.jpeg import (
        _DCT,
        _quality_scale,
        STD_QUANT_LUMA,
        decode_jpeg,
        decode_jpeg_coefficients,
        encode_jpeg,
    )

    h, w = 24, 33  # non-multiples of 8/16 exercise edge padding
    y, x = np.mgrid[0:h, 0:w]
    gray = ((x * 5 + y * 9) % 256).astype(np.uint8)

    # exact gate: independently recompute the quantized coefficients
    b = encode_jpeg(gray, quality=85)
    _hdr, coeffs = decode_jpeg_coefficients(b)
    q = _quality_scale(STD_QUANT_LUMA, 85).astype(np.float64).reshape(8, 8)
    pp = np.zeros((-(-h // 8) * 8, -(-w // 8) * 8))
    pp[:h, :w] = gray.astype(np.float64) - 128.0
    pp[h:, :w] = pp[h - 1 : h, :w]
    pp[:, w:] = pp[:, w - 1 : w]
    blocks = pp.reshape(-1, 8, pp.shape[1] // 8, 8).transpose(0, 2, 1, 3)
    want = np.round(np.einsum("ij,yxjk,kl->yxil", _DCT, blocks, _DCT.T) / q).astype(np.int32)
    np.testing.assert_array_equal(coeffs[1], want)

    # bounded pixel error, gray and RGB, 4:4:4 and 4:2:0 (q85 on the
    # wrapping sawtooth rings at the 255->0 edges, so the tight bound
    # uses q95; the q85 stream above exists to exercise longer
    # zero-runs in the exact coefficient gate)
    assert np.abs(decode_jpeg(encode_jpeg(gray, quality=95)).astype(int) - gray.astype(int)).max() <= 8
    rgb = np.stack([(x * 7) % 256, (y * 11) % 256, ((x + y) * 3) % 256], axis=-1).astype(np.uint8)
    out444 = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert out444.shape == (h, w, 3)
    assert np.abs(out444.astype(int) - rgb.astype(int)).max() <= 8
    out420 = decode_jpeg(encode_jpeg(rgb, quality=90, subsample=True))
    assert np.abs(out420.astype(int) - rgb.astype(int)).mean() <= 8.0
    # a DCT-smooth image at quality=100 is bit-exact
    smooth = np.stack([x * 2, y * 2, x + y], axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(decode_jpeg(encode_jpeg(smooth, quality=100)), smooth)


def test_jpeg_through_decode_image_kernel(spark):
    """JPEG blobs decode through the mapInPandas kernel like the other
    formats; progressive JPEG (SOF2) refuses with a clear error."""
    import numpy as np
    import pytest as _pytest

    from graph_mining_spark.functions.jpeg import encode_jpeg

    h, w = 16, 16
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([x * 8, y * 8, (x + y) * 4], axis=-1).astype(np.uint8)
    good = encode_jpeg(img, quality=100)
    # minimal progressive-looking stream: SOI + SOF2 marker
    prog = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00" + b"\xff\xd9"
    media = spark.createDataFrame(
        [(0, bytearray(good), "image/jpeg", len(good)), (1, bytearray(prog), "image/jpeg", len(prog))],
        "media_id long, media binary, format string, n_bytes long",
    )
    r = decode_image(media.filter("media_id = 0")).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
    got = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(h, w, 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2
    with _pytest.raises(Exception, match="SOF0"):
        decode_image(media.filter("media_id = 1")).collect()


def test_decode_audio_wav_roundtrip(spark):
    """WAV decode (pure-NumPy RIFF parser): integer PCM at 8/16/24/32
    bits and IEEE float32 must round-trip through the mapInPandas
    kernel against the in-repo encoder twin, normalized to [-1, 1]
    float32 within each depth's quantization tolerance."""
    import numpy as np

    from graph_mining_spark.functions.multimodal import (
        audio_features,
        decode_audio,
        encode_wav,
    )

    sr = 8000
    t = np.arange(sr // 4) / sr  # 0.25 s
    wave = 0.5 * np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([wave, -wave], axis=1)

    blobs = {
        0: (encode_wav((wave * 32767).astype(np.int16), sr), 1, 2 / 32768),
        1: (encode_wav(((wave + 1) * 127.5).astype(np.uint8), sr), 1, 2 / 128),
        2: (encode_wav((stereo * (2**31 - 1)).astype(np.int32), sr), 2, 1e-6),
        3: (encode_wav(stereo.astype(np.float32), sr), 2, 1e-7),
    }
    media = spark.createDataFrame(
        [(mid, bytearray(b), "audio/wav", len(b)) for mid, (b, _, _) in blobs.items()],
        "media_id long, media binary, format string, n_bytes long",
    )
    decoded = decode_audio(media)
    out = {r["media_id"]: r for r in decoded.collect()}
    for mid, (_, ch, tol) in blobs.items():
        r = out[mid]
        assert (r["sample_rate"], r["channels"], r["n_samples"]) == (sr, ch, len(wave))
        got = np.frombuffer(bytes(r["samples"]), "<f4").reshape(-1, ch)
        want = stereo if ch == 2 else wave[:, None]
        np.testing.assert_allclose(got, want, atol=tol + 1e-7)

    # 24-bit PCM has no encoder dtype; build the blob by hand
    import struct

    v = np.clip((wave * (2**23 - 1)).astype(np.int64), -(1 << 23), (1 << 23) - 1)
    raw = bytearray()
    for s in v:
        raw += struct.pack("<i", int(s))[:3]
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 3, 3, 24)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + bytes(raw)
    wav24 = b"RIFF" + struct.pack("<I", len(body)) + body
    from graph_mining_spark.functions.multimodal import _decode_wav

    x24, r24 = _decode_wav(wav24)
    assert r24 == sr
    np.testing.assert_allclose(x24[:, 0], wave, atol=2 / (1 << 23))

    # features: duration/RMS/peak/ZCR of the sine match closed forms
    feats = {r["media_id"]: r for r in audio_features(decoded).collect()}
    f = feats[0]
    assert abs(f["duration_s"] - 0.25) < 1e-9
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(f["peak"] - 0.5) < 1e-3
    # 440 Hz sine crosses zero ~880 times/s -> rate ~ 880/8000
    assert abs(f["zero_crossing_rate"] - 880 / sr) < 0.01
    # stereo clip averages to silence across channels -> rms ~ 0
    assert feats[3]["rms"] < 1e-6


def test_decode_audio_error_channel(spark):
    """on_error='null' isolates non-WAV blobs; audio_features passes
    the failed row through with null features."""
    import numpy as np

    from graph_mining_spark.functions.multimodal import (
        audio_features,
        decode_audio,
        encode_wav,
    )

    good = encode_wav(np.zeros(100, dtype=np.int16), 8000)
    media = spark.createDataFrame(
        [
            (0, bytearray(good), "audio/wav", len(good)),
            (1, bytearray(b"\xffMP3garbage"), "audio/mpeg", 11),
        ],
        "media_id long, media binary, format string, n_bytes long",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="unsupported audio magic"):
        decode_audio(media).collect()
    decoded = decode_audio(media, on_error="null")
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert rows[0]["error"] is None and rows[0]["n_samples"] == 100
    assert rows[1]["samples"] is None and "unsupported audio magic" in rows[1]["error"]
    feats = {r["media_id"]: r for r in audio_features(decoded).collect()}
    assert feats[0]["rms"] == 0.0 and feats[0]["duration_s"] == 100 / 8000
    assert feats[1]["rms"] is None


def test_sample_frames_param_headers_and_partial_failure(spark):
    """Spec-legal y4m with per-frame parameters (``FRAME Ip\\n``) must
    sample correctly (variable-length headers), and a blob that fails
    MID-stream must produce exactly ONE error row — no partial frame
    rows alongside it."""
    import numpy as np

    from graph_mining_spark.functions.multimodal import encode_y4m, sample_frames

    frames = np.stack(
        [np.full((4, 6), i * 10, dtype=np.uint8) for i in range(5)]
    )
    plain = encode_y4m(frames, colorspace="Cmono")
    # rewrite every frame header with an optional parameter token
    withparams = plain.replace(b"FRAME\n", b"FRAME Ip\n")
    # truncate mid-way through frame 3's pixels: frames 0-2 parse fine
    hdr_end = plain.index(b"\n") + 1
    cut = hdr_end + 3 * (6 + 4 * 6) + 6 + 5
    truncated = plain[:cut]
    media = spark.createDataFrame(
        [
            (0, bytearray(withparams), "video/y4m", len(withparams)),
            (1, bytearray(truncated), "video/y4m", len(truncated)),
        ],
        "media_id long, media binary, format string, n_bytes long",
    )
    out = sample_frames(media, every_n=2, on_error="null").collect()
    good = sorted(r["frame_index"] for r in out if r["media_id"] == 0)
    assert good == [0, 2, 4]
    for r in out:
        if r["media_id"] == 0 and r["frame_index"] == 4:
            assert bytes(r["pixels"]) == frames[4].tobytes()
    bad = [r for r in out if r["media_id"] == 1]
    assert len(bad) == 1 and bad[0]["pixels"] is None
    assert "truncated frame" in bad[0]["error"]


def test_decode_image_null_media_id_error_channel(spark):
    """A row with a NULL media_id must flow through on_error='null' as
    an error row (null id), not kill the task inside the except
    handler."""
    import numpy as np

    from graph_mining_spark.functions.multimodal import decode_image, encode_bmp

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_bmp(img)
    media = spark.createDataFrame(
        [
            (7, bytearray(good), "image/bmp", len(good)),
            (None, bytearray(b"\x00bad"), "image/???", 4),
        ],
        "media_id long, media binary, format string, n_bytes long",
    )
    out = decode_image(media, on_error="null").collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id[7]["error"] is None and by_id[7]["width"] == 2
    assert by_id[None]["pixels"] is None and "unsupported image magic" in by_id[None]["error"]


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes; the parser must skip them instead of misreading segment
    lengths."""
    import numpy as np

    from graph_mining_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = ((np.arange(16 * 16) * 7) % 256).reshape(16, 16).astype(np.uint8)
    blob = encode_jpeg(np.stack([img] * 3, axis=-1))
    # inject fill bytes immediately after SOI (before the next marker's 0xFF)
    padded = blob[:2] + b"\xff\xff\xff" + blob[2:]
    base = decode_jpeg(blob)
    got = decode_jpeg(padded)
    np.testing.assert_array_equal(got, base)


def test_audio_features_null_media_id_error_row(spark):
    """on_error='null' must survive a NULL media_id end-to-end: the
    decode emits the error row with a null id and audio_features passes
    it through with null features instead of crashing on int(NaN).
    Raise mode stays strict — a null id fails the job."""
    import pytest as _pytest

    from graph_mining_spark.functions.multimodal import audio_features, decode_audio

    media = spark.createDataFrame(
        [(None, bytearray(b"nope"), "audio/?", 4)],
        "media_id long, media binary, format string, n_bytes long",
    )
    decoded = decode_audio(media, on_error="null")
    rows = decoded.collect()
    assert rows[0]["media_id"] is None and rows[0]["samples"] is None
    feats = audio_features(decoded).collect()
    assert feats[0]["media_id"] is None and feats[0]["rms"] is None
    with _pytest.raises(Exception):
        decode_audio(media).collect()


def test_cosine_topk_zero_vector_guard(spark):
    """An all-zeros embedding must NOT rank #1 for every query (0/0 =
    NaN sorts above every real under desc order); it scores 0.0 and
    lands below every positive-cosine neighbor, in all three
    searchers."""
    df, vecs = _embeddings(spark, n=20)
    zero = spark.createDataFrame([(99, [0.0] * 8)], "vec_id long, embedding array<float>")
    both = df.unionByName(zero)
    queries = df.filter("vec_id < 4")
    v = vecs.astype(np.float64)
    sims = v @ v.T / (
        np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
    )
    got = cosine_topk(both, queries, k=3, round_to=None).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    for q in range(4):
        want = sorted((i for i in range(20) if i != q), key=lambda i: (-sims[q, i], i))[:3]
        assert [n for _, n, _ in sorted(by_q[q])] == want, f"query {q}"
    # zero-norm QUERY: all candidate cosines are exactly 0.0, no NaN
    zq = cosine_topk(both, zero, k=3, round_to=None).collect()
    assert len(zq) == 3 and all(r["cosine"] == 0.0 for r in zq)
    # IVF path survives the zero vector too (unit-normalization guard)
    ivf = ivf_cosine_topk(both, queries, k=3, n_lists=4, n_probe=4, kmeans_iters=2).collect()
    assert all(r["neighbor_id"] != 99 or r["cosine"] == 0.0 for r in ivf)
