"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash + LSH banding, SimHash, and word-n-gram
Jaccard — all as declarative DataFrame plans.  Hash functions are
derived from md5 hex (available identically in Spark and DuckDB) so the
DuckDB oracle can reproduce results bit-for-bit; at production scale
xxhash64 would be the cheaper choice (one-line swap).

Scale notes:
  - exact dedup is one groupBy (map-side combined);
  - minhash explodes docs into shingles — the shuffle is bounded by
    Σ doc_len, and the per-(doc, seed) min is associative;
  - LSH banding turns all-pairs O(n²) into per-bucket joins; bucket
    skew (a boilerplate band shared by many docs) is the same hub
    problem as the link graph and is handled by AQE skew-join plus the
    ``max_bucket`` guard that drops degenerate buckets;
  - n-gram Jaccard joins on shingle — the classic inverted-index join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, content_key, keep): keep marks the min-id representative of
    each identical-content group."""
    key = F.md5(F.col(text_col))
    w = Window.partitionBy("content_key")
    return (
        docs.select(F.col(id_col), key.alias("content_key"))
        .withColumn("keep", F.col(id_col) == F.min(id_col).over(w))
    )


def _char_shingles(text_col, k: int):
    """All k-char shingles as an array (empty-safe)."""
    n = F.length(text_col) - (k - 1)
    arr = F.transform(F.sequence(F.lit(1), n), lambda i: text_col.substr(i, F.lit(k)))
    return F.when(n >= 1, arr).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, seed, minhash): per-seed min over md5-derived 60-bit shingle
    hashes — H(seed, s) = int(md5(seed || ':' || s)[:15], 16).

    Shape note (measured, sf0.1): the exploded (id, seed, shingle) form
    looks like it shuffles |shingles|·k rows, but the min-agg's map-side
    partial aggregation collapses map output to ~|docs|·k rows per
    partition BEFORE the wire, so the shuffle is small either way.
    Folding the k mins into one k-wide md5 projection instead measured
    4x SLOWER (9.2s vs 2.2s) — the 8-wide md5/conv expression tree falls
    out of whole-stage codegen — so the exploded form stays.

    Input-skew guard (guide §2.5): a small docs table read from one
    parquet file is a single scan task, which serializes the md5-heavy
    shingle explode on one core (measured 1.75 s single-task at sf0.1).
    When the scan has fewer partitions than the session's parallelism,
    spread the rows first — the shuffle moves only the raw docs (tiny
    relative to the exploded shingles), and a 100 TB table already
    scans with thousands of tasks so the guard never fires there.
    Results are exact either way: the per-(doc, seed) min is
    order-independent over exact integers."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    sh = docs.select(
        F.col(id_col), F.explode(F.array_distinct(_char_shingles(F.col(text_col), shingle_k))).alias("sh")
    )
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    hashed = sh.select(
        id_col,
        F.explode(seeds).alias("seed"),
        "sh",
    ).select(
        id_col,
        "seed",
        F.conv(F.substring(F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("sh"))), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    return hashed.groupBy(id_col, "seed").agg(F.min("h").alias("minhash"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
    max_bucket: int = 1000,
) -> DataFrame:
    """LSH banding: docs sharing any band (of ``num_hashes/bands``
    consecutive seeds) become a candidate pair (doc_a < doc_b).

    Buckets larger than ``max_bucket`` are dropped (degenerate bands —
    e.g. all-identical boilerplate — would otherwise produce O(g²)
    pairs; at 100 TB that guard is what keeps the stage bounded)."""
    rows_per_band = num_hashes // bands
    banded = signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    keys = banded.groupBy(id_col, "band").agg(
        F.md5(F.array_join(F.transform(F.array_sort(F.collect_list(F.struct("seed", "minhash"))), lambda s: s["minhash"].cast("string")), ",")).alias("band_key")
    )
    sizes = keys.groupBy("band", "band_key").agg(F.count("*").alias("_n"))
    keys_ok = keys.join(sizes.filter(F.col("_n") <= max_bucket), ["band", "band_key"])
    a = keys_ok.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b = keys_ok.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _word_ngrams(text_col, n: int):
    toks = F.split(F.trim(text_col), r"\s+")
    cnt = F.size(toks) - (n - 1)
    arr = F.transform(F.sequence(F.lit(1), cnt), lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(cnt >= 1, arr).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard ≥ threshold.

    Inverted-index join on distinct shingles; ``block_col`` (e.g. lang)
    restricts pairs to the same block.  Output (doc_a, doc_b, jaccard).
    """
    cols = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])
    sh = docs.select(*cols, F.explode(F.array_distinct(_word_ngrams(F.col(text_col), n))).alias("sh")).filter(
        F.col("sh") != ""
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("_sz"))
    join_keys = ["sh"] + ([block_col] if block_col else [])
    a = sh.select(*[F.col(c) for c in join_keys], F.col(id_col).alias("doc_a"))
    b = sh.select(*[F.col(c) for c in join_keys], F.col(id_col).alias("doc_b"))
    inter = (
        a.join(b, join_keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("_sz").alias("_sa"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("_sz").alias("_sb"))
    jac = F.col("_inter") / (F.col("_sa") + F.col("_sb") - F.col("_inter"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    docs: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash over whitespace tokens: bit b set iff
    Σ_tokens (±1 by bit b of md5-hash(token)) > 0.  Returns (id, simhash)."""
    toks = docs.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("tok")
    ).filter(F.col("tok") != "")
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    toks = toks.select(id_col, h.alias("h"))
    aggs = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"_b{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(F.col(f"_b{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return sums.select(F.col(id_col), sim.alias("simhash"))


def hamming_near_pairs(
    simhashes: DataFrame, max_distance: int = 3, id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_distance``,
    with EXACT recall via pigeonhole bit-block tables (Manku–Jain–
    Sarma'07): the hash splits into ``max_distance + 1`` blocks, so any
    pair within the distance budget differs in ≤ max_distance bits and
    must agree EXACTLY on at least one block — every qualifying pair is
    found by the per-block equality joins, none by luck.  (Replaces the
    single 16-bit-prefix blocking, which missed near-dups differing in
    the top bits.)"""
    n_blocks = max_distance + 1
    width = bits // n_blocks
    block_keys = []
    for i in range(n_blocks):
        lo = i * width
        w = bits - lo if i == n_blocks - 1 else width
        key = F.shiftright(F.col("simhash"), lo).bitwiseAND(F.lit((1 << w) - 1))
        block_keys.append(F.struct(F.lit(i).alias("i"), key.alias("k")))
    blocked = simhashes.select(
        F.col(id_col), "simhash", F.explode(F.array(*block_keys)).alias("_blk")
    )
    a = blocked.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("_ha"), "_blk")
    b = blocked.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("_hb"), "_blk")
    return (
        a.join(b, "_blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"))
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 4,
    round_to: int | None = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the third near-dup
    family next to MinHash-LSH (token Jaccard) and SimHash (Hamming):
    semantic duplicates via dense-embedding cosine ≥ ``threshold``.
    Output (a, b, cosine) with a < b.

    ``n_planes=None`` — EXACT all-pairs (cross join): quadratic, the
    oracle baseline and the right tool inside small blocks.

    ``n_planes=k`` — the 100 TB path: hyperplane-LSH bucketing over
    ``n_tables`` independent tables (Indyk–Motwani OR-construction,
    same ``_hyperplane_bits`` signatures as :mod:`functions.ann`);
    candidates are in-bucket pairs only, scored with the exact cosine
    (precision 1.0 — only recall is approximate; the recall gate on a
    clustered fixture is tests/test_functions.py).  Pairs colliding in
    several tables dedupe on three scalars after scoring, so the
    distinct shuffle never carries dim-sized vectors.

    NOTE: ``threshold`` applies to the ROUNDED cosine when ``round_to``
    is set (the default): a pair whose true cosine sits within
    5·10^-(round_to+1) below the threshold is admitted (e.g. 0.39996
    rounds to 0.4000 ≥ 0.4).  This keeps the emitted ``cosine`` column
    and the admission decision consistent with each other and with the
    SQL oracle; pass ``round_to=None`` to filter on the exact value.
    """
    from graph_mining_spark.functions.ann import _dot, _hyperplane_tables, _norm

    base = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    if n_planes is None:
        a = base.select(F.col("_id").alias("a"), F.col("_v").alias("_va"))
        b = base.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"))
        pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    else:
        tables = _hyperplane_tables(n_planes, n_tables)
        tabbed = base.select("_id", "_v", F.explode(tables).alias("_tb")).select(
            "_id", "_v", F.col("_tb.t").alias("t"), F.col("_tb.b").alias("bkt")
        )
        a = tabbed.select("t", "bkt", F.col("_id").alias("a"), F.col("_v").alias("_va"))
        b = tabbed.select("t", "bkt", F.col("_id").alias("b"), F.col("_v").alias("_vb"))
        pairs = a.join(b, ["t", "bkt"]).filter(F.col("a") < F.col("b"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    out = pairs.select("a", "b", cos.alias("cosine"))
    if round_to is not None:
        out = out.withColumn("cosine", F.round("cosine", round_to))
    # NaN guard: a zero-norm embedding (padding / failed encode) gives
    # cosine NaN, and Spark sorts NaN ABOVE every number — without the
    # isnan filter it would pair with everything
    out = out.filter((~F.isnan("cosine")) & (F.col("cosine") >= threshold))
    if n_planes is not None:
        out = out.distinct()  # same pair from several tables
    return out
