"""Text analysis for training-data pipelines — all JVM-side expressions
(no Python UDFs): quality stats, language-ID heuristic, token counting,
document fingerprinting.

Every function has an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql``
so the DuckDB differential harness can gate it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker tokens for the n-gram language heuristic, checked in this
# fixed order (first max wins)
LANG_MARKERS = [
    ("en", " the "),
    ("de", " der "),
    ("fr", " le "),
    ("es", " el "),
    ("zh", "的"),
]


def _occurrences(text, marker: str):
    return (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))) / len(marker)


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token count, whitespace /
    digit counts, mean token length."""
    t = F.col(text_col)
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    n_spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    n_digits = F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_spaces.cast("long").alias("n_spaces"),
        n_digits.cast("long").alias("n_digits"),
        F.round((F.length(F.replace(t, F.lit(" "), F.lit(""))) / n_tokens), 6).alias("avg_token_len"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish regex token count
    (letter runs / digit runs / single punctuation)."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    return docs.select(F.col(id_col), ws.alias("n_ws_tokens"), bpe.alias("n_bpe_tokens"))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-token language heuristic; deterministic first-max-wins
    over LANG_MARKERS, 'und' when no marker occurs."""
    t = F.col(text_col)
    scores = {lang: _occurrences(t, m) for lang, m in LANG_MARKERS}
    best = F.greatest(*scores.values())
    guess = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):
        guess = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(guess)
    out = docs.select(F.col(id_col), guess.alias("lang_guess"), *[
        scores[lang].cast("long").alias(f"score_{lang}") for lang, _ in LANG_MARKERS
    ])
    return out


def text_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", prefix: int = 64) -> DataFrame:
    """Prefix fingerprint for cheap near-dup bucketing: md5 of the first
    ``prefix`` chars + a coarse length bucket."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.md5(F.substring(t, 1, prefix)).alias("fingerprint"),
        F.floor(F.length(t) / 64).cast("long").alias("len_bucket"),
    )


# stopword list for the quality heuristic, fixed and mirrored verbatim
# in the DuckDB oracle SQL
QUALITY_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
    "from", "but", "not", "have",
)


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style document quality ratios + a combined score — all
    JVM expressions (zero Python).

    Columns: punct_ratio / digit_ratio / upper_ratio (per character,
    ASCII classes), stopword_ratio and mean_token_len over lowercase
    alphanumeric tokens, and ``quality_score`` — a fixed deterministic
    blend rewarding stopword presence (natural prose) and penalizing
    punctuation/digit noise.  Thresholding these columns is the
    caller's policy (C4/Gopher-type filters differ); the engine
    supplies the measurements.

    Higher-order functions are built with F.expr and UNIQUE lambda
    variable names — composing same-shaped python-lambda HOFs in one
    select cross-wires their variables in pyspark 4.1 (see
    functions/ann.py).
    """
    t_sql = text_col
    toks = f"filter(split(lower(trim({t_sql})), '[^a-z0-9]+'), _qt -> _qt <> '')"
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS) + ")"
    n_tok = F.expr(f"size({toks})")
    n_stop = F.expr(f"size(filter({toks}, _qs -> array_contains({stop_arr}, _qs)))")
    tok_chars = F.expr(f"aggregate({toks}, 0L, (_qa, _qx) -> _qa + length(_qx))")
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, "[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, "[A-Z]", ""))
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_tok = F.greatest(n_tok, F.lit(1))
    punct_ratio = n_punct / safe_chars
    digit_ratio = n_digit / safe_chars
    stop_ratio = n_stop / safe_tok
    score = (
        F.least(stop_ratio * 2, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + (F.lit(1.0) - F.least(digit_ratio * 4, F.lit(1.0))) * 0.3
    )
    return docs.select(
        F.col(id_col),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(n_upper / safe_chars, 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(tok_chars / safe_tok, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality_score"),
    )
