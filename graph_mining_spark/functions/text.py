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
