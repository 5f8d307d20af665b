"""Text-analysis operators for training-data pipelines.

All hot paths are JVM-side Catalyst expressions (split / filter /
regexp_extract_all / md5) — no Python per row. Designed for the
``documents`` table but generic over any string column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whitespace words; BPE-ish token classes: letter runs, digit runs, other
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny high-frequency English function-word list for the lang-id heuristic
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count_regex(col: str | Column, pattern: str = TOKEN_PATTERN) -> Column:
    """Sub-word-ish token count: letter runs, digit runs, punctuation —
    the cheap stand-in for a BPE tokenizer's pre-tokenization pass."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def stopword_count(col: str | Column, stopwords=EN_STOPWORDS) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(F.split(c, " "), lambda t: F.array_contains(arr, t)))


def lang_id(col: str | Column, threshold: float = 0.04) -> Column:
    """Heuristic language ID: English function-word density. Returns 'en'
    when stopword ratio exceeds ``threshold``, else 'other'. (A real
    n-gram model plugs in the same shape: deterministic score → label.)"""
    c = F.col(col) if isinstance(col, str) else col
    n = F.size(F.split(c, " "))
    ratio = stopword_count(c).cast("double") / n
    return F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("other"))


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: token counts, type-token ratio,
    mean token length — the filters a pretraining pipeline thresholds on."""
    toks = tokens(text_col)
    return df.select(
        "*",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
        (
            F.aggregate(
                F.transform(toks, lambda t: F.length(t)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size(toks)
        ).alias("mean_token_len"),
    )


def doc_fingerprint(col_name: str, shingle_len: int = 8) -> Column:
    """Winnowing-style document fingerprint: the minimum md5 of all
    ``shingle_len``-char shingles. Equal fingerprints ⇒ near-identical
    content — a cheap first-pass dup bucket at scale. Takes a column NAME
    (positional substring needs SQL expr composition)."""
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({col_name}) - {shingle_len - 1}, 1)),"
        f" i -> md5(substring({col_name}, i, {shingle_len}))))"
    )
