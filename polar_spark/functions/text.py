"""Text-analysis operators for training-data pipelines.

All hot paths are JVM-side Catalyst expressions (split / filter /
regexp_extract_all / md5) — no Python per row. Designed for the
``documents`` table but generic over any string column.
"""

from __future__ import annotations

import pandas as pd
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


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_words: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking — the standard training-data /
    RAG preprocessing op: windows of ``chunk_words`` words advancing by
    ``chunk_words − overlap``, last window clamped to the doc end.

    Pure codegen (split + sequence + explode + slice): one input row
    fans out to its chunks inside the task, no shuffle, no Python — at
    100 TB chunking is a free map stage. Chunk count for n words is
    1 for n ≤ W, else ⌈(n − W)/step⌉ + 1 (integer form below avoids
    float division and negative-div engine differences)."""
    if overlap >= chunk_words:
        raise ValueError("overlap must be smaller than chunk_words")
    step = chunk_words - overlap
    out = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("_w"),
        )
        .select(
            "doc_id",
            "_w",
            F.expr(
                f"explode(sequence(cast(0 as bigint), case when size(_w) <= {chunk_words}"
                f" then cast(0 as bigint)"
                f" else cast((size(_w) - {chunk_words} - 1) div {step} + 1 as bigint) end))"
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(
                f"concat_ws(' ', slice(_w, chunk_idx * {step} + 1, {chunk_words}))"
            ).alias("chunk_text"),
            F.expr(
                f"size(slice(_w, chunk_idx * {step} + 1, {chunk_words}))"
            ).alias("n_words"),
        )
    )
    return out


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc 3-gram repetition metrics (the Gopher-style repeated-
    n-gram quality filter): total vs distinct 3-grams, duplicated-gram
    ratio, and the share of the most frequent gram.

    Repetition is a strictly per-document metric, so the whole
    computation is ONE shuffle-free ``mapInPandas`` pass — each task
    counts its own docs' grams in a linear scan (no explode→groupBy; at
    100 TB nothing crosses tasks). The two ratios are single IEEE
    divisions of exact int64 counts, bit-identical to the DuckDB oracle.
    Short docs (< 3 words) count their whole text as one gram, matching
    the non-strict shingle convention (functions/dedup.py)."""
    from collections import Counter

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("n_grams", T.LongType()),
            T.StructField("n_distinct", T.LongType()),
            T.StructField("dup_ratio", T.DoubleType()),
            T.StructField("top_share", T.DoubleType()),
        ]
    )

    def stats(batches):
        for pdf in batches:
            ids, totals, dists, dups, tops = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                words = text.split(" ")
                n = len(words)
                if n >= 3:
                    grams = [" ".join(words[j : j + 3]) for j in range(n - 2)]
                else:
                    grams = [" ".join(words)]
                c = Counter(grams)
                total, distinct = len(grams), len(c)
                ids.append(doc_id)
                totals.append(total)
                dists.append(distinct)
                dups.append(1.0 - distinct / total)
                tops.append(max(c.values()) / total)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_grams": pd.Series(totals, dtype="int64"),
                    "n_distinct": pd.Series(dists, dtype="int64"),
                    "dup_ratio": pd.Series(dups, dtype="float64"),
                    "top_share": pd.Series(tops, dtype="float64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(stats, schema=schema)


def word_diversity(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc repetitiveness: total/distinct words and the Simpson
    diversity index 1 − Σcnt²/total² (a boilerplate/spam signal that,
    unlike entropy, needs no log — both Σ are exact int64 reductions and
    the single division is correctly-rounded IEEE, so the score is
    bit-identical in any engine)."""
    wc = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("total_words"),
        F.count(F.lit(1)).alias("distinct_words"),
        (
            F.lit(1.0)
            - F.sum(F.col("cnt") * F.col("cnt")).cast("double")
            / (F.sum("cnt") * F.sum("cnt")).cast("double")
        ).alias("simpson"),
    )
