"""Ranked-retrieval machinery: corpus statistics + BM25 scoring.

The statistics BM25 needs — per-term document frequency, document
count, total token count — are all ADDITIVE over disjoint document
sets (each doc contributes its distinct terms once, its tokens once,
itself once). That linearity is what makes an inverted-index stats
table maintainable incrementally: per-epoch partials summed at read
are BIT-identical to a one-shot build, the same law the KMV /
count-min / quantile / LM / DSIR sinks run on
(streaming/sketches.py). `streaming/retrieval.py` is that sink;
this module holds the batch builders and the scoring expression both
paths share.

Scoring uses the log-free Robertson idf variant
idf = (N - df + 0.5) / (df + 0.5) — every arithmetic op is IEEE
+,-,*,/ on exact integer inputs, bit-identical across engines (libm's
log is not correctly rounded; same engine-exactness discipline as
tfidf/DSIR/LM in this repo). k1 = 1.2, b = 0.75.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATS_SCHEMA = StructType(
    [
        StructField("term", StringType(), True),
        StructField("df", LongType(), True),
        StructField("n_docs", LongType(), True),
        StructField("total_tok", LongType(), True),
    ]
)


def corpus_term_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The BM25 statistics table for a document set: one row per
    distinct term carrying its document frequency (``df``; ``n_docs``
    and ``total_tok`` zero), plus ONE corpus row (``term`` NULL) with
    the document count and total token count. All three measures are
    additive over disjoint doc sets, so partial tables from a split
    corpus sum (groupBy term) to the full corpus's table exactly.

    Scale: df explodes the per-doc DISTINCT term set (array_distinct
    runs inside the scan task — the (doc, term)-dedup costs no shuffle)
    into one vocabulary-bounded map-side-combined count; the corpus row
    is a 1-row aggregate over per-row token counts (size(split), no
    explode, no per-doc shuffle). One corpus scan per branch, one
    vocabulary-sized exchange + one 1-row exchange total (the r13
    rework of the explode → distinct → groupBy form, which paid a full
    token-stream shuffle for the distinct; guide §2.3/§2.4). Assumes
    ``id_col`` values are unique per row (the table's PK), as every
    caller's schema guarantees. This is the stats half of an
    inverted-index build (the postings half is the corpus itself,
    re-sharded by term, which BM25 serving reads term-filtered — see
    queries/text.py bm25_topk_docs)."""
    w = F.split(F.coalesce(text_col, F.lit("")), " ")
    per_term = (
        docs.select(F.explode(F.array_distinct(w)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "term",
            "df",
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("total_tok"),
        )
    )
    corpus = (
        docs.select(F.size(w).cast("long").alias("_dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("_dl"), F.lit(0)).alias("total_tok"),
        )
        .select(
            F.lit(None).cast("string").alias("term"),
            F.lit(0).cast("long").alias("df"),
            "n_docs",
            "total_tok",
        )
    )
    return per_term.unionByName(corpus)


def merge_term_stats(partials: DataFrame) -> DataFrame:
    """Sum stats partials down to one table (NULL term = corpus row
    groups with itself). Merged(split corpus) ≡ one-shot by count
    additivity."""
    return partials.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tok").alias("total_tok"),
    )


def _tf_count(words, term: str):
    """Occurrences of ``term`` in the ``words`` array as a long Column —
    the per-row replacement for explode + conditional count. A proper
    closure (not a default-arg lambda: PySpark treats a two-parameter
    lambda as the (element, index) form)."""
    return F.size(F.filter(words, lambda x: x == F.lit(term))).cast("long")


def bm25_term_score(tf, df, n_docs, ndl):
    """One query term's BM25 partial as a Column expression — written
    once so the batch query, the stats-table scorer, and their oracles
    stay arithmetically identical (fixed operation order; see module
    docstring for the log-free idf)."""
    idf = (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5))
    return idf * tf * F.lit(2.2) / (
        tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * ndl)
    )


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """One-shot BM25 top-k: tokenize ``docs`` once and compute tf, dl,
    N/avgdl and the per-term dfs from that single token stream (the
    batch build — `bm25_topk_from_stats` is the serving split that
    reads df/N/avgdl from a maintained table instead). Returns
    (doc_id, tf1..tfn, score), top-k by (score desc, doc_id).

    Scale (r13 array form, guide §2.3-2.4): tf per (doc, term-slot) and
    dl are PER-ROW array expressions (size/filter over one split of the
    text — tf_i = occurrences of term i, dl = token count), so the
    explode, the two per-doc-keyed shuffles (tf groupBy + dl groupBy)
    and the doc_id join of the posting form all disappear. What remains
    is one corpus scan feeding a 1-row broadcast aggregate (N, total
    tokens, per-term dfs — all map-side combined) plus one corpus scan
    for the scored candidates (pre-filtered to docs containing a query
    term); top-k is TakeOrdered — no global sort, zero corpus-sized
    exchanges. The arithmetic (same bm25_term_score expression over
    identical tf/df/N/ndl integers) is bit-identical to the posting
    form; assumes ``id_col`` is the table's unique non-null PK, as
    every caller's schema guarantees."""
    w = F.split(F.coalesce(text_col, F.lit("")), " ")
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        *[
            _tf_count(w, t).alias(f"tf{i + 1}") for i, t in enumerate(terms)
        ],
        F.size(w).cast("long").alias("dl"),
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tok"),
        *[
            F.count(F.when(F.col(f"tf{i + 1}") > 0, 1)).alias(f"df{i + 1}")
            for i in range(len(terms))
        ],
    )
    any_tf = None
    for i in range(len(terms)):
        c = F.col(f"tf{i + 1}") > 0
        any_tf = c if any_tf is None else (any_tf | c)
    base = (
        # isNotNull mirrors the posting form's inner join on doc_id,
        # which silently dropped null-id docs from the candidate set
        per_doc.filter(F.col("doc_id").isNotNull())
        .filter(any_tf)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "ndl",
            F.col("dl").cast("double")
            / (F.col("total_tok").cast("double") / F.col("n_docs")),
        )
    )
    score = None
    for i in range(1, len(terms) + 1):
        s = bm25_term_score(
            F.col(f"tf{i}"), F.col(f"df{i}"), F.col("n_docs"), F.col("ndl")
        )
        score = s if score is None else score + s
    return (
        base.select(
            "doc_id",
            *[f"tf{i + 1}" for i in range(len(terms))],
            score.alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


def bm25_topk_from_stats(
    docs: DataFrame,
    stats: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """BM25 top-k of ``docs`` for ``terms``, with df/N/avgdl taken from
    a prebuilt ``stats`` table (one-shot or stream-merged — identical
    either way) instead of recomputed from the scan. This is the
    serving split: statistics live in the maintained index, per-query
    work is the term-filtered posting trickle plus the candidate docs'
    lengths.

    Exactly matches queries/text.py bm25_topk_docs when ``stats`` =
    ``corpus_term_stats(docs)`` — same tf/dl computation, same
    broadcast 1-row stats, same fixed-order scoring expression. Like
    ``bm25_topk``, tf/dl are per-row array expressions (r13): the
    per-query cost is one candidate scan plus the stats table's two
    1-row pivots — zero corpus-sized exchanges."""
    w = F.split(F.coalesce(text_col, F.lit("")), " ")
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        *[
            _tf_count(w, t).alias(f"tf{i + 1}") for i, t in enumerate(terms)
        ],
        F.size(w).cast("long").alias("dl"),
    )
    any_tf = None
    for i in range(len(terms)):
        c = F.col(f"tf{i + 1}") > 0
        any_tf = c if any_tf is None else (any_tf | c)
    # 1-row pivots of the stats table: per-term dfs (0 for a term the
    # corpus never saw) and the corpus row's N / total tokens
    dfs = stats.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("df"))), F.lit(0)
            ).alias(f"df{i + 1}")
            for i, t in enumerate(terms)
        ]
    )
    corp = stats.filter(F.col("term").isNull()).select("n_docs", "total_tok")
    base = (
        per_doc.filter(F.col("doc_id").isNotNull())
        .filter(any_tf)
        .crossJoin(F.broadcast(corp))
        .crossJoin(F.broadcast(dfs))
        .withColumn(
            "ndl",
            F.col("dl").cast("double")
            / (F.col("total_tok").cast("double") / F.col("n_docs")),
        )
    )
    score = None
    for i in range(1, len(terms) + 1):
        s = bm25_term_score(
            F.col(f"tf{i}"), F.col(f"df{i}"), F.col("n_docs"), F.col("ndl")
        )
        score = s if score is None else score + s
    return (
        base.select(
            "doc_id",
            *[f"tf{i + 1}" for i in range(len(terms))],
            score.alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
