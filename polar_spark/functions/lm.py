"""Bigram language-model quality scoring (CCNet-style perplexity filter).

The canonical LM-based corpus filter (Wenzek et al. 2020,
arXiv:1911.00359 — CCNet; also used by LLaMA / RedPajama pipelines)
scores each document by the perplexity of an n-gram model trained on a
reference corpus and keeps the low-perplexity head. Here: a bigram
model with stupid backoff (Brants et al. 2007, "Large Language Models
in Machine Translation") trained on a deterministic split of the corpus
itself, scoring the held-out split — the exact shape of "train a small
LM once, score 100 TB with it".

Numeric discipline (the driver's oracle gate compares floats
bit-exactly): every ``ln`` takes an INTEGER argument (counts, or
integer backoff expressions — the classic 0.4 backoff weight is
replaced by 1/2 folded into ``ln(2·(N+V))`` so no transcendental of a
float constant appears), each per-token nll is rounded to 9 dp and cast
to ``decimal(28,9)`` BEFORE aggregation, and the per-document sum runs
in exact decimal arithmetic — so partial-aggregation order can never
drift the result, and the only cross-engine risk is a libm-vs-Math.log
last-ulp landing within 1e-15 of a rounding boundary (checked by the
oracle gate on the exact driver data).

Scale shape: train counts are one explode + one (w1,w2) groupBy with
map-side combine — vocabulary²-bounded output, built once and
persistable as a table. Scoring is one explode + three keyed hash
joins (bigram table deliberately NOT broadcast — at web scale the
bigram vocabulary is large; prefix/unigram tables join on their own
keys) + one doc-keyed aggregation. Nothing is driver-materialized; the
scalar (N, V) totals enter as a lazy 1-row broadcast cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# backoff probability for an unseen bigram: (cw + 1) / (2 * (N + V)) —
# add-one smoothed unigram, backoff weight 1/2 folded into the integer
# denominator so nll = ln(2*(N+V)) - ln(cw+1) takes only integer args
NLL_SCALE = "decimal(28,9)"


def bigram_pairs(df: DataFrame, text_col: str = "text", extra: list[str] | None = None) -> DataFrame:
    """Explode ``text_col`` (space-tokenized) into adjacent-pair rows
    (w1, w2), keeping ``extra`` columns. One row per bigram occurrence;
    documents with <2 tokens contribute nothing."""
    w = F.split(F.coalesce(text_col, F.lit("")), " ")
    pairs = F.arrays_zip(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))).alias("w1"),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))).alias("w2"),
    )
    cols = list(extra or [])
    return (
        df.select(*cols, F.explode(pairs).alias("p"))
        .select(*cols, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_counts(train: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram occurrence counts (w1, w2, c2) over the train corpus —
    the whole LM state; persist this as a table to score any corpus."""
    return (
        bigram_pairs(train, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )


def score_bigram_nll(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document summed negative log-likelihood under the bigram LM.

    Output: (id_col, n_scored, sum_nll decimal(38,9), nll_bucket int)
    where nll_bucket = floor(sum_nll / n_scored) — an integer perplexity
    band usable directly as a keep/drop threshold.

    An EMPTY ``lm`` (e.g. a cold streaming store) yields NULL sum_nll /
    nll_bucket — "no model, no score", deliberately distinguishable
    from any real score rather than a fabricated maximum.
    """
    # attach the prefix total c1 to the (vocabulary²-bounded) LM table
    # BEFORE the corpus-side join: the scored corpus then shuffles only
    # 3× — the seen-bigram join on (w1,w2), the backoff join on w2, and
    # the final per-document aggregation — instead of a 4th corpus-wide
    # exchange for a separate c1 join on w1
    c1 = lm.groupBy("w1").agg(F.sum("c2").alias("c1"))
    lm2 = lm.join(c1, "w1")
    cw = lm.groupBy("w2").agg(F.sum("c2").alias("cw"))
    tot = lm.agg(
        F.sum("c2").alias("n_big"), F.countDistinct("w2").alias("v_big")
    )
    eb = bigram_pairs(docs, text_col, extra=[id_col])
    seen = F.round(F.log(F.col("c1")) - F.log(F.col("c2")), 9)
    backoff = F.round(
        F.log(2 * (F.col("n_big") + F.col("v_big")))
        - F.log(F.coalesce(F.col("cw"), F.lit(0)) + 1),
        9,
    )
    nll = (
        F.when(F.col("c2").isNotNull(), seen).otherwise(backoff).cast(NLL_SCALE)
    )
    scored = (
        eb.join(lm2, ["w1", "w2"], "left")
        .join(cw, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(id_col, nll.alias("nll"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("nll").alias("sum_nll"),
        F.floor(
            F.sum("nll").cast("double") / F.count(F.lit(1))
        ).cast("int").alias("nll_bucket"),
    )
