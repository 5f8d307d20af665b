"""Bigram language-model quality scoring (CCNet-style perplexity filter).

The canonical LM-based corpus filter (Wenzek et al. 2020,
arXiv:1911.00359 — CCNet; also used by LLaMA / RedPajama pipelines)
scores each document by the perplexity of an n-gram model trained on a
reference corpus and keeps the low-perplexity head. Here: a bigram
model with stupid backoff (Brants et al. 2007, "Large Language Models
in Machine Translation") trained on a deterministic split of the corpus
itself, scoring the held-out split — the exact shape of "train a small
LM once, score 100 TB with it".

Numeric discipline (the driver's oracle gate compares values
bit-exactly): round 7 proved that even integer-argument ``F.log`` is
not engine-exact (JVM ``Math.log`` vs libm ``ln`` last-ulp at a 9-dp
rounding boundary — VERDICT r7). Round 8 removes the transcendental
entirely: every ``ln`` of an integer count is computed by the portable
fixed-IEEE-op expression in ``functions/ln_portable.py`` and quantized
ONCE to integer nano-nats (``ln_nano``). All downstream per-token and
per-document arithmetic is exact bigint, so no engine, no libm, and no
aggregation order can drift the result.

Scale shape: train counts are one explode + one (w1,w2) groupBy with
map-side combine — vocabulary²-bounded output, built once and
persistable as a table. The ln_nano quantization runs on the
vocabulary²-bounded LM tables BEFORE the corpus-side joins, so the
per-token path does only integer subtraction. Scoring is one explode +
three keyed hash joins (bigram table deliberately NOT broadcast — at
web scale the bigram vocabulary is large; prefix/unigram tables join on
their own keys) + one doc-keyed aggregation. Nothing is
driver-materialized; the scalar backoff constant enters as a lazy 1-row
broadcast cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polar_spark.functions.ln_portable import ln_nano_expr

# backoff probability for an unseen bigram: (cw + 1) / (2 * (N + V)) —
# add-one smoothed unigram, backoff weight 1/2 folded into the integer
# denominator so every ln takes only integer args:
#   nll_nano = ln_nano(2*(N+V)) - ln_nano(cw+1)


def bigram_pairs(df: DataFrame, text_col: str = "text", extra: list[str] | None = None) -> DataFrame:
    """Explode ``text_col`` (space-tokenized) into adjacent-pair rows
    (w1, w2), keeping ``extra`` columns. One row per bigram occurrence;
    documents with <2 tokens contribute nothing.

    Physical shape (r13 round, guide §2.3/§4.1): tokenize ONCE in a
    codegen Project, explode a cheap int index sequence, and read the
    two words by array index in the Project above the Generate. The
    previous ``explode(arrays_zip(slice(w,1,..), slice(w,2,..)))`` form
    inlined ``split(text)`` FOUR times into the (non-codegen) Generate's
    argument — four tokenizations plus a struct-array copy per document,
    measured 2.3× slower end-to-end on the LM scoring pipeline. The
    explicit ``size >= 2`` filter replaces the old empty-slice behaviour
    (``sequence(1, size-1)`` would turn DESCENDING below 2 tokens —
    [1, 0] — and emit bogus null rows); output rows are identical."""
    cols = list(extra or [])
    w = F.split(F.coalesce(text_col, F.lit("")), " ")
    return (
        df.select(*cols, w.alias("__w"))
        .filter(F.size("__w") >= 2)
        .select(
            *cols,
            "__w",
            F.expr("explode(sequence(1, size(__w) - 1))").alias("__i"),
        )
        .select(
            *cols,
            F.expr("__w[__i - 1]").alias("w1"),
            F.expr("__w[__i]").alias("w2"),
        )
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
    """Per-document summed negative log-likelihood under the bigram LM,
    in exact integer nano-nats.

    Output: (id_col, n_scored, sum_nll_nano bigint, nll_bucket int)
    where nll_bucket = floor(sum_nll_nano / (n_scored · 1e9)) — the
    integer perplexity band (whole nats per token) usable directly as a
    keep/drop threshold.

    An EMPTY ``lm`` (e.g. a cold streaming store) yields NULL
    sum_nll_nano / nll_bucket — "no model, no score", deliberately
    distinguishable from any real score rather than a fabricated
    maximum.
    """
    # quantize ln on the vocabulary²-bounded LM tables BEFORE the
    # corpus-side join: the scored corpus then shuffles only 3× — the
    # seen-bigram join on (w1,w2), the backoff join on w2, and the final
    # per-document aggregation — and the per-token path is pure bigint
    c1 = lm.groupBy("w1").agg(F.sum("c2").alias("c1"))
    lm2 = (
        lm.join(c1, "w1")
        .select(
            "w1",
            "w2",
            (
                F.expr(ln_nano_expr("c1", "spark"))
                - F.expr(ln_nano_expr("c2", "spark"))
            ).alias("nll_seen"),
        )
    )
    cw = (
        lm.groupBy("w2")
        .agg(F.sum("c2").alias("cw"))
        .select("w2", F.expr(ln_nano_expr("cw + 1", "spark")).alias("ln_cw1"))
    )
    tot = (
        lm.agg(
            F.sum("c2").alias("n_big"), F.countDistinct("w2").alias("v_big")
        )
        .select(
            F.expr(ln_nano_expr("2 * (n_big + v_big)", "spark")).alias("ln_base")
        )
    )
    eb = bigram_pairs(docs, text_col, extra=[id_col])
    nll = F.when(F.col("nll_seen").isNotNull(), F.col("nll_seen")).otherwise(
        F.col("ln_base") - F.coalesce(F.col("ln_cw1"), F.lit(0))
    )
    scored = (
        eb.join(lm2, ["w1", "w2"], "left")
        .join(cw, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(id_col, nll.alias("nll_nano"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("nll_nano").alias("sum_nll_nano"),
        )
        .select(
            id_col,
            "n_scored",
            "sum_nll_nano",
            F.expr(
                "CAST(sum_nll_nano DIV (n_scored * CAST(1000000000 AS BIGINT))"
                " AS INT)"
            ).alias("nll_bucket"),
        )
    )


def lm_score_oracle_sql(train_pred: str, score_pred: str) -> str:
    """DuckDB oracle for `score_bigram_nll` over the `documents` view,
    built from the SAME ln_nano generator as the Spark plan (dialect
    fork is only the power-of-two shift spelling) — the two engines
    evaluate identical IEEE op trees, so the comparison is exact by
    construction."""
    ln_c1 = ln_nano_expr("c1.c1", "duckdb")
    ln_c2 = ln_nano_expr("tr.c2", "duckdb")
    ln_cw1 = ln_nano_expr("coalesce(cw.cw, 0) + 1", "duckdb")
    ln_base = ln_nano_expr("2 * (tot.n_big + tot.v_big)", "duckdb")
    return f"""
WITH tok AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents
), big AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
  FROM tok, UNNEST(range(1, len(w))) AS t(i)
), tr AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM big WHERE {train_pred}
  GROUP BY w1, w2
), c1 AS (
  SELECT w1, SUM(c2) AS c1 FROM tr GROUP BY w1
), cw AS (
  SELECT w2, SUM(c2) AS cw FROM tr GROUP BY w2
), tot AS (
  SELECT SUM(c2) AS n_big, COUNT(DISTINCT w2) AS v_big FROM tr
), sc AS (
  SELECT big.doc_id,
    CASE WHEN tr.c2 IS NOT NULL
      THEN {ln_c1} - {ln_c2}
      ELSE {ln_base} - coalesce({ln_cw1}, 0)
    END AS nll_nano
  FROM big
  LEFT JOIN tr ON big.w1 = tr.w1 AND big.w2 = tr.w2
  LEFT JOIN c1 ON big.w1 = c1.w1
  LEFT JOIN cw ON big.w2 = cw.w2
  CROSS JOIN tot
  WHERE {score_pred}
)
SELECT doc_id, COUNT(*) AS n_scored,
  CAST(SUM(nll_nano) AS BIGINT) AS sum_nll_nano,
  CAST(CAST(SUM(nll_nano) AS BIGINT)
       // (COUNT(*) * 1000000000) AS INT) AS nll_bucket
FROM sc GROUP BY doc_id
"""
