"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), the standard recipe for selecting pretraining data
that matches a small high-quality target corpus: fit bag-of-hashed-ngram
multinomials on the target and on the raw pool, weight every raw
document by its log importance ratio ``log p_target(x) - log p_raw(x)``,
then resample with Gumbel-top-k.

The reference engine (polarstreams/polar) has no analytics surface at
all (SURVEY.md §2.2) — this module is part of the LLM-pipeline
capability superset (SURVEY.md §2.3), sitting beside the CCNet bigram LM
(`functions/lm.py`): the LM scores fluency against a trained model, DSIR
scores *distributional match* against a target corpus without training
anything.

Determinism contract (the repo-wide rule that lets a DuckDB oracle check
results bit-exactly, same as `functions/lm.py`):

- every ``ln`` takes an INTEGER argument (smoothed counts / totals), is
  rounded to 9 dp and cast to ``decimal(28,9)`` before any arithmetic;
  all sums run in exact decimal, so aggregation order can never drift
  the result;
- the Gumbel perturbation needs a nested ``ln`` of a non-integer
  (``g = -ln(-ln u)``); a raw nesting diverges between JVM ``Math.log``
  and libm in the last ulp ~8% of the time (measured), so the inner
  ``ln u`` is first rounded to 9 dp (both engines then feed the SAME
  double into the outer ``ln``) and the outer result is rounded to 6 dp
  (an outer last-ulp difference only survives if it straddles a 5e-7
  rounding boundary: measured 0 mismatches in 5·10^5 hashes);
- the md5-derived uniform is the house `weighted_sample_per_source`
  construction: ``u = (h+1)/2^60`` with ``h`` the first 15 hex digits of
  ``md5(doc_id)``, so selection is reproducible across runs AND engines
  with no RNG seed coordination.

Feature model (paper §2.2, "hashed n-grams"): word unigrams + bigrams
(the corpus-wide space-tokenisation convention shared with the text
ops), hashed into ``m`` buckets by the md5-hex-prefix integer mod m.
Add-one smoothing per bucket: ``p̂_b = (c_b + 1) / (T + m)``, so

    log w(doc) = Σ_grams [ ln(cp_b+1) - ln(cq_b+1) ]
               + n_grams · [ ln(Tq+m) - ln(Tp+m) ]

with every ``ln`` integer-argument.

Scale shape (the point — the same query at 100 TB):

- tokenize/explode is whole-stage codegen, no Python;
- the bucket-count aggregation is ONE shuffle bounded by m (4096) rows
  after map-side partials — independent of corpus size;
- the λ table (m rows) and the totals row broadcast BACK onto the
  exploded grams, so the corpus itself never shuffles at token grain;
- the per-doc sum's partial aggregation completes map-side (a document's
  grams never span tasks — the simhash lesson), so the final exchange
  carries one partial row per document;
- Gumbel-top-k selection is a distributed TakeOrdered, not a global
  sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^60: the md5 15-hex-digit prefix is uniform on [0, 2^60)
_U_DENOM = 1152921504606846976
_DEC9 = "decimal(28,9)"


def _round9(c: Column) -> Column:
    return F.round(c, 9).cast(_DEC9)


def hashed_grams(docs: DataFrame, m: int, id_col: str = "doc_id") -> DataFrame:
    """Explode documents into hashed unigram+bigram bucket ids.

    Output: one row per gram occurrence, with the document's carry-along
    columns plus ``bucket`` (bigint in [0, m)). Codegen-only: split,
    lambda transform, md5, conv — no Python anywhere.
    """
    w = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    bigrams = F.expr(
        "CASE WHEN size(_w) >= 2 THEN transform(sequence(1, size(_w) - 1),"
        " i -> concat(_w[i - 1], ' ', _w[i]))"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    gram = F.explode(F.concat(F.col("_w"), bigrams)).alias("gram")
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("bigint")
    return (
        docs.withColumn("_w", w)
        .select(*[c for c in docs.columns if c != "text"], gram)
        .withColumn("bucket", h % F.lit(m))
        .drop("gram")
    )


def bucket_counts(
    docs: DataFrame, target: Column, m: int = 4096, id_col: str = "doc_id"
) -> DataFrame:
    """The DSIR model STATE: per-bucket raw (``cq``) and target (``cp``)
    occurrence counts, from ONE aggregation (the target pass is a free
    conditional count since the target is in-pool). Counts are ADDITIVE
    — partials built per micro-batch/segment merge by summation into
    exactly the one-shot counts, which is what lets a streaming sink
    (streaming/dsir.py) maintain the model continuously."""
    grams = hashed_grams(docs, m, id_col=id_col).withColumn(
        "_tgt", target.cast("boolean")
    )
    return grams.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cq"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("cp"),
    )


def score_against_counts(
    docs: DataFrame, buckets: DataFrame, m: int = 4096, id_col: str = "doc_id"
) -> DataFrame:
    """Score documents against a prebuilt bucket-count model (the
    λ/κ construction of the module docstring). Unseen buckets (possible
    when the model was trained on a different corpus than the one being
    scored) contribute ``ln 1 - ln 1 = 0``, matching add-one smoothing.

    Returns (docs' non-text columns…, n_grams bigint, logw
    decimal(38,9)) — one row per input document."""
    keep = [c for c in docs.columns if c not in ("text",)]
    grams = hashed_grams(docs, m, id_col=id_col)
    lam = buckets.select(
        "bucket",
        (_round9(F.log(F.col("cp") + 1)) - _round9(F.log(F.col("cq") + 1))).alias(
            "_lam"
        ),
    )
    # totals re-aggregate the m-row bucket table; κ's lns are integer-arg
    totals = buckets.agg(
        F.sum("cq").alias("_tq"), F.sum("cp").alias("_tp")
    ).select(
        (
            _round9(F.log(F.col("_tq") + m)) - _round9(F.log(F.col("_tp") + m))
        ).alias("_kappa")
    )
    scored = (
        grams.join(F.broadcast(lam), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(*keep)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.coalesce(F.col("_lam"), F.lit(0).cast(_DEC9)) + F.col("_kappa"))
                .cast(_DEC9)
            ).alias("logw"),
        )
    )
    return scored


def dsir_log_weights(
    docs: DataFrame,
    target: Column,
    m: int = 4096,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR log importance weight against an in-pool target.

    ``target`` is a boolean Column marking the target subset (the common
    in-pool case, e.g. ``lang == 'en'`` or a curated-source flag; a
    physically separate target corpus unions in with such a flag).
    One-shot form: model counts and scores over the same corpus — every
    doc's grams are in the model, so the left-join never misses.
    """
    return score_against_counts(
        docs, bucket_counts(docs, target, m, id_col), m, id_col
    )


def gumbel_key(id_col: Column, logw: Column) -> Column:
    """Deterministic Gumbel-top-k selection key ``logw + g`` in exact
    decimal, with ``g = -ln(-ln u)`` double-rounded per the module
    determinism contract and ``u`` md5-derived from the id."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    ln_u = _round9(F.log(h + 1) - F.log(F.lit(_U_DENOM)))
    g = F.round(-F.log(-(ln_u.cast("double"))), 6).cast(_DEC9)
    return logw.cast(_DEC9) + g
