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
results bit-exactly, upgraded round 8 to the `functions/ln_portable.py`
discipline after the r7 LM hash-red proved that even rounded
integer-argument ``F.log`` is environment-sensitive):

- every ``ln`` of an integer count goes through the portable
  fixed-IEEE-op ``ln_nano`` (no engine transcendental anywhere) and is
  quantized ONCE to integer nano-nats; all per-bucket, per-document and
  selection-key arithmetic is exact bigint, so neither engine, libm,
  nor aggregation order can drift a result;
- the Gumbel perturbation ``g = -ln(-ln u)`` nests through the same
  machinery: ``-ln u`` is an integer nano-nat count ``v`` (clamped to
  ≥ 1 — the u→1 edge that made ``-ln 0`` NULL is structurally gone),
  and the outer ln is ``ln_portable(v) - ln(1e9)`` — one more fixed
  IEEE op tree — quantized to micro-nats;
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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polar_spark.functions.ln_portable import ln_expr, ln_nano_expr, ln_nano_py

# 2^60: the md5 15-hex-digit prefix is uniform on [0, 2^60)
_U_DENOM = 1152921504606846976
# ln(2^60) in nano-nats under the portable quantization — a constant of
# the construction, shared by both engines via the literal
_LN_U_DENOM_NANO = ln_nano_py(_U_DENOM)
# ln(1e9): rescales a nano-nat count back to nats inside the outer
# Gumbel ln; repr() round-trips to the exact double in every engine
_LN_1E9 = repr(math.log(1e9))


def hashed_grams(docs: DataFrame, m: int, id_col: str = "doc_id") -> DataFrame:
    """Explode documents into hashed unigram+bigram bucket ids.

    Output: one row per gram occurrence, with the document's carry-along
    columns plus ``bucket`` (bigint in [0, m)). JVM-only: split, lambda
    transform, md5, conv — no Python anywhere.

    r13 physical rework (guide §2.3 "shuffle keys, not payloads",
    applied to a Generate): grams are hashed to int buckets INSIDE a
    ``transform`` over the per-row gram array and the explode emits the
    int array — the pre-r13 form exploded the gram STRINGS and hashed
    per exploded row, and the string-array Generate alone was 6× the
    cost of the whole HOF+int-explode pipeline at sf0.1 (2.5 s vs
    0.44 s for the model aggregation; the md5/conv work is identical,
    only the materialized generator rows shrank). Same rows, same
    values — bit-identical buckets."""
    w = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    bigrams = F.expr(
        "CASE WHEN size(_w) >= 2 THEN transform(sequence(1, size(_w) - 1),"
        " i -> concat(_w[i - 1], ' ', _w[i]))"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    buckets = F.transform(
        F.concat(F.col("_w"), bigrams),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")
        % F.lit(m),
    )
    return docs.withColumn("_w", w).select(
        *[c for c in docs.columns if c != "text"],
        F.explode(buckets).alias("bucket"),
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

    Returns (docs' non-text columns…, n_grams bigint, logw_nano bigint
    — the summed log weight in exact integer nano-nats) — one row per
    input document."""
    keep = [c for c in docs.columns if c not in ("text",)]
    grams = hashed_grams(docs, m, id_col=id_col)
    lam = buckets.select(
        "bucket",
        (
            F.expr(ln_nano_expr("cp + 1", "spark"))
            - F.expr(ln_nano_expr("cq + 1", "spark"))
        ).alias("_lam"),
    )
    # totals re-aggregate the m-row bucket table; κ's lns are integer-arg
    totals = buckets.agg(
        F.sum("cq").alias("_tq"), F.sum("cp").alias("_tp")
    ).select(
        (
            F.expr(ln_nano_expr(f"_tq + {m}", "spark"))
            - F.expr(ln_nano_expr(f"_tp + {m}", "spark"))
        ).alias("_kappa")
    )
    scored = (
        grams.join(F.broadcast(lam), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(*keep)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.coalesce(F.col("_lam"), F.lit(0)) + F.col("_kappa")
            ).alias("logw_nano"),
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


def gumbel_key(id_col_name: str, logw_nano: Column) -> Column:
    """Deterministic Gumbel-top-k selection key ``logw + g`` in exact
    integer nano-nats, with ``g = -ln(-ln u)`` and ``u`` md5-derived
    from the named id column.

    All-portable nesting: ``-ln u`` is the positive nano-nat count
    ``v = ln_nano(2^60) - ln_nano(h+1)``, clamped to ≥ 1 so the u→1
    edge can never produce ``ln 0`` (the r7-advice NULL hole); the
    outer ln is the portable double expression on the INTEGER v,
    rescaled by the ln(1e9) literal and quantized to micro-nats. Every
    op is fixed IEEE arithmetic — bit-identical in Spark, DuckDB and
    the Python twin (gumbel_g_nano_py)."""
    return logw_nano + F.expr(
        gumbel_g_nano_sql(
            f"CAST(conv(substring(md5(CAST({id_col_name} AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT)",
            "spark",
        )
    )


def gumbel_g_nano_sql(h_expr: str, dialect: str) -> str:
    """SQL (Spark or DuckDB dialect) for the Gumbel perturbation in
    nano-nats, from a 60-bit hash expression ``h_expr``."""
    v = (
        f"GREATEST({_LN_U_DENO_SQL()} - {ln_nano_expr(f'({h_expr}) + 1', dialect)},"
        " CAST(1 AS BIGINT))"
    )
    # g = -ln(v/1e9) = ln(1e9) - ln(v), quantized to micro-nats then
    # rescaled to the common nano grid
    return (
        f"(1000 * CAST(FLOOR((CAST('{_LN_1E9}' AS DOUBLE) - {ln_expr(v, dialect)})"
        f" * CAST('1000000.0' AS DOUBLE) + CAST('0.5' AS DOUBLE)) AS BIGINT))"
    )


def _LN_U_DENO_SQL() -> str:
    return f"CAST({_LN_U_DENOM_NANO} AS BIGINT)"


def gumbel_g_nano_py(h: int) -> int:
    """Python twin of :func:`gumbel_g_nano_sql` (identical IEEE ops)."""
    v = max(_LN_U_DENOM_NANO - ln_nano_py(h + 1), 1)
    e = v.bit_length() - 1
    m_ = float(v) / float(1 << e)
    z = (m_ - 1.0) / (m_ + 1.0)
    y = z * z
    from polar_spark.functions.ln_portable import _COEFFS, _LN2

    s = _COEFFS[0]
    for c in _COEFFS[1:]:
        s = s * y + c
    ln_v = float(e) * _LN2 + 2.0 * z * s
    return 1000 * int(math.floor((math.log(1e9) - ln_v) * 1e6 + 0.5))


# DuckDB 60-bit md5-prefix hash of an expression (the house uniform)
DUCK_H60 = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16),"
    " i -> CAST(strpos('0123456789abcdef', substr(md5({arg}), i, 1)) - 1 AS BIGINT))),"
    " (acc, d) -> acc * 16 + d)"
)


def dsir_oracle_ctes(m: int = 4096) -> str:
    """DuckDB CTE block mirroring :func:`dsir_log_weights` over the
    ``documents`` view (target = lang 'en') — built from the SAME
    ln_nano generator as the Spark plan, so the comparison is exact by
    construction. Yields a ``scored(doc_id, lang, n_grams, logw_nano)``
    CTE."""
    lam_p = ln_nano_expr("cp + 1", "duckdb")
    lam_q = ln_nano_expr("cq + 1", "duckdb")
    kap_q = ln_nano_expr(f"SUM(cq) + {m}", "duckdb")
    kap_p = ln_nano_expr(f"SUM(cp) + {m}", "duckdb")
    h = DUCK_H60.format(arg="gram")
    return f"""
grams AS (
  SELECT doc_id, lang,
         unnest(list_concat(w, CASE WHEN len(w) >= 2
             THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
             ELSE [] END)) AS gram
  FROM (SELECT doc_id, lang, string_split(coalesce(text, ''), ' ') AS w
        FROM documents)
), hashed AS (
  SELECT doc_id, lang, {h} % {m} AS bucket
  FROM grams
), buckets AS (
  SELECT bucket, COUNT(*) AS cq, COUNT(*) FILTER (WHERE lang = 'en') AS cp
  FROM hashed GROUP BY bucket
), lam AS (
  SELECT bucket, {lam_p} - {lam_q} AS lam
  FROM buckets
), tot AS (
  SELECT {kap_q} - {kap_p} AS kappa
  FROM buckets
), scored AS (
  SELECT doc_id, lang, COUNT(*) AS n_grams,
         CAST(SUM(lam + kappa) AS BIGINT) AS logw_nano
  FROM hashed JOIN lam USING (bucket) CROSS JOIN tot
  GROUP BY doc_id, lang
)"""
