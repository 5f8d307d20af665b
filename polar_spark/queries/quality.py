"""Corpus-quality / curation queries (LLM-pipeline surface, round 4).

Published-filter parity: Gopher quality rules (Rae et al. 2021,
arXiv:2112.11446 §A1.1), duplicated-span detection (Lee et al. 2022,
arXiv:2107.06499), SemDeDup semantic dedup (Abbas et al. 2023,
arXiv:2303.09540), and the runtime-bloom semi-join shape Spark's AQE
InjectRuntimeFilter applies implicitly — here as explicit, oracle-checked
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polar_spark.functions.text import EN_STOPWORDS
from polar_spark.queries.registry import query
from polar_spark.sources.tables import load_table, parallelize_small_scan

_SW_SQL = "[" + ", ".join(f"'{s}'" for s in EN_STOPWORDS) + "]"
_SW_SPARK = ", ".join(f"'{s}'" for s in EN_STOPWORDS)

# Gopher bounds, adapted to this corpus's 10-99-word docs (the published
# 50..100k word-count rule would be degenerate here; every other rule is
# the published constant).
_W_MIN, _W_MAX = 30, 90
_MWL_MIN, _MWL_MAX = 3.0, 10.0
_MIN_STOP = 2
_ALPHA_FRAC = 0.8


@query(
    "gopher_quality_filter",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents
), s AS (
  SELECT doc_id,
    len(w) AS n_words,
    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w)
      AS mean_word_len,
    len(list_intersect(w, {_SW_SQL})) AS stop_distinct,
    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
      / len(w) AS alpha_frac
  FROM t
)
SELECT doc_id, n_words, mean_word_len, stop_distinct, alpha_frac,
  CAST(n_words BETWEEN {_W_MIN} AND {_W_MAX}
    AND mean_word_len BETWEEN {_MWL_MIN} AND {_MWL_MAX}
    AND stop_distinct >= {_MIN_STOP}
    AND alpha_frac >= {_ALPHA_FRAC} AS INT) AS keep
FROM s
""",
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (arXiv:2112.11446 §A1.1) as one codegen
    pass: word count in range, mean word length in [3, 10], ≥2 distinct
    stopwords present, ≥80% of words contain an alphabetic character.
    Zero shuffle, zero Python — every rule is a JVM array expression, so
    the filter streams at scan speed over 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    # NULL text → '' in both engines (Spark size(split(NULL)) = -1 vs
    # DuckDB NULL — coalescing keeps the flags comparable and keep=0)
    w = F.split(F.coalesce("text", F.lit("")), " ")
    n = F.size(w)
    mwl = (
        F.aggregate(
            F.transform(w, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / n
    )
    stop = F.size(F.array_intersect(w, F.expr(f"array({_SW_SPARK})")))
    alpha = (
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double") / n
    )
    out = d.select(
        "doc_id",
        n.alias("n_words"),
        mwl.alias("mean_word_len"),
        stop.alias("stop_distinct"),
        alpha.alias("alpha_frac"),
    )
    keep = (
        F.col("n_words").between(_W_MIN, _W_MAX)
        & F.col("mean_word_len").between(_MWL_MIN, _MWL_MAX)
        & (F.col("stop_distinct") >= _MIN_STOP)
        & (F.col("alpha_frac") >= _ALPHA_FRAC)
    )
    return out.withColumn("keep", keep.cast("int"))


_SPAN_WORDS = 8
_SPAN_TOPK = 20


@query(
    "dup_span_detect",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(string_split(text, ' ')) - {_SPAN_WORDS - 1}, 0) + 1),
    i -> array_to_string(string_split(text, ' ')[i : i + {_SPAN_WORDS - 1}], ' '))))
    AS span
  FROM documents
)
SELECT span, COUNT(*) AS n_docs FROM sh
GROUP BY span HAVING COUNT(*) >= 2
ORDER BY n_docs DESC, span LIMIT {_SPAN_TOPK}
""",
)
def dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span detection (the signal behind suffix-array dedup,
    arXiv:2107.06499): the 8-word spans shared by the most
    documents. Spans are distinct-per-doc JVM array expressions (one
    explode, no Python); the count is a map-side-combined groupBy and
    the top-k a single ordered limit (partial TakeOrdered per partition,
    O(k) to the driver) — at 100 TB this is one explode-shuffle, never a
    doc×doc pair."""
    from polar_spark.functions.dedup import _spread

    d = _spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    # pre-split ONCE into a column (r13 round, guide §2.3/§4.1): with
    # `split(text)` textually inlined, the transform lambda re-split the
    # document per span index — O(words²) per doc (the shingles_expr
    # PERF NOTE hazard); a bound array column makes each slice O(span).
    # CollapseProject cannot re-inline: split is non-cheap and _w is
    # referenced three times.
    ws = d.select(F.expr("split(text, ' ')").alias("_w"))
    spans = F.expr(
        f"case when size(_w) >= {_SPAN_WORDS} then"
        f" array_distinct(transform(sequence(1, size(_w) - {_SPAN_WORDS - 1}),"
        f"   i -> concat_ws(' ', slice(_w, i, {_SPAN_WORDS}))))"
        f" else array() end"
    )
    return (
        ws.select(F.explode(spans).alias("span"))
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "span")
        .limit(_SPAN_TOPK)
    )


@query(
    "semdedup_embedding_prune",
    oracle="""
WITH c AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
  FROM embeddings
), cent AS (SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id < 16),
asg AS (
  SELECT vec_id, v, cid AS cell,
    CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2
  FROM (
    SELECT a.vec_id, a.v, cent.cid,
      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
        list_sum(list_transform(range(1, 65), i -> (a.v[i] - cent.cv[i]) * (a.v[i] - cent.cv[i]))), cent.cid) AS r
    FROM c a CROSS JOIN cent) t WHERE r = 1
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.n2 AS na2, b.n2 AS nb2,
    CAST(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) AS BIGINT) AS d
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT DISTINCT id_b AS drop_id FROM pairs
WHERE d > 0
  AND 10000 * (CAST(d AS HUGEINT) * d) >= 1600 * (CAST(na2 AS HUGEINT) * nb2)
""",
)
def semdedup_embedding_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): cluster embeddings (deterministic
    first-16 codebook — the same cells an ingest-materialized IVF index
    stores), then drop the higher id of every within-cell pair with
    cosine ≥ τ (published τ = 0.95; this synthetic corpus has no true
    semantic dups — max within-cell cosine ≈ 0.49 — so the query runs at
    τ = 0.40 to exercise the prune path end-to-end).
    The cluster-first shape bounds the pairwise term to
    O(Σ|cell|²): one narrow assignment pass + one self-join on `cell` —
    never a global n² sweep. Threshold test is exact integer arithmetic
    over quantized vectors (decimal(38,0) / HUGEINT)."""
    from polar_spark.functions.similarity import (
        NLIST,
        quantize,
        semdedup_drop_ids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.select("vec_id", quantize("embedding").alias("v"))
    cents = [
        (r["vec_id"], r["v"]) for r in qv.filter(F.col("vec_id") < NLIST).collect()
    ]
    return semdedup_drop_ids(
        qv, cents, id_col="vec_id", vec_col="v", tau_sq_pct=1600
    )


@query(
    "bloom_semi_join_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
)
def bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with an explicit Bloom prefilter
    (operators/bloomjoin.py): the BUILDING customers' keys are reduced
    to a 1 Mbit bitmap in one narrow pass, the bitmap rides every
    orders-side task, and only probable matches reach the exact semi
    join — the shuffle carries ~matches instead of every order. Result
    is EXACTLY the semi join (false positives scrubbed by the join);
    this is Spark AQE's runtime row filter / Trino dynamic filtering as
    a composable operator for build sides too big to broadcast."""
    from polar_spark.operators.bloomjoin import bloom_semi_join

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return bloom_semi_join(o, cust, "o_custkey", "c_custkey")


_CHUNK_WORDS = 20


@query(
    "chunk_dup_ratio",
    oracle=f"""
WITH ch AS (
  SELECT doc_id, unnest(list_transform(
    range(0, CAST(ceil(len(string_split(coalesce(text, ''), ' ')) / {_CHUNK_WORDS}.0) AS INT)),
    i -> array_to_string(
      string_split(coalesce(text, ''), ' ')[i * {_CHUNK_WORDS} + 1 : i * {_CHUNK_WORDS} + {_CHUNK_WORDS}], ' ')))
    AS chunk
  FROM documents
), cnt AS (
  SELECT doc_id, chunk, COUNT(*) OVER (PARTITION BY chunk) AS n_occ FROM ch
)
SELECT doc_id, COUNT(*) AS n_chunks,
  CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
  CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_ratio
FROM cnt GROUP BY doc_id
""",
)
def chunk_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-content ratio (the RefinedWeb /
    arXiv:2306.01116 exact-substring signal at chunk granularity): split
    each doc into non-overlapping 20-word chunks, count corpus-wide
    occurrences of each chunk, report the fraction of a doc's chunks
    that appear elsewhere too. Scale shape: one explode, one window
    partitioned by chunk (hash shuffle on chunk — map-side combinable
    cardinality), one groupBy doc_id — never a doc×doc pair. Docs made
    of boilerplate score high and get dropped by the curation step."""
    from pyspark.sql.window import Window

    from polar_spark.functions.dedup import _spread

    d = _spread(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.coalesce("text", F.lit("")).alias("text")
        )
    )
    # NULL text → '' on BOTH sides: Spark's size(split(NULL)) is -1 and
    # sequence(0, -1) counts DOWN (two phantom chunks) while the DuckDB
    # oracle emits no rows — coalescing first gives one ''-chunk doc in
    # both engines.
    # Pre-split ONCE into a column (r13 round, guide §2.3/§4.1): the
    # inlined-split form re-tokenized the doc per chunk index inside the
    # transform lambda — O(words²/chunk) per doc; the bound array column
    # makes each slice O(chunk) and is not re-inlined by CollapseProject
    # (split is non-cheap, referenced twice).
    ws = d.select("doc_id", F.expr("split(text, ' ')").alias("_w"))
    chunks = F.expr(
        f"transform(sequence(0, cast(ceil(size(_w) / {_CHUNK_WORDS}.0) as int) - 1),"
        f" i -> concat_ws(' ', slice(_w, i * {_CHUNK_WORDS} + 1, {_CHUNK_WORDS})))"
    )
    ch = ws.select("doc_id", F.explode(chunks).alias("chunk"))
    occ = ch.withColumn("n_occ", F.count(F.lit(1)).over(Window.partitionBy("chunk")))
    dup = F.sum((F.col("n_occ") > 1).cast("bigint"))
    return occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        dup.alias("n_dup_chunks"),
        (dup.cast("double") / F.count(F.lit(1))).alias("dup_ratio"),
    )


_QLC_B = 64  # feature-hash buckets


def _qlc_weights() -> list[int]:
    """Deterministic 'trained' weights: weight(b) = first-md5-hex-digit
    ('qw:'||b) - 8 in [-8, 7] — engine-reproducible exactly like
    functions/similarity.hyperplane_weights. A production pipeline swaps
    these for fasttext/logreg-trained weights; the plumbing (feature
    hashing, codegen scoring) is identical."""
    import hashlib

    return [
        int(hashlib.md5(f"qw:{b}".encode()).hexdigest()[0], 16) - 8
        for b in range(_QLC_B)
    ]


@query(
    "quality_linear_classifier",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents
), s AS (
  SELECT doc_id, len(w) AS n_words,
    CAST(list_sum(list_transform(w, x ->
      strpos('0123456789abcdef', substr(md5('qw:' ||
        (((strpos('0123456789abcdef', substr(md5(x), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(x), 2, 1)) - 1)) % {_QLC_B})::VARCHAR
      ), 1, 1)) - 9
    )) AS BIGINT) AS raw
  FROM t
)
SELECT doc_id, n_words, raw,
  CAST(raw AS DOUBLE) / n_words AS score,
  CAST(CAST(raw AS DOUBLE) / n_words >= 0 AS INT) AS keep
FROM s
""",
)
def quality_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter plumbing (the CCNet / fastText-style
    linear classifier LLM pipelines run after rule filters): hashed
    bag-of-words features (md5 feature hashing into _QLC_B = 64
    buckets),
    per-bucket weights, mean-pooled score, binary keep label.

    Weights here are deterministic md5-derived stand-ins so the whole
    path is oracle-checkable; swap in trained weights (same shape) for
    production. 100 TB shape: the weight table is a 64-element
    array LITERAL inside whole-stage codegen — scoring is one
    scan-projection, zero shuffle, zero Python, exactly like
    gopher_quality_filter."""
    d = load_table(spark, sf_dir, "documents")
    weights = ", ".join(str(x) for x in _qlc_weights())
    w = "split(coalesce(text, ''), ' ')"
    bucket = (
        "((conv(substring(md5(x), 1, 1), 16, 10) * 16"
        f" + conv(substring(md5(x), 2, 1), 16, 10)) % {_QLC_B})"
    )
    raw = F.expr(
        f"aggregate(transform({w}, x -> element_at(array({weights}),"
        f" cast({bucket} as int) + 1)), cast(0 as bigint),"
        " (acc, v) -> acc + cast(v as bigint))"
    )
    return d.select(
        "doc_id",
        F.expr(f"size({w})").alias("n_words"),
        raw.alias("raw"),
        (raw.cast("double") / F.expr(f"size({w})")).alias("score"),
        (raw.cast("double") / F.expr(f"size({w})") >= 0).cast("int").alias("keep"),
    )


@query(
    "mixture_quality_buckets",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents
), s AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(w, x ->
      strpos('0123456789abcdef', substr(md5('qw:' ||
        (((strpos('0123456789abcdef', substr(md5(x), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(x), 2, 1)) - 1)) % {_QLC_B})::VARCHAR
      ), 1, 1)) - 9
    )) AS BIGINT) AS raw, len(w) AS n
  FROM t
), b AS (
  SELECT doc_id,
    CASE WHEN CAST(raw AS DOUBLE) / n >= 0.3 THEN 'hi'
         WHEN CAST(raw AS DOUBLE) / n >= -0.3 THEN 'mid'
         ELSE 'lo' END AS bucket,
    ((strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1)) % 100
      AS pct
  FROM s
)
SELECT bucket, COUNT(*) AS n_docs,
  CAST(SUM(CASE
    WHEN bucket = 'hi' THEN 1
    WHEN bucket = 'mid' AND pct < 50 THEN 1
    WHEN bucket = 'lo' AND pct < 25 THEN 1
    ELSE 0 END) AS BIGINT) AS n_kept
FROM b GROUP BY bucket
""",
)
def mixture_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum mixture (the step after model scoring in a
    FineWeb/DCLM-style pipeline): bucket docs by classifier score
    (terciles of this corpus: hi ≥ 0.3, mid ≥ −0.3, lo otherwise), then
    keep 100% / 50% / 25% per bucket via a deterministic md5(doc_id)
    percent draw — reproducible sampling, no RNG state. Composition of
    quality_linear_classifier with the hash-quota idiom; single scan,
    one map-side-combined groupBy, zero Python."""
    d = load_table(spark, sf_dir, "documents")
    weights = ", ".join(str(x) for x in _qlc_weights())
    w = "split(coalesce(text, ''), ' ')"
    bucket_expr = (
        "((conv(substring(md5(x), 1, 1), 16, 10) * 16"
        f" + conv(substring(md5(x), 2, 1), 16, 10)) % {_QLC_B})"
    )
    raw = F.expr(
        f"aggregate(transform({w}, x -> element_at(array({weights}),"
        f" cast({bucket_expr} as int) + 1)), cast(0 as bigint),"
        " (acc, v) -> acc + cast(v as bigint))"
    )
    score = raw.cast("double") / F.expr(f"size({w})")
    bucket = (
        F.when(score >= 0.3, "hi").when(score >= -0.3, "mid").otherwise("lo")
    )
    pct = F.expr(
        "(conv(substring(md5(cast(doc_id as string)), 1, 1), 16, 10) * 16"
        " + conv(substring(md5(cast(doc_id as string)), 2, 1), 16, 10)) % 100"
    )
    keep = (
        F.when(F.col("bucket") == "hi", 1)
        .when((F.col("bucket") == "mid") & (F.col("pct") < 50), 1)
        .when((F.col("bucket") == "lo") & (F.col("pct") < 25), 1)
        .otherwise(0)
    )
    return (
        d.select("doc_id", bucket.alias("bucket"), pct.alias("pct"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep).cast("bigint").alias("n_kept"),
        )
    )


def _lm_oracle() -> str:
    from polar_spark.functions.lm import lm_score_oracle_sql

    return lm_score_oracle_sql("doc_id % 10 < 8", "big.doc_id % 10 >= 8")


@query("lm_bigram_nll_score", oracle=_lm_oracle())
def lm_bigram_nll_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (arXiv:1911.00359): train a bigram
    stupid-backoff LM (Brants et al. 2007) on a deterministic 80% split
    (doc_id % 10 < 8), score the held-out 20% by summed negative
    log-likelihood in exact integer nano-nats — the 'train a small LM
    once, score 100 TB with it' pipeline shape. Every ln takes an
    integer count and is computed by the portable fixed-IEEE-op
    expression of functions/ln_portable.py (no engine transcendental;
    Spark plan and DuckDB oracle share the generator), quantized once to
    bigint so aggregation order can never drift the result. The bigram
    table joins by key — deliberately NOT broadcast: at web scale it is
    vocabulary²-sized; the backoff constant enters as a lazy 1-row
    broadcast."""
    from polar_spark.functions.lm import score_bigram_nll, train_bigram_counts

    d = parallelize_small_scan(load_table(spark, sf_dir, "documents"))
    train = d.filter(F.pmod("doc_id", F.lit(10)) < 8)
    holdout = d.filter(F.pmod("doc_id", F.lit(10)) >= 8)
    # the LM state is derived 4× (seen-join, prefix, unigram, totals);
    # persist keeps it one train-corpus shuffle total — same shared-
    # intermediate discipline as the dedup shingle table, and lineage
    # survives executor loss at cluster scale (unlike a checkpoint)
    from polar_spark.plans.cache import persist_slot

    lm = persist_slot(train_bigram_counts(train), "lm_bigram_nll_score.lm", eager=True)
    return score_bigram_nll(holdout, lm)


def _psi_oracle() -> str:
    from polar_spark.functions.ln_portable import ln_nano_expr

    lp = ln_nano_expr("cp * nq", "duckdb")
    lq = ln_nano_expr("cq * np", "duckdb")
    return f"""
WITH b AS (
  SELECT n_chars // 50 AS bucket,
    COUNT(*) FILTER (WHERE doc_id % 2 = 0) + 1 AS cp,
    COUNT(*) FILTER (WHERE doc_id % 2 = 1) + 1 AS cq
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq FROM b
)
SELECT bucket, CAST(cp AS BIGINT) AS cp, CAST(cq AS BIGINT) AS cq,
  CAST((cp * nq - cq * np) * ({lp} - {lq}) AS BIGINT) AS psi_term_scaled
FROM b CROSS JOIN tot
"""


@query("drift_psi_length_buckets", oracle=_psi_oracle())
def drift_psi_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring between two corpus slices (the
    data-quality gate every continuously-ingesting training pipeline
    runs): Population Stability Index over fixed-width document-length
    buckets, reference slice P = even doc_ids vs current slice Q = odd.
    Add-one smoothing over the union of observed buckets; the per-bucket
    term (p-q)·ln(p/q) is computed EXACTLY in integers —
    ln(p/q) = ln(cp·Nq) - ln(cq·Np) takes integer arguments through the
    portable ln_nano, and the (p-q) numerator stays rational:
    psi = Σ psi_term_scaled / (Np·Nq·1e9). (For counts beyond ~2^31,
    pre-scale both slices by a common factor before the product.)

    Scale: ONE map-side-combined aggregation over the corpus into
    |buckets| rows; totals enter as a 1-row broadcast; every ln runs on
    the bucket table. PSI ≥ 0.2 · Np·Nq·1e9 is the conventional
    retrain/alert threshold."""
    from polar_spark.functions.ln_portable import ln_nano_expr

    d = load_table(spark, sf_dir, "documents")
    b = (
        d.select(
            F.expr("n_chars DIV 50").alias("bucket"),
            F.col("doc_id"),
        )
        .groupBy("bucket")
        .agg(
            (F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)) + 1).alias("cp"),
            (F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)) + 1).alias("cq"),
        )
    )
    tot = b.agg(
        F.sum("cp").cast("long").alias("np"), F.sum("cq").cast("long").alias("nq")
    )
    lp = ln_nano_expr("cp * nq", "spark")
    lq = ln_nano_expr("cq * np", "spark")
    return (
        b.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.col("cp").cast("long").alias("cp"),
            F.col("cq").cast("long").alias("cq"),
            F.expr(
                f"CAST((cp * nq - cq * np) * (({lp}) - ({lq})) AS BIGINT)"
            ).alias("psi_term_scaled"),
        )
    )


# the 2-D box probed by the z-order layout demo: all users, a narrow
# value band — the shape where a user_id-sorted layout prunes NOTHING
# and the Morton layout's per-file envelopes carry the whole win
_ZB = {"x1": 0, "x2": 1023, "y1": 100, "y2": 140}


def _zorder_oracle() -> str:
    from polar_spark.functions.zorder import z_value_sql

    z = z_value_sql("x", "y", "duckdb")
    b = _ZB
    return f"""
WITH d AS (
  SELECT user_id & 1023 AS x,
         CAST(FLOOR(value) AS BIGINT) & 1023 AS y
  FROM events
), keyed AS (
  SELECT x, y, {z} >> 11 AS zbucket, x >> 2 AS lbucket FROM d
), z AS (
  SELECT 'zorder' AS layout, zbucket AS bucket, COUNT(*) AS n_rows,
    MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
  FROM keyed GROUP BY zbucket
), l AS (
  SELECT 'linear_by_user' AS layout, lbucket AS bucket, COUNT(*) AS n_rows,
    MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
  FROM keyed GROUP BY lbucket
), u AS (SELECT * FROM z UNION ALL SELECT * FROM l)
SELECT layout, CAST(bucket AS BIGINT) AS bucket, n_rows,
  x_min, x_max, y_min, y_max,
  CAST(x_max >= {b['x1']} AND x_min <= {b['x2']}
   AND y_max >= {b['y1']} AND y_min <= {b['y2']} AS INT) AS must_read
FROM u
"""


@query("zorder_pruning_stats", oracle=_zorder_oracle())
def zorder_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout vs single-dimension layout, measured by
    the pruning arithmetic itself (functions/zorder.py — the technique
    Delta's OPTIMIZE ZORDER BY ships): rows bucket by the interleaved
    key's top bits (bucket ≙ file; in production this is
    repartitionByRange(z) + parquet min/max stats), per-bucket min/max
    envelopes on BOTH dimensions, and a must_read flag for a fixed 2-D
    box (all users × a narrow value band). The user-sorted layout must
    read every bucket for this box; the Morton layout's envelopes bound
    the value dimension too, so most buckets prune — exactly the
    file-skipping a 100 TB scan needs, verified in exact integers.

    Scale: ONE map-side-combined aggregation per layout over a
    shift/mask codegen key — the demo is a scan + tiny group table; the
    production layout write is one range-repartition by the same key."""
    from polar_spark.functions.zorder import z_value_sql

    d = load_table(spark, sf_dir, "events").select(
        F.expr("user_id & 1023").alias("x"),
        F.expr("CAST(FLOOR(value) AS BIGINT) & 1023").alias("y"),
    )
    z = z_value_sql("x", "y", "spark")
    keyed = d.select(
        "x", "y",
        F.expr(f"shiftright({z}, 11)").alias("zbucket"),
        F.expr("shiftright(x, 2)").alias("lbucket"),
    )

    def layout(name: str, bucket_col: str) -> DataFrame:
        return (
            keyed.groupBy(F.col(bucket_col).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                F.min("y").alias("y_min"), F.max("y").alias("y_max"),
            )
            .select(F.lit(name).alias("layout"), F.col("bucket").cast("long").alias("bucket"),
                    "n_rows", "x_min", "x_max", "y_min", "y_max")
        )

    b = _ZB
    u = layout("zorder", "zbucket").unionByName(layout("linear_by_user", "lbucket"))
    must = (
        (F.col("x_max") >= b["x1"]) & (F.col("x_min") <= b["x2"])
        & (F.col("y_max") >= b["y1"]) & (F.col("y_min") <= b["y2"])
    )
    return u.withColumn("must_read", must.cast("int"))
