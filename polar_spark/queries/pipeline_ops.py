"""Training-data curation operators: deterministic splits, per-source
quotas, benchmark decontamination, redaction.

The data-mixing / hygiene stage of an LLM data pipeline, each op shaped
for 100 TB:

- splits are HASH-assigned (md5 of the id), never RNG — reproducible
  across runs/engines, no seed coordination, and oracle-checkable;
- quota downsampling is one window per group key, keeping a
  deterministic prefix per source;
- decontamination joins each doc's shingles against the (tiny,
  broadcast) benchmark shingle set — never doc×doc pairs;
- redaction is pure regexp codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polar_spark.queries.registry import query
from polar_spark.sources.tables import load_table, parallelize_small_scan

# md5-nibble → [0, 16) — the engine-portable hash bucket (same construction
# both sides; DuckDB has no conv(), hence strpos over the hex alphabet)
_NIB = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1"
_NIB_DUCK = "strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1"
# second md5 nibble: mixture sampling reads a DIFFERENT hex digit than the
# train/eval split so the two samples are independent, not nested (a shared
# nibble would make e.g. "web keeps nib<4" wholly contain "eval = nib<2",
# i.e. 50% of kept web docs would be eval instead of 1/8)
_NIB2 = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1"
_NIB2_DUCK = "strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1"


@query(
    "split_train_eval_deterministic",
    oracle=f"""
WITH tagged AS (
  SELECT doc_id, lang,
    CASE WHEN {_NIB_DUCK} < 2 THEN 'eval' ELSE 'train' END AS split,
    len(string_split(text, ' ')) AS n_words
  FROM documents
)
SELECT split, lang, COUNT(*) AS n_docs,
  CAST(SUM(n_words) AS BIGINT) AS total_words,
  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM tagged GROUP BY split, lang
""",
)
def split_train_eval_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1/8-eval train/eval split by id-hash bucket (the
    reproducible alternative to seeded sampling: same doc → same split
    on any engine, any run, any partitioning), summarized per split and
    language."""
    d = load_table(spark, sf_dir, "documents")
    tagged = d.select(
        "doc_id",
        "lang",
        F.when(F.expr(_NIB) < 2, F.lit("eval")).otherwise(F.lit("train")).alias("split"),
        F.size(F.split("text", " ")).alias("n_words"),
    )
    return tagged.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "quota_downsample_per_source",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
)
SELECT source, COUNT(*) AS n_kept, MAX(doc_id) AS max_kept_doc
FROM ranked WHERE rn <= 150 GROUP BY source
""",
)
def quota_downsample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota (data mixing): keep at most 150 docs per source,
    deterministic prefix by doc_id — one window per group key; at scale
    a hot source costs one partition's sort, and AQE skew-split applies."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy("doc_id")
    kept = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 150)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("doc_id").alias("max_kept_doc"),
    )


@query(
    "contamination_ngram_overlap",
    oracle="""
WITH sh AS (
  SELECT doc_id AS id,
    unnest(list_distinct(list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
      i -> array_to_string(string_split(text, ' ')[i : i + 2], ' ')))) AS shingle
  FROM documents
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE id < 10
), hits AS (
  SELECT s.id AS doc_id, COUNT(*) AS shared_shingles
  FROM sh s JOIN bench USING (shingle)
  WHERE s.id >= 10 GROUP BY s.id
), sizes AS (
  SELECT id AS doc_id, COUNT(*) AS n_shingles FROM sh WHERE id >= 10 GROUP BY id
)
SELECT h.doc_id, h.shared_shingles, z.n_shingles,
  CAST(h.shared_shingles AS DOUBLE) / z.n_shingles AS overlap_ratio
FROM hits h JOIN sizes z USING (doc_id)
WHERE CAST(h.shared_shingles AS DOUBLE) / z.n_shingles >= 0.2
""",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose 3-gram shingles
    overlap a benchmark set (here docs 0-9) by ≥ 20%. The benchmark
    shingle set is tiny by construction and BROADCAST into the join, so
    the corpus never shuffles and no doc×doc pair forms — the standard
    scale shape for eval-contamination sweeps."""
    from pyspark import StorageLevel

    from polar_spark.functions.dedup import _spread, shingle_table

    d = load_table(spark, sf_dir, "documents")
    # _spread: a small corpus arrives as one parquet split — widen before
    # the CPU-heavy shingle explode so it uses every core (no-op at scale).
    # persist: the benchmark set, hit counts and sizes all read the
    # exploded table — without it the corpus explodes three times
    sh = shingle_table(
        _spread(d.select("doc_id", "text")), "doc_id", "text"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bench = sh.filter(F.col("id") < 10).select("shingle").distinct()
    corpus = sh.filter(F.col("id") >= 10)
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    sizes = corpus.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    ratio = F.col("shared_shingles").cast("double") / F.col("n_shingles")
    return (
        hits.join(sizes, "id")
        .select(
            F.col("id").alias("doc_id"),
            "shared_shingles",
            "n_shingles",
            ratio.alias("overlap_ratio"),
        )
        .filter(F.col("overlap_ratio") >= 0.2)
    )


@query(
    "text_redact_numbers",
    oracle="""
SELECT doc_id,
  md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS redacted_digest,
  CAST(length(text) - length(regexp_replace(text, '[0-9]+', '', 'g')) AS INTEGER)
    AS digits_removed
FROM documents
""",
)
def text_redact_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing plumbing: redact digit runs (the stand-in for
    email/phone/SSN patterns — same regexp_replace codegen path, zero
    Python) and report bytes removed; digest keeps the oracle row
    small. Pattern restricted to the RE2 ∩ Java-regex dialect so both
    engines replace identically."""
    d = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(F.col("text"), "[0-9]+", "#")
    stripped = F.regexp_replace(F.col("text"), "[0-9]+", "")
    return d.select(
        "doc_id",
        F.md5(redacted).alias("redacted_digest"),
        (F.length("text") - F.length(stripped)).cast("int").alias("digits_removed"),
    )


@query(
    "mixture_resample_by_source",
    oracle=f"""
WITH tagged AS (
  SELECT doc_id, source, {_NIB2_DUCK} AS nib FROM documents
), kept AS (
  SELECT doc_id, source FROM tagged
  WHERE nib < CASE
    WHEN source LIKE 'web%'  THEN 4   -- web: keep 4/16
    WHEN source LIKE 'wiki%' THEN 16  -- wiki: keep all
    ELSE 8                            -- everything else: keep 8/16
  END
)
SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM kept GROUP BY source
""",
)
def mixture_resample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture weighting (the data-mixing knob): each
    source keeps an id-hash fraction — web 4/16, wiki 16/16, rest 8/16.
    Hash-bucket sampling is reproducible across runs/engines/partitions
    (no RNG seeds to coordinate) and composes independently with the
    train/eval split: the split reads the FIRST md5 nibble, this reads
    the SECOND, so within any kept source the eval fraction stays 1/8."""
    d = load_table(spark, sf_dir, "documents")
    keep_bound = (
        F.when(F.col("source").startswith("web"), F.lit(4))
        .when(F.col("source").startswith("wiki"), F.lit(16))
        .otherwise(F.lit(8))
    )
    kept = d.select("doc_id", "source", F.expr(_NIB2).alias("nib")).filter(
        F.col("nib") < keep_bound
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "pack_token_shards_sequential",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, source, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM toks
)
SELECT doc_id, source, n_tokens,
  CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS shard
FROM packed
""",
)
def pack_token_shards_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training shards: docs fill fixed
    2048-token shards sequentially per source (shard = which bin the
    doc STARTS in, from the running token total in doc_id order) — the
    deterministic sharding step before tokenize-and-concat training
    ingestion, reproducible on any engine because order and token
    counts are content-derived, never RNG.

    Scale shape: one hash shuffle on ``source`` and an in-partition
    running sum — no global window, no driver state; at 100 TB each
    source packs independently, and a skewed source can be sub-salted
    by date the same way skew_salted_agg does."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        # NULL text must stay NULL: Spark's size() returns -1 for null
        # input, which would silently shift the running sum for every
        # later doc in the source; the oracle's len(string_split(NULL))
        # is NULL and SUM skips it
        F.when(
            F.col("text").isNull(), F.lit(None).cast("bigint")
        ).otherwise(F.size(F.split("text", " ")).cast("bigint")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.withColumn("cum", F.sum("n_tokens").over(w)).select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / 2048).cast("bigint").alias("shard"),
    )


@query(
    "impute_group_median",
    oracle="""
WITH masked AS (
  SELECT event_id, event_type,
    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
  FROM events
), med AS (
  SELECT event_type, quantile_cont(v, 0.5) AS med FROM masked
  GROUP BY event_type
)
SELECT event_id, masked.event_type,
  coalesce(v, med) AS value_imputed,
  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_missing
FROM masked JOIN med ON masked.event_type = med.event_type
""",
)
def impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation with the per-group exact median — the
    feature-cleaning staple. Missingness is synthesized deterministically
    (event_id % 7) because the testdata has no NULLs; the operator under
    test is the impute itself. Spark `percentile(0.5)` and DuckDB
    `quantile_cont` share the (n−1)·q interpolation law and both ignore
    NULLs, so the imputed doubles are bit-identical.

    Scale: one combinable aggregation into |groups| medians (exact
    percentile shuffles per-group value multisets — for high-cardinality
    groups at 100 TB swap in approx_percentile), then the medians
    broadcast back onto the row stream — no second shuffle of the facts.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    med = ev.groupBy("event_type").agg(F.percentile("v", 0.5).alias("med"))
    return ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        F.coalesce("v", "med").alias("value_imputed"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("was_missing"),
    )


@query(
    "outlier_iqr_by_type",
    oracle="""
WITH q AS (
  SELECT event_type,
    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type, q1, q3,
  CAST(SUM(CASE WHEN e.value < q1 - 1.5 * (q3 - q1)
                  OR e.value > q3 + 1.5 * (q3 - q1)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  COUNT(*) AS n
FROM events e JOIN q ON e.event_type = q.event_type
GROUP BY e.event_type, q1, q3
""",
)
def outlier_iqr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screening per group: values outside
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR]. Both engines evaluate the SAME float
    expression sequence over bit-identical exact quantiles, so the fence
    comparison can never disagree.

    Scale: one aggregation for the quartiles, quartiles broadcast back,
    one combinable count — the facts shuffle once (for the exact
    per-group quantile), stream through the fence check unshuffled.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("q1"),
        F.percentile("value", 0.75).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (
        (F.col("value") < F.col("q1") - F.lit(1.5) * iqr)
        | (F.col("value") > F.col("q3") + F.lit(1.5) * iqr)
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.sum(F.when(out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _weighted_sample_oracle() -> str:
    from polar_spark.functions.dsir import DUCK_H60, _LN_U_DENOM_NANO
    from polar_spark.functions.ln_portable import ln_nano_expr

    h = DUCK_H60.format(arg="doc_id::VARCHAR")
    ln_h1 = ln_nano_expr(f"{h} + 1", "duckdb")
    return f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
    CAST({ln_h1} - {_LN_U_DENOM_NANO} AS DOUBLE) / (n_chars + 1) AS es_key
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_chars,
    ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY es_key DESC, doc_id) AS rn
  FROM keyed
)
SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= 10
"""


@query("weighted_sample_per_source", oracle=_weighted_sample_oracle())
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis 2006): per source, keep the 10 docs with the
    largest u^(1/w) — equivalently the largest ln(u)/w — where u is an
    md5-derived uniform (reproducible across runs AND engines, no RNG
    seed coordination) and w = n_chars + 1 favors longer documents. The
    quality-WEIGHTED counterpart of quota_downsample_per_source's plain
    prefix quota — the standard way to downsample a 100 TB source pool
    toward a target mixture while biasing toward higher-quality docs.

    Scale: one codegen pass computes the key (md5 + one ln, no Python),
    one window per source partition selects the top-10 — same
    single-shuffle shape as any per-group top-k; AQE skew-split covers
    hot sources. With K sources the output is K x 10 rows."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    from polar_spark.functions.dsir import _LN_U_DENOM_NANO
    from polar_spark.functions.ln_portable import ln_nano_expr

    # ln(u) in nano-nats via the portable expression (scale cancels in
    # the per-source ordering; the IEEE divide is engine-identical)
    h_sql = (
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )
    es_key = F.expr(
        f"CAST({ln_nano_expr(f'{h_sql} + 1', 'spark')} - {_LN_U_DENOM_NANO}"
        " AS DOUBLE) / (n_chars + 1)"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("es_key").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("es_key", es_key)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "source",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


def _dsir_scores_oracle() -> str:
    from polar_spark.functions.dsir import dsir_oracle_ctes

    return f"""
WITH {dsir_oracle_ctes()}
SELECT doc_id, lang, n_grams, logw_nano
FROM scored
"""


@query("dsir_importance_scores", oracle=_dsir_scores_oracle())
def dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance weights (Xie et al. 2023, arXiv:2302.03169):
    every document scored by log p_target(x) - log p_raw(x) under
    bag-of-hashed-ngram multinomials, target = the in-pool lang='en'
    subset. The distributional-match counterpart of the CCNet LM's
    fluency score (`lm_bigram_nll_score`): together they are the two
    standard model-based data-selection signals.

    Scale (see functions/dsir.py): one m-bounded (4096-row) bucket
    shuffle, λ/κ broadcast back, per-doc sum completes map-side — the
    corpus never shuffles at token grain; exact-decimal aggregation
    makes the result order-independent and engine-exact.
    """
    from polar_spark.functions.dsir import dsir_log_weights

    # split the single-row-group documents scan across cores: both the
    # model pass and the per-row scoring pass are md5-per-gram CPU work
    # that otherwise runs as ONE task (no-op at real scale)
    d = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    return dsir_log_weights(d, F.col("lang") == "en", m=4096).select(
        "doc_id", "lang", "n_grams", "logw_nano"
    )


def _dsir_select_oracle() -> str:
    from polar_spark.functions.dsir import (
        DUCK_H60,
        dsir_oracle_ctes,
        gumbel_g_nano_sql,
    )

    h = DUCK_H60.format(arg="CAST(doc_id AS VARCHAR)")
    g = gumbel_g_nano_sql("h", "duckdb")
    return f"""
WITH {dsir_oracle_ctes()}, keyed AS (
  SELECT doc_id, lang, logw_nano, logw_nano + {g} AS sel_key_nano
  FROM (SELECT doc_id, lang, logw_nano, {h} AS h FROM scored)
)
SELECT doc_id, lang, sel_key_nano, logw_nano
FROM keyed
ORDER BY sel_key_nano DESC, doc_id
LIMIT 50
"""


@query("dsir_resample_select", oracle=_dsir_select_oracle())
def dsir_resample_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection step: Gumbel-top-k resampling — keep the 50 docs
    with the largest ``logw + Gumbel(md5(doc_id))``, which samples
    without replacement proportionally to the importance weights
    (Gumbel-max trick; deterministic md5-derived noise, reproducible
    across runs AND engines — the nested ln runs all-integer through
    functions/ln_portable.py, see functions/dsir.py).

    Scale: the scoring plan above plus one distributed TakeOrdered
    top-50 — no global sort, no single-partition window.
    """
    from polar_spark.functions.dsir import dsir_log_weights, gumbel_key

    d = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    sc = dsir_log_weights(d, F.col("lang") == "en", m=4096)
    return (
        sc.withColumn("sel_key_nano", gumbel_key("doc_id", F.col("logw_nano")))
        .orderBy(F.col("sel_key_nano").desc(), F.col("doc_id"))
        .limit(50)
        .select("doc_id", "lang", "sel_key_nano", "logw_nano")
    )
