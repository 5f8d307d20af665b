"""Text-analysis queries over `documents` (LLM-pipeline surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polar_spark.functions.retrieval import bm25_topk
from polar_spark.functions.text import (
    EN_STOPWORDS,
    TOKEN_PATTERN,
    doc_fingerprint,
    lang_id,
    token_count_regex,
)
from polar_spark.queries.registry import query
from polar_spark.sources.tables import load_table, parallelize_small_scan

_SW = ", ".join(f"'{s}'" for s in EN_STOPWORDS)


@query(
    "text_quality_stats",
    oracle="""
SELECT doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_distinct,
  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
    / len(string_split(text, ' ')) AS ttr,
  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
    / len(string_split(text, ' ')) AS mean_token_len
FROM documents
""",
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features: token count, type-token ratio, mean
    token length (functions/text.py quality_stats)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
        (
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size(toks)
        ).alias("mean_token_len"),
    )


@query(
    "token_count_bpe_ish",
    oracle=f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_subword_tokens
FROM documents
""",
)
def token_count_bpe_ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization count (letter runs / digit runs /
    punctuation) — the token-budget estimator of a data pipeline."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", token_count_regex("text").cast("bigint").alias("n_subword_tokens")
    )


@query(
    "lang_id_heuristic",
    oracle=f"""
SELECT doc_id, lang,
  CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_SW}))) AS DOUBLE)
            / len(string_split(text, ' ')) > 0.04
       THEN 'en' ELSE 'other' END AS pred_lang
FROM documents
""",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language ID (functions/text.py lang_id)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id("text").alias("pred_lang"))


@query(
    "doc_fingerprint_rolling",
    oracle="""
SELECT doc_id,
  list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                          i -> md5(substr(text, i, 8)))) AS fingerprint
FROM documents
""",
)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash (winnowing-style) content fingerprint: min md5 over
    all 8-char shingles."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


@query(
    "sketch_kmv_distinct_users",
    oracle="""
WITH h AS (
  SELECT DISTINCT event_type,
    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16),
      i -> CAST(strpos('0123456789abcdef', substr(md5(user_id::VARCHAR), i, 1)) - 1 AS BIGINT))),
      (acc, d) -> acc * 16 + d) AS hv
  FROM events
), mins AS (
  SELECT event_type, hv,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
), agg AS (
  SELECT event_type, COUNT(*) AS n_kept, MAX(hv) AS h_k
  FROM mins WHERE rn <= 64 GROUP BY event_type
)
SELECT event_type, CAST(n_kept AS BIGINT) AS n_kept,
  CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
       ELSE 63.0 / (h_k / 1152921504606846976.0) END AS est_distinct
FROM agg
""",
)
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketch per event_type (functions/sketches.py):
    deterministic md5-hash k-minimum-values — same O(k) summary size as
    HLL, directly order-statistics-interpretable."""
    from polar_spark.functions.sketches import kmv_distinct

    ev = load_table(spark, sf_dir, "events")
    return kmv_distinct(ev, ["event_type"], "user_id", k=64)


def _hll_oracle() -> str:
    from polar_spark.functions.sketches import hll_oracle_sql

    return hll_oracle_sql()


@query("sketch_hll_distinct_users", oracle=_hll_oracle())
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event_type (Flajolet et
    al. 2007), all-integer: md5-derived 60-bit hash → m=64 registers
    (max leading-zero rank, a comparison ladder — no float log2), and
    the raw estimator as a 2^CAP-scaled exact integer harmonic sum —
    so the DuckDB oracle equality is bit-exact, not approximate.

    Scale: map-side combine collapses each task to ≤ m rows per group
    before the ONE register shuffle — O(groups · m) exchanged bytes no
    matter how many raw events; the per-group estimate is a second
    O(groups · m) aggregation. The idempotent max-merge (unlike KMV's
    k-smallest or count-min's addition) is what makes this the sketch
    for at-least-once pipelines — see sketch_hll_stream_vs_batch."""
    from polar_spark.functions.sketches import hll_distinct

    ev = load_table(spark, sf_dir, "events")
    return hll_distinct(ev, ["event_type"], "user_id")


def _hll_oracle_1024() -> str:
    from polar_spark.functions.sketches import hll_oracle_sql

    return hll_oracle_sql(m=1024)


@query("sketch_hll_m1024_distinct_users", oracle=_hll_oracle_1024())
def sketch_hll_m1024_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PRODUCTION-sized HLL: same sketch as sketch_hll_distinct_users
    at m=1024 registers (±3.2% standard error vs ±13% at the m=64
    law-proof size — reference-class pipelines run 2^10..2^14). m is a
    parameter since r9; this registry entry pins the non-default-m path
    — including the DECIMAL(38,0)/HUGEINT exact estimator the larger
    numerator needs — under the same bit-exact DuckDB oracle. Shuffle
    cost is still O(groups · m) after map-side combine; at 2^10
    registers a million-group corpus exchanges ~8 MB per agg."""
    from polar_spark.functions.sketches import hll_distinct

    ev = load_table(spark, sf_dir, "events")
    return hll_distinct(ev, ["event_type"], "user_id", m=1024)


@query(
    "sketch_cm_heavy_hitters",
    oracle="""
WITH js AS (SELECT unnest(range(0, 4)) AS cm_row),
occ AS (
  SELECT cm_row,
    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16),
      i -> CAST(strpos('0123456789abcdef',
                       substr(md5(cm_row::VARCHAR || ':' || event_type), i, 1)) - 1 AS BIGINT))),
      (acc, d) -> (acc * 16 + d) % 64) AS cm_bucket
  FROM events CROSS JOIN js
), counters AS (
  SELECT cm_row, cm_bucket, COUNT(*) AS cnt FROM occ GROUP BY cm_row, cm_bucket
), keys AS (SELECT DISTINCT event_type FROM events),
kb AS (
  SELECT event_type, cm_row,
    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16),
      i -> CAST(strpos('0123456789abcdef',
                       substr(md5(cm_row::VARCHAR || ':' || event_type), i, 1)) - 1 AS BIGINT))),
      (acc, d) -> (acc * 16 + d) % 64) AS cm_bucket
  FROM keys CROSS JOIN js
)
SELECT kb.event_type, MIN(c.cnt) AS est_count
FROM kb JOIN counters c USING (cm_row, cm_bucket)
GROUP BY kb.event_type
""",
)
def sketch_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy-hitter estimates per event_type: the O(rows·width)
    counter table answers point queries with min-over-rows — deterministic
    md5 buckets make the sketch itself oracle-checkable
    (functions/sketches.py)."""
    from polar_spark.functions.sketches import cm_counters, cm_estimate

    ev = load_table(spark, sf_dir, "events")
    counters = cm_counters(ev, "event_type")
    keys = ev.select("event_type").distinct()
    return cm_estimate(counters, keys, "event_type")


@query(
    "pipeline_training_data_prep",
    oracle=f"""
WITH canon AS (
  SELECT doc_id, text,
    MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
  FROM documents
), unique_docs AS (
  SELECT doc_id, text FROM canon WHERE doc_id = canonical_id
), quality AS (
  SELECT doc_id, text FROM unique_docs
  WHERE len(string_split(text, ' ')) >= 30
), labeled AS (
  SELECT doc_id,
    CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_SW}))) AS DOUBLE)
              / len(string_split(text, ' ')) > 0.04
         THEN 'en' ELSE 'other' END AS pred_lang,
    len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tok
  FROM quality
)
SELECT pred_lang, COUNT(*) AS n_docs,
  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM labeled GROUP BY pred_lang
""",
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data prep pipeline, composed from the
    engine's own operators: exact dedup (canonical doc per content
    digest) → quality gate (≥30 words) → language ID → per-language
    token budget. One declarative plan: Catalyst fuses the stages; the
    only shuffles are the dedup window and the final aggregate."""
    from polar_spark.functions.dedup import exact_dedup

    d = load_table(spark, sf_dir, "documents")
    canon = exact_dedup(d, "doc_id", "text").filter(
        F.col("doc_id") == F.col("canonical_id")
    ).select("doc_id")
    unique_docs = d.join(canon, "doc_id")
    quality = unique_docs.filter(F.size(F.split("text", " ")) >= 30)
    labeled = quality.select(
        "doc_id",
        lang_id("text").alias("pred_lang"),
        token_count_regex("text").cast("bigint").alias("n_tok"),
    )
    return labeled.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "chunk_documents_sliding",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS wd FROM documents
), c AS (
  SELECT doc_id, wd,
    unnest(range(0, CASE WHEN len(wd) <= 64 THEN 1
                         ELSE (len(wd) - 65) // 48 + 2 END)) AS chunk_idx
  FROM w
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
  array_to_string(wd[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ') AS chunk_text,
  CAST(len(wd[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS INTEGER) AS n_words
FROM c
""",
)
def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-word windows, 16-word overlap) — the
    standard LLM training-data / RAG preprocessing fan-out
    (functions/text.chunk_documents: pure codegen, no shuffle)."""
    from polar_spark.functions.text import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", chunk_words=64, overlap=16)


@query(
    "text_word_diversity",
    oracle="""
WITH wc AS (
  SELECT doc_id, wd, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents)
  GROUP BY doc_id, wd
)
SELECT doc_id,
  CAST(SUM(cnt) AS BIGINT) AS total_words,
  COUNT(*) AS distinct_words,
  1.0 - CAST(SUM(cnt * cnt) AS DOUBLE) / CAST(SUM(cnt) * SUM(cnt) AS DOUBLE)
    AS simpson
FROM wc GROUP BY doc_id
""",
)
def text_word_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson word-diversity quality score (repetitiveness / boilerplate
    detector) — log-free so it is bit-exact across engines
    (functions/text.word_diversity)."""
    from polar_spark.functions.text import word_diversity

    d = load_table(spark, sf_dir, "documents")
    return word_diversity(d, "doc_id", "text")


@query(
    "text_regexp_extract_stats",
    oracle="""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numbers,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INTEGER) AS n_alpha_runs,
  regexp_extract(text, '([0-9]+)', 1) AS first_number,
  CAST(regexp_matches(text, '[0-9]{2,}') AS INTEGER) AS has_multidigit
FROM documents
""",
)
def text_regexp_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp extraction breadth (extract / extract_all / match test)
    over patterns in the RE2 ∩ Java dialect, all JVM codegen — the
    pattern-mining primitive under PII scanning and format sniffing."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, '[0-9]+', 0)")).alias("n_numbers"),
        F.size(F.expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).alias("n_alpha_runs"),
        F.regexp_extract("text", "([0-9]+)", 1).alias("first_number"),
        F.expr("cast(text rlike '[0-9]{2,}' as int)").alias("has_multidigit"),
    )


@query(
    "text_repetition_stats",
    oracle="""
WITH g AS (
  SELECT doc_id,
    list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
      i -> array_to_string(string_split(text, ' ')[i : i + 2], ' ')) AS grams
  FROM documents
), x AS (
  SELECT doc_id, unnest(grams) AS gram FROM g
), c AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM x GROUP BY doc_id, gram
)
SELECT doc_id,
  CAST(SUM(cnt) AS BIGINT) AS n_grams,
  COUNT(*) AS n_distinct,
  1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS dup_ratio,
  CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_share
FROM c GROUP BY doc_id
""",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repeated-3-gram quality metrics per doc — duplicated
    gram ratio and top-gram share, computed in one shuffle-free
    mapInPandas pass (functions/text.repetition_stats)."""
    from polar_spark.functions.text import repetition_stats

    d = load_table(spark, sf_dir, "documents")
    return repetition_stats(d, "doc_id", "text")


@query(
    "sketch_kmv_merged_months",
    oracle="""
WITH h AS (
  SELECT DISTINCT event_type,
    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 16),
      i -> CAST(strpos('0123456789abcdef', substr(md5(user_id::VARCHAR), i, 1)) - 1 AS BIGINT))),
      (acc, d) -> acc * 16 + d) AS hv
  FROM events
), mins AS (
  SELECT event_type, hv,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
), agg AS (
  SELECT event_type, COUNT(*) AS n_kept, MAX(hv) AS h_k
  FROM mins WHERE rn <= 64 GROUP BY event_type
)
SELECT event_type, CAST(n_kept AS BIGINT) AS n_kept,
  CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
       ELSE 63.0 / (h_k / 1152921504606846976.0) END AS est_distinct
FROM agg
""",
)
def sketch_kmv_merged_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY (the property that matters at 100 TB): build
    per-(event_type, month) KMV partials — the O(k)-per-segment state a
    pipeline persists incrementally — then union-merge them down to
    per-event_type. KMV merge is lossless, so the oracle is simply the
    DIRECT all-time sketch: merged ≡ direct, bit-for-bit
    (functions/sketches.kmv_partial / kmv_merge)."""
    from polar_spark.functions.sketches import kmv_merge, kmv_partial

    ev = load_table(spark, sf_dir, "events").withColumn(
        "month", F.date_trunc("month", "ts")
    )
    partials = kmv_partial(ev, ["event_type", "month"], "user_id", k=64)
    return kmv_merge(partials, ["event_type"], k=64)


@query(
    "bpe_pair_merge_counts",
    oracle="""
WITH w AS (
  SELECT string_split(coalesce(text, ''), ' ') AS wd FROM documents
), p0 AS (
  SELECT wd, unnest(range(1, len(wd))) AS i FROM w
), p AS (
  SELECT wd[i] || ' ' || wd[i + 1] AS pair FROM p0
)
SELECT pair, COUNT(*) AS cnt
FROM p GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20
""",
)
def bpe_pair_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE/WordPiece tokenizer training at corpus
    scale: count adjacent-token pairs and rank the top merge candidates
    (Sennrich et al. 2016 merge rule, word-level granularity here since
    the synthetic corpus is word-salad). Deterministic top-20 (ties by
    pair text).

    Scale: pair generation is pure codegen (transform over the split
    array — one fused map stage, no Python); the count is one hash
    shuffle with map-side partial aggregation (pair cardinality ≪ pair
    occurrences), then TakeOrdered — the exact shape an actual
    tokenizer-training pipeline runs per merge iteration over 100 TB.
    The scan is parallelized first when under-split (one-row-group
    small files scan as one task; no-op at scale — BENCH r5 showed the
    10× run single-threaded, 5.13× ratio, 1.19× after this).
    """
    d = parallelize_small_scan(load_table(spark, sf_dir, "documents")).select(
        F.split(F.coalesce("text", F.lit("")), " ").alias("_w")
    )
    pairs = d.select(
        F.explode(
            F.expr(
                "case when size(_w) < 2 then array() else "
                "transform(sequence(2, size(_w)), "
                "i -> concat(element_at(_w, i - 1), ' ', element_at(_w, i))) end"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(20)
    )


def _bpe_oracle() -> str:
    from polar_spark.functions.bpe import bpe_oracle_sql

    return bpe_oracle_sql(rounds=5)


@query("bpe_train_merges", oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five rounds of character-level BPE tokenizer training (Sennrich
    et al. 2016) over the corpus word-frequency table — the actual merge
    LOOP, completing bpe_pair_merge_counts' single ranking step. Each
    round counts weighted adjacent symbol pairs over the VOCAB table
    (never the corpus), takes the deterministic argmax (ties by pair
    text), and applies the merge with the classic left-to-right
    non-overlapping greedy scan (literal replace — identical semantics
    in Spark, DuckDB and Python str.replace, so the fixed-round run is
    value-hash checkable like the other iterative quantized operators).

    Scale: one corpus pass builds word frequencies; all R training
    rounds run over the Heaps-law vocabulary with map-side-combined
    pair counts and a TakeOrdered(1) argmax — one merge row to the
    driver per round, the kmeans bounded-collect discipline. This is
    the shape that makes tokenizer training feasible at 100 TB."""
    from polar_spark.functions.bpe import bpe_train, word_freq_table

    d = parallelize_small_scan(load_table(spark, sf_dir, "documents"))
    return bpe_train(word_freq_table(d), rounds=5)


def _bpe_encode_oracle() -> str:
    from polar_spark.functions.bpe import bpe_encode_oracle_sql

    return bpe_encode_oracle_sql(rounds=5, topk=30)


@query("bpe_encode_tokens", oracle=_bpe_encode_oracle())
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer APPLICATION half of the BPE story: encode the
    corpus vocabulary with the 5 merges `bpe_train_merges` learned and
    rank the resulting token frequencies (top-30, ties by token). Each
    merge applies as one narrow literal-replace map — all R merges fuse
    into a single codegen stage with ZERO shuffles, so encoding runs at
    scan speed over 100 TB; only the final token count aggregates
    (map-side combined over the vocab table)."""
    from polar_spark.functions.bpe import (
        bpe_encode,
        bpe_merges_for_encode,
        word_freq_table,
    )

    d = parallelize_small_scan(load_table(spark, sf_dir, "documents"))
    words = word_freq_table(d)
    # train-once-apply-everywhere: the merge list is memoized per
    # (session, corpus plan), so encode doesn't re-pay the training
    # loop a training query already ran (bpe.py:bpe_merges_for_encode)
    merges = bpe_merges_for_encode(words, rounds=5)
    return (
        bpe_encode(words, merges)
        .select(F.explode(F.split("sym", " ")).alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(30)
    )


@query(
    "tfidf_top_terms_per_source",
    oracle="""
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(coalesce(text, ''), ' ')) AS term
  FROM documents
), tf AS (
  SELECT source, term, COUNT(*) AS tf FROM tok GROUP BY source, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT source, tf.term, tf, df,
    CAST(tf * n_docs AS DOUBLE) / df AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       score, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY score DESC, term) AS rnk
  FROM scored
) t WHERE rnk <= 5
""",
)
def tfidf_top_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF distinctive terms: the 5 terms most characteristic of each
    source, scored tf·N/df (one IEEE division of exact integers — both
    engines produce bit-identical doubles, unlike a log-idf whose libm
    could differ in the last bit).

    Scale: explode → (source, term) count with map-side combine; df is a
    (doc, term)-distinct then term count — vocabulary-sized, so the
    df⋈tf join is a hash join on term (NOT broadcast: at 100 TB the
    vocabulary is large); N is a 1-row broadcast. Top-5 per source via
    window over the source-term aggregate (already small). The scan is
    parallelized first when under-split (one-row-group small files scan
    as one task; no-op at scale — BENCH r5 ratio 4.13× was a single-
    threaded 10× run).
    """
    d = load_table(spark, sf_dir, "documents")
    # widen only the tokenize branch: the N aggregate below scans d
    # without per-row CPU work and needs no exchange
    tok = parallelize_small_scan(d).select(
        "doc_id",
        "source",
        F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("term"),
    )
    tf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df: the (doc, term)-dedup runs INSIDE the scan task via
    # array_distinct (docs carry unique doc_ids, so per-row dedup ≡ the
    # global (doc_id, term) distinct), leaving one vocabulary-bounded
    # map-side-combined count — the r13 rework of distinct → groupBy,
    # which paid a full token-stream shuffle for the dedup (guide §2.3)
    df_ = (
        parallelize_small_scan(d)
        .select(
            F.explode(
                F.array_distinct(F.split(F.coalesce("text", F.lit("")), " "))
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # N as a lazy 1-row broadcast cross join (the oracle's CROSS JOIN n):
    # an eager d.count() here would run a hidden full-scan job at plan-
    # construction time, invisible to the plan audit
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(df_, "term").crossJoin(F.broadcast(n)).select(
        "source",
        "term",
        "tf",
        "df",
        ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "term", "tf", "df", "score", "rnk")
    )


# The three-term ranked-retrieval probe for bm25_topk_docs. Literals by
# design: a search REQUEST is a constant from the engine's viewpoint, so
# the per-term tf/df machinery is conditional aggregation over a
# pushed-down `term IN (...)` filter — the plan a real query-serving
# path wants at 100 TB (posting traversal, not corpus re-scan).
BM25_TERMS = ("dup", "vector", "join")
_BM25_ORACLE_TERM = """
    (n_docs - df{i} + CAST(0.5 AS DOUBLE)) / (df{i} + CAST(0.5 AS DOUBLE))
      * tf{i} * CAST(2.2 AS DOUBLE)
      / (tf{i} + CAST(1.2 AS DOUBLE)
         * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * ndl)) AS s{i}"""


BM25_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), corp AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tok FROM dl
), qtf AS (
  SELECT doc_id,
    COUNT(*) FILTER (term = 'dup')    AS tf1,
    COUNT(*) FILTER (term = 'vector') AS tf2,
    COUNT(*) FILTER (term = 'join')   AS tf3
  FROM tok WHERE term IN ('dup', 'vector', 'join') GROUP BY doc_id
), dfs AS (
  SELECT
    COUNT(*) FILTER (tf1 > 0) AS df1,
    COUNT(*) FILTER (tf2 > 0) AS df2,
    COUNT(*) FILTER (tf3 > 0) AS df3
  FROM qtf
), base AS (
  SELECT q.doc_id, tf1, tf2, tf3, df1, df2, df3, n_docs,
    CAST(dl.dl AS DOUBLE)
      / (CAST(corp.total_tok AS DOUBLE) / corp.n_docs) AS ndl
  FROM qtf q JOIN dl ON q.doc_id = dl.doc_id CROSS JOIN corp CROSS JOIN dfs
), scored AS (
  SELECT doc_id, tf1, tf2, tf3,{t1},{t2},{t3}
  FROM base
)
SELECT doc_id, CAST(tf1 AS BIGINT) AS tf1, CAST(tf2 AS BIGINT) AS tf2,
       CAST(tf3 AS BIGINT) AS tf3, s1 + s2 + s3 AS score
FROM scored ORDER BY score DESC, doc_id LIMIT 10
""".format(
    t1=_BM25_ORACLE_TERM.format(i=1),
    t2=_BM25_ORACLE_TERM.format(i=2),
    t3=_BM25_ORACLE_TERM.format(i=3),
)


@query("bm25_topk_docs", oracle=BM25_ORACLE)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: top-10 documents for a fixed three-term
    query (Robertson/Sparck Jones probabilistic ranking — the scoring
    the RETRO/REALM-style retrieval stages of a training pipeline run).
    Log-free idf variant: idf = (N - df + 0.5)/(df + 0.5), the raw
    Robertson odds ratio WITHOUT the log wrap — every arithmetic op is
    then IEEE +,-,*,/ on exact integer inputs, bit-identical across
    engines (libm's log is not correctly rounded; same choice as
    tfidf_top_terms_per_source above). k1 = 1.2, b = 0.75, and the
    per-term partials sum in FIXED textual order s1 + s2 + s3 — never a
    float SUM() whose accumulation order the engine owns.

    Scale: the `term IN (query)` filter cuts the posting stream to the
    query's terms BEFORE any shuffle (tf per (doc, term-slot) is one
    conditional-agg groupBy over that trickle); dl is the only full-
    corpus aggregate (one count per doc, map-side combined); N/avgdl
    and the three dfs are 1-row broadcasts. Top-10 is TakeOrdered —
    no global sort. At 100 TB the dl aggregate is the cost; a serving
    deployment materializes it once (it is query-independent) exactly
    like the IVF cell store, leaving per-query cost proportional to the
    posting lists of the query terms alone.
    """
    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(parallelize_small_scan(d), BM25_TERMS, k=10)
