"""Capstone: the full curation pipeline chained end-to-end.

Chains the engine's own operators the way a production training-data
run would — quality gate → duplicated-chunk strip → near-dup keep-list →
deterministic split — and asserts the conservation invariants that make
a curation run auditable: no doc invented, every doc accounted for
(kept XOR dropped) at every stage, chunk/token totals conserved by the
rewrite, and the whole chain expressible as ONE lazy plan (no
collect-and-refeed between stages).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polar_spark.sources.tables import load_table


def test_curation_chain_conserves_documents(spark, sf_dir):
    from polar_spark.functions.dedup import verified_near_dups
    from polar_spark.functions.text import chunk_documents
    from polar_spark.queries.quality import gopher_quality_filter

    docs = load_table(spark, sf_dir, "documents")
    n_in = docs.count()

    # stage 1: quality gate — keep ∪ drop == input, disjoint
    flags = gopher_quality_filter(spark, sf_dir)
    assert flags.count() == n_in
    kept_q = flags.filter(F.col("keep") == 1).select("doc_id")
    n_kept_q = kept_q.count()
    assert 0 < n_kept_q < n_in  # the gate actually separates

    surviving = docs.join(kept_q, "doc_id")

    # stage 2: duplicated-chunk strip over the survivors — every doc
    # stays present; kept chunks never exceed totals; the reassembled
    # word count equals the kept-chunk word sum (nothing invented)
    ch = chunk_documents(surviving, "doc_id", "text", chunk_words=20, overlap=0)
    from pyspark.sql.window import Window

    w = Window.partitionBy("chunk_text")
    flagged = ch.withColumn(
        "_first", F.min(F.struct("doc_id", "chunk_idx")).over(w)
    ).withColumn(
        "_keep",
        (F.col("doc_id") == F.col("_first.doc_id"))
        & (F.col("chunk_idx") == F.col("_first.chunk_idx")),
    )
    stripped = flagged.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "case when _keep then struct(chunk_idx, chunk_text) end)), "
            "x -> x.chunk_text), ' ')"
        ).alias("clean_text"),
        F.sum(F.col("_keep").cast("bigint")).alias("n_kept"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when(F.col("_keep"), F.size(F.split("chunk_text", " "))).otherwise(0)
        ).alias("kept_words"),
    )
    assert stripped.count() == n_kept_q
    bad = stripped.filter(
        (F.col("n_kept") > F.col("n_total"))
        | (F.size(F.split("clean_text", " ")) != F.col("kept_words"))
        # empty clean_text splits to [''] = size 1 with kept_words 0
        & ~((F.col("clean_text") == "") & (F.col("kept_words") == 0))
    )
    assert bad.count() == 0

    # stage 3: near-dup keep-list over the cleaned text — kept ∪ dropped
    # partitions the survivors, and every dropped doc has a LOWER-id
    # verified near-duplicate justifying the drop
    cleaned = stripped.select("doc_id", F.col("clean_text").alias("text"))
    pairs = verified_near_dups(cleaned, "doc_id", "text", threshold=0.7)
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept_final = cleaned.join(drops, "doc_id", "left_anti")
    n_drops = drops.count()
    assert kept_final.count() + n_drops == n_kept_q
    # justification: id_a < id_b for every pair by construction
    assert pairs.filter(F.col("id_a") >= F.col("id_b")).count() == 0

    # stage 4: deterministic split — partitions the final corpus exactly
    split = kept_final.withColumn(
        "bucket",
        F.when(F.pmod(F.xxhash64("doc_id"), F.lit(100)) < 90, "train").otherwise(
            "eval"
        ),
    )
    by_bucket = {
        r["bucket"]: r["n"]
        for r in split.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(by_bucket.values()) == kept_final.count()
    # determinism: same expression, same result
    again = {
        r["bucket"]: r["n"]
        for r in split.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_bucket == again
