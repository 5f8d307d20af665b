"""Stage-split profile of dedup_minhash_verified (r13 round-2 target scan).

Times each pipeline stage in isolation with the noop sink (guide §1.4),
at sf0.1 by default (POLAR_ORACLE_SF_DIR overrides), plus an A/B of the
current exploded-shingle verify tail vs an array-intersect kernel, with
a result-equality check so any candidate rewrite is oracle-safe before
it goes anywhere near the query registry.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("POLAR_ORACLE_SF_DIR", "/root/testdata/sf0.1")


def noop_time(df, label, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best:7.3f} s (noop best-of-{runs})")
    return best


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from polar_spark.functions.dedup import (
        SHINGLE_WORDS,
        _spread,
        exact_jaccard_for_pairs,
        lsh_band_keys,
        minhash_signatures_from_shingles,
        shingle_table,
    )
    from polar_spark.session import get_spark
    from polar_spark.sources.tables import load_table

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="minhash_stages", shuffle_partitions=cpus)
    sc = spark.sparkContext

    d = load_table(spark, SF_DIR, "documents")
    print(f"docs: {d.count()} @ {SF_DIR}")

    sc.setJobDescription("stage: shingle explode (uncached)")
    shw = shingle_table(
        _spread(d.select("doc_id", "text")), "doc_id", "text", with_word_count=True
    )
    noop_time(shw, "shingle_table (mapInPandas explode)")

    shw_p = shw.persist(StorageLevel.MEMORY_AND_DISK)
    t0 = time.perf_counter()
    n_sh = shw_p.count()
    print(f"{'persist shingles (count)':45s} {time.perf_counter()-t0:7.3f} s  rows={n_sh}")

    sh = shw_p.select("id", "shingle")
    strict = shw_p.filter(F.col("n_words") >= SHINGLE_WORDS).select("id", "shingle")

    sc.setJobDescription("stage: signatures")
    sigs = minhash_signatures_from_shingles(strict)
    noop_time(sigs, "signatures (md5+16min agg, cached input)")

    sc.setJobDescription("stage: band keys + candidate self-join")
    keys = lsh_band_keys(sigs, "id").persist(StorageLevel.MEMORY_AND_DISK)
    keys.count()
    ka = keys.select(F.col("id").alias("id_a"), "band", "band_key")
    kb = keys.select(F.col("id").alias("id_b"), "band", "band_key")
    cands = (
        ka.join(kb, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    noop_time(cands, "candidates (band self-join + distinct)")
    cands_p = cands.persist(StorageLevel.MEMORY_AND_DISK)
    print(f"{'candidate pairs':45s} {cands_p.count():7d} rows")

    sc.setJobDescription("stage: verify tail (current exploded-join)")
    cur = exact_jaccard_for_pairs(cands_p, sh, 0.7)
    noop_time(cur, "verify: exploded shingle joins (current)")

    sc.setJobDescription("stage: verify tail (array-intersect kernel)")
    arrs = sh.groupBy("id").agg(F.collect_list("shingle").alias("arr"))
    alt = (
        cands_p.join(
            arrs.select(F.col("id").alias("id_a"), F.col("arr").alias("arr_a")),
            "id_a",
        )
        .join(
            arrs.select(F.col("id").alias("id_b"), F.col("arr").alias("arr_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("n_inter"),
            F.size("arr_a").alias("n_a"),
            F.size("arr_b").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= 0.7)
        .select("id_a", "id_b", "jaccard")
    )
    noop_time(alt, "verify: array_intersect kernel (candidate)")

    sc.setJobDescription("equality: current vs array-intersect verify")
    a_rows = {(r.id_a, r.id_b): r.jaccard for r in cur.collect()}
    b_rows = {(r.id_a, r.id_b): r.jaccard for r in alt.collect()}
    same = a_rows == b_rows
    print(f"verify kernels identical: {same}  ({len(a_rows)} vs {len(b_rows)} pairs)")
    if not same:
        extra_a = set(a_rows) - set(b_rows)
        extra_b = set(b_rows) - set(a_rows)
        print("only-current:", list(extra_a)[:5], "only-alt:", list(extra_b)[:5])
        diff = [
            k for k in set(a_rows) & set(b_rows) if a_rows[k] != b_rows[k]
        ]
        print("value-diff:", diff[:5])

    spark.stop()


if __name__ == "__main__":
    main()
