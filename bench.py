"""Benchmark harness: headline queries at sf0.1 (driver contract).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "extra": {...}}

Covers the reference's two data paths (produce → topic table, poll →
consume) measured as throughput over `events`, plus the headline
analytic + LLM-pipeline queries from the oracle-checked surface.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> None:
    from polar_spark.consume import EARLIEST, ConsumerGroup
    from polar_spark.produce import Producer
    from polar_spark.queries import QUERIES
    from polar_spark.session import get_spark
    from polar_spark.sources.tables import load_table
    from polar_spark.topics import TopicCatalog

    spark = get_spark(app_name="polar_spark_bench", shuffle_partitions=CPUS)
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else None)

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # warm the JVM + file listing + Arrow/pandas-UDF worker pool (queries
    # measure steady state, not session cold-start: codegen compile and
    # Python worker spawn are per-session fixed costs, not per-query work)
    load_table(spark, SF_DIR, "lineitem").count()
    from polar_spark.functions.similarity import lsh_bucket, quantize

    load_table(spark, SF_DIR, "embeddings").limit(64).select(
        lsh_bucket(quantize("embedding"), dims=64).alias("b")
    ).count()

    # --- streaming-core paths: produce / consume over `events` ----------
    # Steady-state measurement: the reference's >250k msgs/s keyed-write
    # number comes from a dedicated load tool pushing 2M messages
    # (docs/benchmarks/README.md); a 100k-row single batch is dominated by
    # fixed job overhead, so ingest/consume are measured over a 10×
    # replicated corpus (1M rows at sf0.1) after a JIT/codec warmup.
    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="polar_bench_")
    try:
        cat = TopicCatalog(spark, root)
        prod = Producer(cat)
        ev = load_table(spark, SF_DIR, "events")
        big = (
            ev.withColumn("_rep", F.explode(F.sequence(F.lit(0), F.lit(9))))
            .withColumn("event_id", F.col("event_id") * 10 + F.col("_rep"))
            .drop("_rep")
            .persist()
        )
        n_events = big.count()

        # steady-state warmup: JIT the write path + parquet codec init on a
        # throwaway topic. Two rounds — the first run pays codegen compile,
        # the second catches stragglers.
        for w in range(2):
            prod.produce(
                big.limit(5000), f"warmup{w}",
                key_col="user_id", value_col="props", ts_col="ts",
            )
        gw = ConsumerGroup(cat, "warmup_group")
        gw.register("warmup1", EARLIEST)
        gw.poll("warmup1").df.count()

        t0 = time.perf_counter()
        prod.produce(big, "bench", key_col="user_id", value_col="props", ts_col="ts")
        t_ingest = time.perf_counter() - t0
        timings["ingest_events"] = round(t_ingest, 3)
        extra["ingest_msgs_per_sec"] = round(n_events / t_ingest)

        g = ConsumerGroup(cat, "bench_group")
        g.register("bench", EARLIEST)
        t0 = time.perf_counter()
        res = g.poll("bench")
        n_out = res.df.count()
        t_consume = time.perf_counter() - t0
        timings["consume_events"] = round(t_consume, 3)
        extra["consume_msgs_per_sec"] = round(n_out / t_consume)
        big.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # --- headline analytics + LLM-pipeline queries ----------------------
    headline = [
        "q1_pricing_summary",
        "q3_top_orders_by_revenue",
        "q5_nation_revenue",
        "window_top3_orders_per_customer",
        "asof_purchase_last_click",
        "session_windows_30m",
        "window_tumbling_hourly",
        "ingest_partition_offset",
        "dedup_minhash_verified",
        "dedup_simhash",
        "knn_bruteforce_dot",
        "knn_ivf_probe",
        "embedding_lsh_buckets",
        "dedup_embedding_cosine",
        "text_quality_stats",
        "sketch_kmv_distinct_users",
        "rollup_time_multires",
        "gapfill_hourly_locf",
        "chunk_documents_sliding",
        "contamination_ngram_overlap",
        "split_train_eval_deterministic",
    ]
    for name in headline:
        fn = QUERIES[name].fn
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
