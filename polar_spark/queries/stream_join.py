"""Stream-stream join query: run two real watermarked streams to
completion and oracle-check against the equivalent batch join — the
complete-replay result of a correctly implemented streaming join is
exactly the batch join."""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polar_spark.queries.registry import query
from polar_spark.sources.tables import load_table
from polar_spark.streaming.joins import stream_stream_join


@query(
    "stream_join_click_purchase",
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
  c.user_id AS user_id, c.ts AS click_ts, p.ts AS purchase_ts
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
""",
)
def stream_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks joined to purchases by the same user within one hour — as
    a REAL watermarked stream-stream join (streaming/joins.py) replayed
    to completion; the result equals the batch join, which is the
    oracle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")

    root = tempfile.mkdtemp(prefix="polar_ssj_")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    try:
        clicks.coalesce(1).write.parquet(root + "/l")
        purchases.coalesce(1).write.parquet(root + "/r")
        ls = spark.readStream.schema(clicks.schema).parquet(root + "/l").select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            "user_id",
        )
        rs = spark.readStream.schema(purchases.schema).parquet(root + "/r").select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("user_id").alias("p_user_id"),
        )
        lss = ls.withColumnRenamed("user_id", "key")
        rss = rs.withColumnRenamed("p_user_id", "key")
        joined = stream_stream_join(
            lss, rss, "key", "click_ts", "purchase_ts",
            within="1 hour", watermark="2 hours",
        )
        out = joined.select(
            "click_id", "purchase_id", lss["key"].alias("user_id"),
            "click_ts", "purchase_ts",
        )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)
    finally:
        shutil.rmtree(root, ignore_errors=True)
