"""Stateful-streaming queries: real ``applyInPandasWithState`` jobs run
to completion (availableNow → memory sink) so the driver's batch compare
can oracle-check genuinely streaming state semantics.

The replay is written as ONE sorted parquet file so the run is a single
deterministic micro-batch; the operators themselves are batch-count
agnostic (state carries across batches), which is what the unit tests in
tests/test_streaming.py exercise with multi-batch replays.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polar_spark.queries.registry import query
from polar_spark.queries.streamlike import _PART, _PART_DUCK
from polar_spark.sources.tables import load_table
from polar_spark.streaming.stateful import assign_offsets_stream, dedup_stream

_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _run_stream(src_df: DataFrame, op) -> DataFrame:
    """Replay ``src_df`` through a streaming operator to completion and
    return the materialized result (memory sink)."""
    spark = src_df.sparkSession
    root = tempfile.mkdtemp(prefix="polar_stateful_")
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    try:
        src_df.coalesce(1).sortWithinPartitions("ts", "event_id").write.mode(
            "overwrite"
        ).parquet(root)
        stream = spark.readStream.schema(src_df.schema).parquet(root)
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # memory sink holds the rows; safe to drop the replay dir
        return spark.table(name)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "stateful_dedup_stream",
    oracle="SELECT event_id, ts, user_id, event_type, value FROM events",
)
def stateful_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once redelivery (tail slice re-sent, as after a broker
    failover) pushed through the stateful streaming dedup: every event id
    is emitted exactly once — the output is the original stream."""
    ev = load_table(spark, sf_dir, "events").select(*_COLS)
    redelivered = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    return _run_stream(
        redelivered, lambda s: dedup_stream(s, "event_id", ["ts", "event_id"])
    )


@query(
    "stateful_offset_assign",
    oracle=f"""
SELECT event_id, {_PART_DUCK} AS partition,
  ROW_NUMBER() OVER (PARTITION BY {_PART_DUCK} ORDER BY ts, event_id) - 1 AS offset
FROM events
""",
)
def stateful_offset_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The producer's contiguous per-partition offset ledger as keyed
    streaming state: offsets come out gapless per partition, matching the
    batch ingest law (ingest_partition_offset) exactly."""
    ev = load_table(spark, sf_dir, "events").select(*_COLS)
    src = ev.withColumn("partition", F.expr(_PART).cast("int"))
    out = _run_stream(
        src,
        lambda s: assign_offsets_stream(s, "partition", ["ts", "event_id"]),
    )
    return out.select("event_id", "partition", "offset")


@query(
    "stateful_dedup_builtin",
    oracle="SELECT event_id, ts, user_id, event_type, value FROM events",
)
def stateful_dedup_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in counterpart to stateful_dedup_stream: Spark's
    dropDuplicatesWithinWatermark evicts dedup state once event time
    passes the watermark — same at-least-once-to-effectively-once law,
    engine-managed state lifetime."""
    ev = load_table(spark, sf_dir, "events").select(*_COLS)
    redelivered = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    return _run_stream(
        redelivered,
        lambda s: s.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
            ["event_id"]
        ),
    )
