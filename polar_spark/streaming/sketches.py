"""Continuously-maintained sketches: count-min and KMV as foreachBatch
sinks over an epoch-partitioned partial store.

Both sketches are linear/mergeable (count-min: counter addition, Cormode
& Muthukrishnan 2005; KMV: k-smallest-of-union, Bar-Yossef et al. 2002),
so a stream can maintain them incrementally: each micro-batch computes
its own O(sketch)-sized partial and writes it under a stable
``ep=<tag>`` partition of the store — a foreachBatch RETRY overwrites
exactly its own partition (same exactly-once discipline as
streaming/dedup.py), and the live sketch is just the merge of all
stored partials. Merging happens at READ time over O(epochs · sketch)
rows — never the raw stream.

This is the 100 TB shape for continuous cardinality / heavy-hitter
monitoring: the broker ingests at full rate while per-epoch partials
land beside the topic, and any consumer can materialize the
current estimate without a stateful streaming aggregation (no state
store, no watermark coupling — reading the store IS the query).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from polar_spark.functions.sketches import (
    CM_ROWS,
    CM_WIDTH,
    DEFAULT_K,
    _kmv_estimate,
    cm_counters,
    cm_estimate,
    kmv_partial,
)
from polar_spark.streaming.dedup import EpochLedger, epoch_tag
from polar_spark.streaming.ingest import _sink_instance_key


class _EpochPartialSink:
    """Shared machinery: write one partial per epoch, idempotently."""

    def __init__(self, spark: SparkSession, store_path: str):
        self.spark = spark
        self.store_path = store_path
        os.makedirs(store_path, exist_ok=True)
        self._epochs = EpochLedger(store_path)

    def _partial(self, batch_df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def apply_batch(self, batch_df: DataFrame, epoch: int, sink_id: str) -> bool:
        """Apply one micro-batch idempotently; False = already applied
        (foreachBatch retry — store untouched)."""
        key = _sink_instance_key(sink_id)
        last = self._epochs.last(key)
        reset = epoch == 0 and last > 0
        if last >= epoch and not reset:
            return False
        if not batch_df.isEmpty():
            tag = epoch_tag(key, epoch)
            self._partial(batch_df).write.mode("overwrite").parquet(
                os.path.join(self.store_path, f"ep={tag}")
            )
        self._epochs.record(key, epoch, force=reset)
        return True

    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str | None = None,
        trigger_seconds: float | None = None,
    ) -> StreamingQuery:
        cp = checkpoint_dir or os.path.join(self.store_path, "_checkpoint")

        def _sink(batch_df: DataFrame, epoch: int) -> None:
            self.apply_batch(batch_df, epoch, cp)

        writer = stream_df.writeStream.foreachBatch(_sink).option(
            "checkpointLocation", cp
        )
        if trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _stored(self) -> DataFrame | None:
        has = any(
            e.name.startswith("ep=")
            for e in os.scandir(self.store_path)
            if e.is_dir()
        )
        if not has:
            return None
        return self.spark.read.parquet(self.store_path).drop("ep")


class StreamingCountMin(_EpochPartialSink):
    """Count-min sketch maintained per micro-batch: the store holds one
    (cm_row, cm_bucket, cnt) partial per epoch; counters add, so the
    live sketch is a sum over partials (O(epochs · rows · width) read)."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        value_col: str,
        rows: int = CM_ROWS,
        width: int = CM_WIDTH,
    ):
        super().__init__(spark, store_path)
        self.value_col = value_col
        self.rows = rows
        self.width = width

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        return cm_counters(batch_df, self.value_col, self.rows, self.width)

    def counters(self) -> DataFrame:
        stored = self._stored()
        if stored is None:
            return self.spark.createDataFrame(
                [], "cm_row int, cm_bucket bigint, cnt bigint"
            )
        return stored.groupBy("cm_row", "cm_bucket").agg(F.sum("cnt").alias("cnt"))

    def estimate(self, keys: DataFrame, key_col: str) -> DataFrame:
        """Point-query the LIVE sketch — identical to the one-shot batch
        sketch over everything ingested so far (counter linearity)."""
        return cm_estimate(self.counters(), keys, key_col, self.rows, self.width)


class StreamingKMV(_EpochPartialSink):
    """Per-group KMV distinct sketch maintained per micro-batch: each
    epoch stores its groups' ≤ k smallest distinct hashes; the live
    estimate re-selects the k smallest over the union — bit-identical
    to the one-shot sketch (k-smallest-of-union law)."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        keys: list[str],
        value_col: str,
        k: int = DEFAULT_K,
    ):
        super().__init__(spark, store_path)
        self.keys = keys
        self.value_col = value_col
        self.k = k

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        return kmv_partial(batch_df, self.keys, self.value_col, self.k)

    def estimate(self) -> DataFrame:
        stored = self._stored()
        if stored is None:
            schema = ", ".join(f"{c} string" for c in self.keys)
            return self.spark.createDataFrame(
                [], f"{schema}, n_kept bigint, est_distinct double"
            )
        from polar_spark.functions.sketches import _k_smallest_hashes

        return _kmv_estimate(
            _k_smallest_hashes(stored, self.keys, self.k), self.keys, self.k
        )
