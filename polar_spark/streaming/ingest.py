"""Structured-Streaming produce/consume over topic tables.

The reference's ingest loop (HTTP → coalescer → segment writer,
SURVEY.md §3.1) maps onto a streaming query:

    readStream(source) → partition/offset assignment → writeStream
        .format(parquet).partitionBy(partition).trigger(N seconds)

- the micro-batch trigger IS the coalescing window (reference groups
  ≤2 MiB / 100 µs, internal/producing/coalescer.go:138-155);
- the checkpoint WAL replaces the generation/offset consensus;
- DFS replication replaces follower acks;
- `maxFilesPerTrigger` / `maxOffsetsPerTrigger`-style options provide
  the backpressure the reference gets from unbuffered channels
  (internal/producing/coalescer.go:65).

Offset assignment in a streaming batch uses the same tail-ledger law as
the batch producer, applied per micro-batch in ``foreachBatch`` — each
micro-batch is one "coalescer group" with contiguous offsets.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from polar_spark.produce import Producer
from polar_spark.topics import TopicCatalog


def _sink_instance_key(sink_id: str) -> str:
    """Namespace an epoch-ledger key with a per-checkpoint-instance token.

    The ledger outlives the checkpoint: if a user deletes and recreates
    the streaming checkpoint to reprocess, epochs restart at 0, and a
    ledger keyed by path alone would silently skip every replayed batch
    until the epoch passed the old high-water mark. A token stored
    INSIDE the checkpoint dir dies with the checkpoint, so a recreated
    checkpoint gets a fresh ledger namespace and replays apply."""
    if not os.path.isdir(sink_id):
        return sink_id
    tok_path = os.path.join(sink_id, "polar_sink_token")
    try:
        with open(tok_path) as f:
            tok = f.read().strip()
    except FileNotFoundError:
        tok = uuid.uuid4().hex
        tmp = f"{tok_path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            f.write(tok)
        try:
            # O_EXCL-like: if a concurrent sink won, use its token
            os.link(tmp, tok_path)
        except FileExistsError:
            with open(tok_path) as f:
                tok = f.read().strip()
        finally:
            os.unlink(tmp)
    return f"{sink_id}@{tok}"


class StreamingProducer:
    """Continuously ingest a streaming DataFrame into a topic."""

    def __init__(self, catalog: TopicCatalog):
        self.catalog = catalog
        self._producer = Producer(catalog)

    def start(
        self,
        stream_df: DataFrame,
        topic: str,
        key_col: str | None = None,
        value_col: str = "value",
        ts_col: str | None = None,
        checkpoint_dir: str | None = None,
        trigger_seconds: float | None = None,
        arrival_cols: list[str] | None = None,
    ) -> StreamingQuery:
        """``foreachBatch`` produce: every micro-batch appends with
        contiguous offsets via the tail ledger.

        Idempotent against micro-batch retries (the standard
        idempotent-foreachBatch pattern): the applied epoch id is recorded
        per (topic, checkpoint) in the catalog's epoch ledger AFTER the
        produce, and already-applied epochs are skipped on re-invocation.
        Net guarantee is at-least-once — a crash between the produce and
        the epoch record replays that one batch (the reference's produce
        path makes the same trade, docs/benchmarks/README.md:11-12);
        the common retry path (foreachBatch re-run after a checkpoint
        commit failure) deduplicates exactly."""
        cp = checkpoint_dir or f"{self.catalog.topic_dir(topic)}/_checkpoint_ingest"

        def _sink(batch_df: DataFrame, epoch: int) -> None:
            self.apply_batch(
                batch_df, epoch, topic, cp,
                key_col=key_col, value_col=value_col, ts_col=ts_col,
                arrival_cols=arrival_cols,
            )

        writer = stream_df.writeStream.foreachBatch(_sink).option(
            "checkpointLocation", cp
        )
        if trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def apply_batch(
        self,
        batch_df: DataFrame,
        epoch: int,
        topic: str,
        sink_id: str,
        key_col: str | None = None,
        value_col: str = "value",
        ts_col: str | None = None,
        arrival_cols: list[str] | None = None,
    ) -> bool:
        """Apply one micro-batch idempotently; returns False if ``epoch``
        was already applied by ``sink_id`` (the foreachBatch retry path).

        ``sink_id`` naming a checkpoint directory is namespaced with a
        token inside that directory (see :func:`_sink_instance_key`);
        for plain-string sink ids, an epoch REGRESSION to 0 while the
        ledger is far ahead means the caller's stream restarted from
        scratch — apply and overwrite rather than silently skip."""
        key = _sink_instance_key(sink_id)
        last = self.catalog.last_epoch(topic, key)
        reset = epoch == 0 and last > 0  # recreated stream, no token file
        if last >= epoch and not reset:
            return False
        if not batch_df.isEmpty():
            self._producer.produce(
                batch_df, topic, key_col=key_col, value_col=value_col,
                ts_col=ts_col, arrival_cols=arrival_cols,
            )
        self.catalog.record_epoch(topic, key, epoch, force=reset)
        return True


def stream_topic(spark: SparkSession, catalog: TopicCatalog, topic: str) -> DataFrame:
    """readStream over a topic table — the consumer-group long-poll loop
    as a streaming scan (new segment files are discovered per batch, the
    same tailing the reference's segment reader does,
    internal/data/segment_reader.go:106-195)."""
    return catalog.read_stream(topic)


def start_epoch_sink(
    stream_df,
    apply,
    default_checkpoint: str,
    checkpoint_dir: str | None = None,
    trigger_seconds: float | None = None,
):
    """Shared foreachBatch wiring for the epoch-idempotent sinks
    (StreamingNearDup / StreamingSemDedup / streaming sketches): resolve
    the checkpoint (whose path doubles as the sink instance key), wire
    ``apply(batch_df, epoch, checkpoint)``, and trigger availableNow
    unless a processingTime cadence is given — held ONCE so trigger or
    checkpoint-default fixes reach every sink."""
    cp = checkpoint_dir or default_checkpoint

    def _sink(batch_df, epoch: int) -> None:
        apply(batch_df, epoch, cp)

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", cp
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
