"""Custom PySpark DataSource exposing topic semantics: format "polar".

The one genuine extension point the Spark mapping needs (SURVEY.md §4):
a source that speaks (topic, partition, offset) like the reference's
consumer API. Registered via ``spark.dataSource.register(PolarDataSource)``
and used as::

    spark.read.format("polar")
         .option("root", catalog_root).option("topic", "clicks")
         .option("startingOffsets", "earliest" | '{"0": 100, ...}')
         .load()

    spark.readStream.format("polar")... (micro-batches of newly produced
    records per trigger, tracked by per-partition tail offsets — the
    same offset-cursor law as the reference's segment reader,
    internal/data/segment_reader.go:54-195)

Design notes for scale: the batch reader emits one InputPartition per
topic partition (reader parallelism == topic partitions, like the
reference's consumer-range fan-out) and reads only that partition's
directory with an offset-range row filter applied at the parquet scan
via pyarrow (row-group pruning on offset stats).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TOPIC_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("key", StringType()),
        StructField("value", StringType()),
    ]
)


@dataclass
class _PartitionSlice(InputPartition):
    partition: int
    start_offset: int  # exclusive
    end_offset: int | None  # inclusive; None = tail


def _partition_dir(root: str, topic: str, partition: int) -> str:
    return os.path.join(root, "topics", topic, "data", f"partition={partition}")


def _read_tails(root: str, topic: str) -> dict[int, int]:
    with open(os.path.join(root, "topics", topic, "tails.json")) as f:
        return {int(k): v for k, v in json.load(f).items()}


def _scan_batches(root: str, topic: str, sl: _PartitionSlice):
    """Read one partition's rows in (start, end] offset range as
    ``pyarrow.RecordBatch``es in TOPIC_SCHEMA column order. Parquet
    row-group stats prune files/groups wholly outside the range; the
    data never leaves Arrow — the consume-path analog of the reference's
    zero-copy chunk delivery (internal/consuming/models.go:126-131)."""
    import pyarrow as pa
    import pyarrow.dataset as ds

    d = _partition_dir(root, topic, sl.partition)
    if not os.path.isdir(d):
        return
    dataset = ds.dataset(d, format="parquet")
    flt = ds.field("offset") > sl.start_offset
    if sl.end_offset is not None:
        flt = flt & (ds.field("offset") <= sl.end_offset)
    ts_type = pa.timestamp("us", tz="UTC")
    for batch in dataset.to_batches(
        columns=["topic", "offset", "timestamp", "key", "value"], filter=flt
    ):
        if batch.num_rows == 0:
            continue
        ts = batch.column(2)
        if ts.type != ts_type:
            # stored tz-naive UTC (Spark parquet convention); Spark's
            # arrow ingestion wants an explicit-UTC us-precision column
            ts = ts.cast(pa.timestamp("us")).cast(ts_type)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(0),
                pa.array(
                    __import__("numpy").full(batch.num_rows, sl.partition, "int32")
                ),
                batch.column(1),
                ts,
                batch.column(3),
                batch.column(4),
            ],
            names=["topic", "partition", "offset", "timestamp", "key", "value"],
        )


def _scan_slice(
    root: str, topic: str, sl: _PartitionSlice
) -> Iterator[tuple]:
    """Tuple form of :func:`_scan_batches` for the simple stream reader
    (its wrapper prefetch-caches plain tuples). Conversion is columnar
    ``to_pylist`` (C loop), not per-value ``.as_py()``."""
    utc = __import__("datetime").timezone.utc
    for batch in _scan_batches(root, topic, sl):
        cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
        # arrow tz-aware values come back aware; keep them aware for
        # Spark's Python-source row conversion
        cols[3] = [
            t if t is None or t.tzinfo is not None else t.replace(tzinfo=utc)
            for t in cols[3]
        ]
        yield from zip(*cols)


class PolarBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["root"]
        self.topic = options["topic"]
        starting = options.get("startingoffsets", "earliest")
        tails = _read_tails(self.root, self.topic)
        if starting == "earliest":
            self.committed = dict.fromkeys(tails, -1)
        elif starting == "latest":
            self.committed = dict(tails)
        else:
            explicit = {int(k): int(v) for k, v in json.loads(starting).items()}
            self.committed = {p: explicit.get(p, -1) for p in tails}

    def partitions(self) -> Sequence[InputPartition]:
        # one task per topic partition — the consumer-range fan-out
        return [
            _PartitionSlice(p, self.committed.get(p, -1), None)
            for p in sorted(self.committed)
        ]

    def read(self, partition: _PartitionSlice):
        # vectorized: RecordBatches flow straight into Spark's arrow
        # ingestion — no per-row Python materialization on the scan path
        yield from _scan_batches(self.root, self.topic, partition)


class PolarStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tailing: offsets dict {partition: last_served} — each
    batch serves (prev_tail, current_tail] per partition. The stored
    tails ledger is the source-of-truth cursor (the reference's
    producer.offset file, internal/data/offset_file_writer.go)."""

    def __init__(self, options: dict):
        self.root = options["root"]
        self.topic = options["topic"]
        starting = options.get("startingoffsets", "earliest")
        self._start_latest = starting == "latest"
        # backpressure: total records per micro-batch, split across
        # backlogged partitions proportionally (Kafka-source semantics;
        # the reference bounds in-flight data with unbuffered channels —
        # internal/producing/coalescer.go:65 — this is the pull-side analog).
        # Use with a processingTime trigger: availableNow on a simple
        # Python stream reader runs a single batch, so a cap would
        # truncate the run rather than pace it.
        self._max_offsets = int(options.get("maxoffsetspertrigger", 0)) or None

    def initialOffset(self) -> dict:
        tails = _read_tails(self.root, self.topic)
        if self._start_latest:
            return {str(p): t for p, t in tails.items()}
        return {str(p): -1 for p in tails}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        tails = _read_tails(self.root, self.topic)
        end = {str(p): max(int(t), int(start.get(str(p), -1))) for p, t in tails.items()}
        if self._max_offsets:
            avail = {
                p: end[p] - int(start.get(p, -1))
                for p in end
                if end[p] > int(start.get(p, -1))
            }
            total = sum(avail.values())
            if total > self._max_offsets:
                # proportional split, ≥1 per backlogged partition so no
                # partition starves; deterministic (sorted keys)
                for p in sorted(avail):
                    budget = max(1, self._max_offsets * avail[p] // total)
                    end[p] = int(start.get(p, -1)) + min(avail[p], budget)
        # materialized list: Spark's prefetch cache copy.copy()s this, and a
        # micro-batch is bounded by the produce rate between triggers
        rows: list[tuple] = []
        for p_str, end_off in end.items():
            p = int(p_str)
            s = int(start.get(p_str, -1))
            if end_off > s:
                rows.extend(
                    _scan_slice(self.root, self.topic, _PartitionSlice(p, s, end_off))
                )
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for p_str, end_off in end.items():
            p = int(p_str)
            s = int(start.get(p_str, -1))
            if int(end_off) > s:
                yield from _scan_slice(
                    self.root, self.topic, _PartitionSlice(p, s, int(end_off))
                )

    def commit(self, end: dict) -> None:
        # checkpoint WAL owns progress; nothing broker-side to clean up
        return


class PolarDataSource(DataSource):
    """format("polar") — topic tables with offset semantics."""

    @classmethod
    def name(cls) -> str:
        return "polar"

    def schema(self) -> StructType:
        return TOPIC_SCHEMA

    def reader(self, schema: StructType) -> PolarBatchReader:
        return PolarBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> PolarStreamReader:
        return PolarStreamReader(self.options)


def register(spark, ship_package: bool = True) -> None:
    """Register format("polar"), shipping the polar_spark package to
    executors (zip + addPyFile) so worker processes can deserialize the
    reader regardless of their working directory."""
    if ship_package:
        from polar_spark.session import ensure_driver_session

        ensure_driver_session(spark)
    spark.dataSource.register(PolarDataSource)
