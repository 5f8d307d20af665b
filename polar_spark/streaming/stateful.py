"""Custom stateful streaming operators (``applyInPandasWithState``).

Two operators the built-in streaming aggregates can't express, both tied
to reference semantics:

- :func:`dedup_stream` — the client-side dedup story for the reference's
  at-least-once delivery (docs/benchmarks/README.md:11-12; a consumer may
  re-see chunks after failover, internal/interbroker/replication.go:80-97):
  emit each event id exactly once across micro-batches, with TTL'd state
  so memory is bounded by the redelivery horizon, not the stream length.
- :func:`assign_offsets_stream` — the producer's contiguous per-partition
  offset ledger (internal/producing/coalescer.go:164-170 assigns offsets
  single-threaded per token) re-expressed as keyed state: the offset
  counter per partition survives across micro-batches in the state store.

Scale notes: state is hash-partitioned by the group key across executors
(the state store shuffles only the key column); TTL (processing-time
timeout) caps dedup state at O(events within the redelivery window).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    stream_df: DataFrame,
    id_col: str,
    order_cols: list[str],
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Exactly-once-ification of an at-least-once stream: the first row
    seen per ``id_col`` (ties broken by ``order_cols``) is emitted; any
    redelivery within ``ttl_minutes`` is dropped, then state expires.

    ``ttl_minutes=None`` keeps state forever (NoTimeout) — use that for
    bounded replays (an availableNow run with pending processing-time
    timers only terminates once every timer has fired); set a TTL on
    continuous streams so state is bounded by the redelivery horizon.

    Output schema == input schema (append mode)."""
    out_schema = stream_df.schema
    state_schema = T.StructType([T.StructField("seen", T.LongType())])
    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60 * 1000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:  # already delivered in an earlier batch
            for _ in pdfs:
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            first = batch.sort_values(order_cols, kind="mergesort").head(1)
            state.update((1,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield first

    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return stream_df.groupBy(id_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        timeout,
    )


def assign_offsets_stream(
    stream_df: DataFrame,
    partition_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Contiguous per-partition offset assignment across micro-batches.

    Each partition's next-offset counter lives in the state store (the
    streaming analog of the producer ledger in produce.py): batch rows
    are ordered by ``order_cols`` and stamped ``next .. next+n-1``; the
    counter persists so offsets stay gapless across batches — the
    property the reference gets from its single-writer coalescer.

    Output schema == input schema + ``offset long``."""
    out_schema = T.StructType(
        list(stream_df.schema.fields) + [T.StructField("offset", T.LongType())]
    )
    state_schema = T.StructType([T.StructField("next_offset", T.LongType())])

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (nxt,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(order_cols, kind="mergesort").reset_index(
                drop=True
            )
            batch["offset"] = batch.index.astype("int64") + nxt
            state.update((nxt + len(batch),))
            yield batch

    return stream_df.groupBy(partition_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
