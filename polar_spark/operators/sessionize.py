"""Sessionization: gap-based session assignment over an event stream.

Batch path: lag + cumulative-sum over a per-key window (one shuffle on
the key, state bounded by partition — the standard scalable pattern).
Streaming path: ``F.session_window`` (see streaming/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
    tiebreakers: tuple[str, ...] = (),
) -> DataFrame:
    """Assign a session index per key: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``.

    ``tiebreakers`` must make the per-key ordering total when multiple
    events can share a timestamp — otherwise lag/cumsum order (and hence
    session boundaries) is nondeterministic across runs.
    """
    w = Window.partitionBy(key).orderBy(ts, *tiebreakers)
    prev: Column = F.lag(F.col(ts)).over(w)
    gap_us = F.unix_micros(F.col(ts)) - F.unix_micros(prev)
    new_session = F.when(
        prev.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("_new", new_session).withColumn(
        session_col,
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new")
