"""Streaming windowed aggregation with watermarks.

The reference stores a per-record timestamp but never aggregates on it
(SURVEY.md §2.2 — no event-time semantics); these operators are the
capability superset our engine adds: tumbling/sliding/session windows
with late-data handling via watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation.

    Watermark bounds state: rows later than ``watermark`` behind the max
    seen event time are dropped and their windows finalized — state per
    key is O(windows in flight), safe at any scale.
    """
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    keys = [win.alias("w"), *(group_cols or [])]
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("decimal(25,4)")).alias("sum_value"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(group_cols or []),
            *[c for c in ("n", "sum_value") if value_col is not None or c == "n"],
        )
    )


def session_aggregate(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming session windows via ``F.session_window`` — merged
    dynamically as events arrive; watermark finalizes closed sessions.
    (Batch equivalent: operators/sessionize.py lag+cumsum.)"""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
