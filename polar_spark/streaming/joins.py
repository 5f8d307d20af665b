"""Watermarked stream-stream joins.

The reference has no join of any kind (SURVEY.md §2.2) — this is part of
the capability superset our engine adds on the streaming core: correlate
two live topics (e.g. clicks with the purchases that follow them) with
bounded state.

Scale mechanics: both sides shuffle on the join key into the state
store; the time-bound condition + watermarks let Spark evict state older
than the join window, so state per key is O(events within the window),
not O(stream). Without the time bound an inner stream-stream join would
buffer both streams forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right events that occur in ``[left_ts, left_ts + within]``
    for the same key. Both sides watermarked so join state is evicted
    once the window can no longer match.

    ``how``: ``inner`` (default) or ``leftOuter`` — the outer variant
    emits unmatched left rows (right columns null) only once the
    watermark passes their join window, i.e. once no future right event
    can still match; this is Spark's state-store-backed outer emission,
    the streaming analog of a left join with bounded regret."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)
