"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of built-in DataFrame ops (no Python in the
hot path): union the left and right streams tagged by side, sort within
each key by (time, side-priority), and carry the last right-side row
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window. One shuffle on the key — the same shuffle any keyed join needs —
and no range explosion, so it scales linearly at 100 TB where a naive
range-join would be O(n·m) per key.

Semantics: for each left row, the right row with the greatest
``right_ts <= left_ts`` for the same key (ties on ts: the right row with
the greatest tiebreaker wins; right rows at exactly left_ts DO match,
matching pandas ``merge_asof(direction='backward')`` and DuckDB ASOF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows enriched with the nearest right row per
    ``on`` key — ``direction="backward"`` (default) takes the latest
    right row at-or-before the left timestamp; ``"forward"`` takes the
    earliest right row at-or-after it (pandas ``merge_asof`` directions;
    both include exact-timestamp matches). Forward is the same one-
    shuffle carry-forward plan with the scan order mirrored (time
    descending), so the scale shape is identical.

    ``right_cols``: right columns to carry (default: all but key/ts).
    ``tiebreak``: right column ordering ties on equal right_ts —
    backward keeps the greatest, forward the smallest (the "nearest"
    row from each side of the tie).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rhs_struct = F.struct(*[F.col(c) for c in [right_ts, *right_cols]])
    rhs = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left.columns if c != on],
            rhs_struct.alias("_r"),
        )
        .withColumn("_side", F.lit(0))
    )
    lhs = lhs.withColumn("_r", F.lit(None).cast(rhs.schema["_r"].dataType))

    cols = [on, "_ts", "_side", "_r"] + [c for c in left.columns if c != on]
    unioned = lhs.select(cols).unionByName(rhs.select(cols))

    ts_ord = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    order = [ts_ord, F.col("_side")]
    if tiebreak is not None:
        # equal right_ts ties: the last-seen right row in scan order wins,
        # so sort the tiebreak ascending (backward → greatest wins) or
        # descending (forward → smallest wins)
        tb = F.col(f"_r.{tiebreak}")
        order = [ts_ord, F.col("_side"), tb if direction == "backward" else tb.desc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = joined.filter(F.col("_side") == 1).select(
        on,
        *[c for c in left.columns if c != on],
        *[F.col(f"_match.{c}").alias(f"right_{c}") for c in [right_ts, *right_cols]],
    )
    return out
