"""Top-K per group — window row_number, the shuffle-minimal pattern.

At scale this is one hash shuffle on the group key; AQE handles skewed
groups. Deterministic: callers must include a unique tiebreaker in
``order_by``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
