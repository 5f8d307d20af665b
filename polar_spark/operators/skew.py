"""Skew-handling operators: salted join and two-phase salted aggregation.

AQE's skew-join splitting (on by default in session.py) handles most hot
keys at runtime, but only where it has shuffle statistics; salting is the
declarative fallback for the cases it can't reach — streaming joins,
skew appearing at the FIRST shuffle, or aggregations whose single hot
key saturates one reducer. Both operators are result-identical to their
unsalted forms (and oracle-checked as such in queries/skew.py).

Mechanics at 100 TB:
- salted_join: the big side gets a deterministic row-content salt in
  [0, salt); the small side replicates salt×; the join key becomes
  (keys…, _salt), so one hot key's rows spread over ``salt`` reducers.
  Replication cost is |small|·salt — use for small-to-medium right sides.
- salted_agg: partial aggregate on (keys…, _salt) — map-side combine
  still applies — then final aggregate on keys. A key's traffic fans
  over ``salt`` reducers in phase 1; phase 2 merges ``salt`` rows per
  key. Correct for reassociative aggregates (count/sum/min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def _row_salt(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt from the row's own content (no RNG —
    reproducible plans, oracle-comparable results)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast(
        "int"
    )


# join types for which small-side replication is result-identical: every
# replicated small row either matches (deduped by the equi-key) or is
# dropped. 'right'/'full'/'right_semi'... would surface each UNMATCHED
# small row salt× (the explode survives the outer side) — flip the
# inputs and use the mirrored type instead.
_SALTABLE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi",
                 "leftsemi", "left_anti", "leftanti", "cross"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    salt×. Result-identical to ``big.join(small, on, how)`` for the
    big-side-preserving join types (see ``_SALTABLE_HOW``); raises for
    right/full joins, where unmatched small rows would appear salt×."""
    norm = how.replace("_", "").lower()
    if norm not in {h.replace("_", "") for h in _SALTABLE_HOW}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            "rows would be duplicated salt times; swap the sides and use the "
            "mirrored join type"
        )
    b = big.withColumn("_salt", _row_salt(big, salt))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, [*on, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output column → (function,
    input column) with function in {count, sum, min, max}. Phase 1
    aggregates on (keys…, _salt); phase 2 merges partials per key
    (count merges with sum). Result-identical to a direct groupBy.

    Note ``count`` counts ROWS (COUNT(*) semantics — the input column is
    ignored), not non-null values of the column; use sum(IF(col IS NOT
    NULL, 1, 0)) upstream for COUNT(col)."""
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    bad = [f for f, _ in aggs.values() if f not in merge_fn]
    if bad:
        raise ValueError(f"non-reassociative aggregate(s): {bad}")

    salted = df.withColumn("_salt", _row_salt(df, salt))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(F.lit(1) if fn == "count" else col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (fn, _col) in aggs.items()
        ]
    )
