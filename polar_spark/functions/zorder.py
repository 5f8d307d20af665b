"""Z-order (Morton) data layout for multi-dimensional file pruning.

The 100 TB problem this solves: parquet min/max statistics prune files
on ONE sort dimension — a corpus laid out by ``user_id`` answers
``user_id BETWEEN …`` with few file reads, but a 2-D box query
(``user_id`` range AND ``value`` range) degenerates to a full scan
because every file's ``value`` range is unconstrained. Interleaving the
bits of both dimensions into a single Morton key and range-partitioning
on IT bounds EVERY file in BOTH dimensions at once — the locality
technique Delta Lake's ``OPTIMIZE ZORDER BY`` and Iceberg's sort orders
ship as a first-class feature, expressed here in exact integer
arithmetic so the layout decision itself is oracle-checkable.

Spark-first mapping: ``df.repartitionByRange(N, z_value(...))`` +
parquet write gives the physical layout (file min/max stats then prune
at scan time via ordinary predicate pushdown); the query surface
(queries/quality.zorder_pruning_stats) demonstrates and VERIFIES the
pruning arithmetic engine-exactly by bucketing on the z-key's top bits
(the bucket ≙ the file) and computing per-bucket min/max envelopes for
both layouts.

All ops are shifts/masks on non-negative bounded ints — exact in Spark,
DuckDB and Python; only the shift spelling differs per dialect
(``shiftright``/``shiftleft`` functions vs ``>>``/``<<`` operators).
"""

from __future__ import annotations


def z_value_sql(x: str, y: str, dialect: str, bits: int = 10) -> str:
    """SQL expression interleaving the low ``bits`` of the non-negative
    integer expressions ``x`` (even positions) and ``y`` (odd positions)
    into a Morton key. ORs become addition — the interleaved bit
    positions are disjoint."""
    if dialect == "spark":
        def shr(e: str, n: int) -> str:
            return f"shiftright({e}, {n})" if n else e

        def shl(e: str, n: int) -> str:
            return f"shiftleft({e}, {n})" if n else e
    elif dialect == "duckdb":
        def shr(e: str, n: int) -> str:
            return f"(({e}) >> {n})" if n else e

        def shl(e: str, n: int) -> str:
            return f"(({e}) << {n})" if n else e
    else:  # pragma: no cover
        raise ValueError(f"unknown dialect {dialect!r}")
    terms = []
    for i in range(bits):
        terms.append(shl(f"({shr(f'({x})', i)} & 1)", 2 * i))
        terms.append(shl(f"({shr(f'({y})', i)} & 1)", 2 * i + 1))
    return "(" + " + ".join(terms) + ")"


def z_value_py(x: int, y: int, bits: int = 10) -> int:
    """Python twin (identical bit interleave)."""
    z = 0
    for i in range(bits):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z
