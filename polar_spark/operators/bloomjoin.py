"""Bloom-prefiltered semi join.

The 100 TB problem: a semi join whose build side is too large to
BROADCAST (tens of millions of keys) forces a full shuffle of the fact
side — at 100 TB the shuffle of the ~99% of fact rows that will NOT
match dominates the job. The classic fix (Spark's own AQE runtime row
filter, Trino's dynamic filtering) is to ship a compact Bloom filter of
the build keys to every fact-side task and drop non-matching rows
BEFORE the exchange, then run the exact join only over survivors:

    fact rows shuffled = matches + false positives   (vs. all rows)

This module is the explicit, composable form of that pattern:

- :func:`build_bloom` aggregates the filter distributedly — one
  ``mapInPandas`` pass emits a per-partition bitmap (numpy, vectorized
  splitmix64 double hashing), OR-reduced on the driver. Driver traffic
  is O(partitions · m/8) bytes (a 1 Mbit filter is 128 KiB per
  partition), never O(keys).
- :func:`bloom_contains` is an Arrow-vectorized membership test against
  the broadcast bitmap (numpy bit indexing per batch; no per-row
  Python).
- :func:`bloom_semi_join` composes them: prefilter, then the exact
  ``leftsemi`` join to remove false positives — the result is EXACTLY
  the semi join, the bloom only cuts shuffle volume.

Sizing: m_bits ≈ 14.4·n keys gives ~1e-3 FP at k=7; default 1 Mbit
handles ~70k keys. At real scale pass m_bits ~ 16·|keys|.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 7

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) — the
    same mix on build and probe sides keeps the filter exact."""
    x = (x + _GOLDEN).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing:
    h_i = h1 + i·h2 (two mixes total, any k)."""
    with np.errstate(over="ignore"):
        h1 = _splitmix64(keys.astype(np.uint64))
        h2 = _splitmix64(h1) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
            np.int64
        )


def build_bloom(
    df: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> bytes:
    """Aggregate a Bloom bitmap over an int64 key column.

    One narrow pass: each partition reduces its keys into a local m-bit
    numpy bitmap and emits it as a single binary row; the driver ORs
    O(partitions) bitmaps. No shuffle, no key collect."""
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("bm", T.BinaryType())])
    nbytes = m_bits // 8

    def part_bitmap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for b in batches:
            keys = b[key_col].to_numpy(dtype=np.int64, na_value=0)
            if len(keys) == 0:
                continue
            any_rows = True
            pos = _positions(keys, m_bits, k).ravel()
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = df.select(key_col).mapInPandas(part_bitmap, schema).collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bm"], dtype=np.uint8)
    return out.tobytes()


def bloom_contains(
    bitmap: bytes, key: Column, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> Column:
    """Arrow-vectorized membership test against a (closure-captured,
    task-broadcast) bitmap. May return false positives, never false
    negatives — always pair with an exact join downstream."""
    bm = np.frombuffer(bitmap, dtype=np.uint8)

    @F.pandas_udf(BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        kk = keys.to_numpy(dtype=np.int64, na_value=0)
        if len(kk) == 0:
            return pd.Series([], dtype=bool)
        pos = _positions(kk, m_bits, k)
        bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    return probe(key)


def bloom_semi_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """EXACT ``fact LEFT SEMI JOIN build``, with a Bloom prefilter of the
    fact side ahead of the exchange. Equivalent to the plain semi join
    for any m/k (the exact join scrubs false positives); the bloom is
    purely a shuffle-volume cut, mirroring Spark AQE's
    InjectRuntimeFilter / Trino dynamic filtering as an explicit
    operator."""
    bm = build_bloom(build, build_key, m_bits, k)
    pre = fact.filter(bloom_contains(bm, F.col(fact_key), m_bits, k))
    return pre.join(
        build.select(F.col(build_key).alias(fact_key)).distinct(), fact_key, "leftsemi"
    )
