"""Partition-key hashing and token-range placement.

The reference places a record by Murmur3 x64-128 H1 of its partition key
onto an int64 token ring (internal/types/token.go:43-46,49-66;
internal/types/murmur.go). Spark has no node-pinned ownership, so the
engine's *native* placement is simply ``pmod(hash64(key), num_partitions)``
— a shuffle lands the row on the right task. This module provides:

- ``murmur3_x64_128_h1``: a pure-Python implementation of the *public
  domain* MurmurHash3 x64-128 algorithm (Austin Appleby's spec), returning
  the H1 half — byte-compatible with the reference's token function, for
  users who need placement parity when migrating.
- ``token_for_key`` / ``partition_for_token``: ring math — tokens are
  int64; a ring of B brokers × R consumer-ranges has B*R partitions whose
  boundaries are the even subdivision of the int64 space, matching the
  reference's ``GetTokenAtIndex``/``GetPrimaryTokenIndex`` semantics
  (internal/types/token.go:68-76) without reproducing its code.
- ``partition_col``: the Spark-native Column expression used everywhere in
  the engine (JVM-side, codegen'd — no Python in the hot path).
"""

from __future__ import annotations

import struct

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_TOKEN = -(2**63)
RING_SIZE = 2**64


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & 0xFFFFFFFFFFFFFFFF


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    return k


def murmur3_x64_128_h1(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x64-128, H1 half, as signed int64.

    Public-domain algorithm (Austin Appleby, smhasher). The reference uses
    the same H1-of-x64-128 as its ring token (internal/types/murmur.go:41).
    """
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    mask = 0xFFFFFFFFFFFFFFFF
    h1 = seed & mask
    h2 = seed & mask
    length = len(data)
    nblocks = length // 16

    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<qq", data, i * 16)
        k1 &= mask
        k2 &= mask
        k1 = (k1 * c1) & mask
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & mask
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & mask
        h1 = (h1 * 5 + 0x52DCE729) & mask
        k2 = (k2 * c2) & mask
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & mask
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & mask
        h2 = (h2 * 5 + 0x38495AB5) & mask

    # Cassandra-variant tail: each byte is SIGN-EXTENDED to 64 bits before
    # the shift+xor (this is what distinguishes the reference's hash from
    # canonical Murmur3 for bytes >= 0x80)
    tail = data[nblocks * 16 :]
    k1 = 0
    k2 = 0
    tl = len(tail)
    if tl >= 9:
        for i in range(tl - 1, 7, -1):
            b = tail[i] - 256 if tail[i] >= 128 else tail[i]
            k2 ^= (b << (8 * (i - 8))) & mask
        k2 = (k2 * c2) & mask
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & mask
        h2 ^= k2
    if tl > 0:
        for i in range(min(tl, 8) - 1, -1, -1):
            b = tail[i] - 256 if tail[i] >= 128 else tail[i]
            k1 ^= (b << (8 * i)) & mask
        k1 = (k1 * c1) & mask
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & mask
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & mask

    return h1 - RING_SIZE if h1 >= 2**63 else h1


_XXH_M = 0xFFFFFFFFFFFFFFFF
_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5


def xxhash64_spark(data: bytes, seed: int = 42) -> int:
    """XXH64 (Yann Collet's public-domain spec) as signed int64, seed 42
    — BIT-IDENTICAL to Spark's ``F.xxhash64(string_col)`` over the
    UTF-8 bytes (golden-parity-tested in tests/test_hashing.py). This is
    the driver-side twin of :func:`partition_col`: the request-shaped
    produce path (produce_rows — no Spark job) must place a key on
    exactly the partition the distributed path would, or one key's
    records would split across partitions and break per-key order."""
    rot = _rotl64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXH_P1 + _XXH_P2) & _XXH_M
        v2 = (seed + _XXH_P2) & _XXH_M
        v3 = seed & _XXH_M
        v4 = (seed - _XXH_P1) & _XXH_M
        while i <= n - 32:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (rot((v1 + k1 * _XXH_P2) & _XXH_M, 31) * _XXH_P1) & _XXH_M
            v2 = (rot((v2 + k2 * _XXH_P2) & _XXH_M, 31) * _XXH_P1) & _XXH_M
            v3 = (rot((v3 + k3 * _XXH_P2) & _XXH_M, 31) * _XXH_P1) & _XXH_M
            v4 = (rot((v4 + k4 * _XXH_P2) & _XXH_M, 31) * _XXH_P1) & _XXH_M
            i += 32
        h = (rot(v1, 1) + rot(v2, 7) + rot(v3, 12) + rot(v4, 18)) & _XXH_M
        for v in (v1, v2, v3, v4):
            h ^= (rot((v * _XXH_P2) & _XXH_M, 31) * _XXH_P1) & _XXH_M
            h = (h * _XXH_P1 + _XXH_P4) & _XXH_M
    else:
        h = (seed + _XXH_P5) & _XXH_M
    h = (h + n) & _XXH_M
    while i <= n - 8:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= (rot((k * _XXH_P2) & _XXH_M, 31) * _XXH_P1) & _XXH_M
        h = (rot(h, 27) * _XXH_P1 + _XXH_P4) & _XXH_M
        i += 8
    if i <= n - 4:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _XXH_P1) & _XXH_M
        h = (rot(h, 23) * _XXH_P2 + _XXH_P3) & _XXH_M
        i += 4
    while i < n:
        h ^= (data[i] * _XXH_P5) & _XXH_M
        h = (rot(h, 11) * _XXH_P1) & _XXH_M
        i += 1
    h ^= h >> 33
    h = (h * _XXH_P2) & _XXH_M
    h ^= h >> 29
    h = (h * _XXH_P3) & _XXH_M
    h ^= h >> 32
    return h - RING_SIZE if h >= 2**63 else h


def partition_for_key_spark(key: str, num_partitions: int) -> int:
    """Driver-side ``pmod(xxhash64(key), P)`` — the exact placement
    :func:`partition_col` computes JVM-side, for the no-Spark-job
    produce path."""
    return xxhash64_spark(key.encode("utf-8")) % num_partitions


def token_for_key(key: str) -> int:
    """Partition key → int64 ring token (reference HashToken semantics)."""
    return murmur3_x64_128_h1(key.encode("utf-8"))


def partition_for_token(token: int, num_partitions: int) -> int:
    """Even subdivision of the int64 ring into ``num_partitions`` ranges.

    Matches the reference's broker×rangeIndex placement concept
    (internal/types/token.go:49-76): partition i owns tokens in
    ``[MIN_TOKEN + i*W, MIN_TOKEN + (i+1)*W)`` with W = 2^64/P.
    """
    width = RING_SIZE // num_partitions
    idx = (token - MIN_TOKEN) // width
    return min(int(idx), num_partitions - 1)


def partition_for_key(key: str, num_partitions: int) -> int:
    return partition_for_token(token_for_key(key), num_partitions)


def partition_col(key: Column, num_partitions: int) -> Column:
    """Spark-native partition assignment: ``pmod(xxhash64(key), P)``.

    JVM-side and codegen'd — this is the hot-path placement. NULL keys get
    a round-robin-ish spread via a random partition (reference: keyless
    messages are placed without ordering guarantees,
    internal/discovery/discoverer.go:370-380); here NULL hashes to
    partition ``pmod(xxhash64(NULL-substitute), P)`` = deterministic 0
    bucket is avoided by hashing a monotonic id when key is null upstream.
    """
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(num_partitions)).cast("int")
