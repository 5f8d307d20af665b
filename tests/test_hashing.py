"""Murmur3 H1 parity with the reference's partitioner.

The reference hashes partition keys with the Cassandra-variant Murmur3
x64-128 H1 (internal/types/murmur.go, gocql lineage). Vectors below are
the public test vectors the reference itself asserts
(internal/types/murmur_test.go:80-113) — matching them means a key lands
on the same ring token in both systems.
"""

from __future__ import annotations

from polar_spark.hashing import (
    MIN_TOKEN,
    murmur3_x64_128_h1,
    partition_for_key,
    partition_for_token,
    token_for_key,
)

SERIES = [
    0x0000000000000000,  # ""
    0x2AC9DEBED546A380,  # "0"
    0x649E4EAA7FC1708E,  # "01"
    0xCE68F60D7C353BDB,  # "012"
    0x0F95757CE7F38254,  # "0123"
    0x0F04E459497F3FC1,  # "01234"
    0x88C0A92586BE0A27,  # "012345"
    0x13EB9FB82606F7A6,  # "0123456"
    0x8236039B7387354D,  # "01234567"
    0x4C1E87519FE738BA,  # "012345678"
    0x3F9652AC3EFFEB24,  # "0123456789"
    0x3F33760DED9006C6,  # "01234567890"
    0xAED70A6631854CB1,  # "012345678901"
    0x8A299A8F8E0E2DA7,  # "0123456789012"
    0x624B675C779249A6,  # "01234567890123"
    0xA4B203BB1D90B9A3,  # "012345678901234"
    0xA3293AD698ECB99A,  # "0123456789012345"
    0xBC740023DBD50048,  # "01234567890123456"
    0x3FE5AB9837D25CDD,  # "012345678901234567"
    0x2D0338C1CA87D132,  # "0123456789012345678"
]


def _signed(v: int) -> int:
    return v - 2**64 if v >= 2**63 else v


def test_series_vectors():
    sample = ""
    for i, expected in enumerate(SERIES):
        assert murmur3_x64_128_h1(sample.encode()) == _signed(expected), sample
        sample += str(i % 10)


def test_known_strings():
    assert murmur3_x64_128_h1(b"hello") == _signed(0xCBD8A7B341BD9B02)
    assert murmur3_x64_128_h1(b"hello, world") == _signed(0x342FAC623A5EBC8E)
    assert murmur3_x64_128_h1(b"19 Jan 2038 at 3:14:07 AM") == _signed(
        0xB89E5988B737AFFC
    )
    assert murmur3_x64_128_h1(
        b"The quick brown fox jumps over the lazy dog."
    ) == _signed(0xCD99481F9EE902C9)


def test_cassandra_sign_variant():
    # high-bit bytes exercise the signed-tail behavior of the Cassandra
    # variant (murmur_test.go TestMurmur3H1_CassandraSign)
    key = bytes.fromhex("00104327529fb645dd00b883ec39ae448bb800000400066a6b00")
    assert murmur3_x64_128_h1(key) == -9223371632693506265


def test_xxhash64_spark_parity(spark):
    """Driver-side XXH64 must be bit-identical to Spark's F.xxhash64
    over UTF-8 bytes — it places produce_rows keys on the exact
    partition the distributed partition_col path would."""
    from pyspark.sql import functions as F

    from polar_spark.hashing import partition_for_key_spark, xxhash64_spark

    keys = [
        "", "a", "abc", "hello world", "user_12345",
        "x" * 7, "y" * 8, "z" * 9, "k" * 31, "m" * 32, "n" * 33,
        "p" * 100, "ünïcodé✓", " tail",
        "emoji\U0001f3afkey",
    ]
    rows = (
        spark.createDataFrame([(k,) for k in keys], "k string")
        .select("k", F.xxhash64("k").alias("h"))
        .collect()
    )
    for r in rows:
        assert xxhash64_spark(r["k"].encode("utf-8")) == r["h"], r["k"]
    # pmod law: 0 <= partition < P, matches pmod(h, P)
    for k in keys:
        h = xxhash64_spark(k.encode("utf-8"))
        for p in (1, 3, 12, 64):
            q = partition_for_key_spark(k, p)
            assert 0 <= q < p
            assert q == h % p


def test_filename_offset_range_parse():
    from polar_spark.topics import filename_offset_range

    assert filename_offset_range("off-0-83-part-ab.parquet") == (0, 83)
    assert filename_offset_range("off-1000-1083-part-x.parquet") == (1000, 1083)
    assert filename_offset_range("part-ab.parquet") is None
    assert filename_offset_range("off-x-1-part.parquet") is None
    assert filename_offset_range("off-.parquet") is None


def test_partition_ring_math():
    # MIN_TOKEN lands in partition 0; even subdivision; determinism
    assert partition_for_token(MIN_TOKEN, 12) == 0
    assert partition_for_token(2**63 - 1, 12) == 11
    assert 0 <= partition_for_key("user-42", 12) < 12
    assert partition_for_key("user-42", 12) == partition_for_token(
        token_for_key("user-42"), 12
    )
