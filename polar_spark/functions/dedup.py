"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design (the whole point at 100 TB):
- exact: md5-hash groupBy — one shuffle keyed by digest, map-side combine.
- MinHash-LSH: per-doc signatures via an Arrow-batched Pandas UDF (no
  shuffle), then band-bucket self-join — candidate pairs only ever
  materialize inside a bucket, never O(n²) across the corpus.
- SimHash: per-doc 64-bit signature (Pandas UDF), pairs compared within
  LSH/fingerprint buckets or (small n) directly.
- n-gram Jaccard: exact verification for candidate pairs — explode
  distinct shingles and equi-join, so only pairs sharing ≥1 shingle cost
  anything.

Hash functions are md5-based and byte-identical to the DuckDB oracle SQL
in queries/dedup.py — the UDF path and the SQL path are interchangeable.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

MINHASH_SEEDS = 16
MINHASH_BANDS = 4  # 4 bands × 4 rows: catches Jaccard ≳ 0.7 w.h.p.
SHINGLE_WORDS = 3


def _spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan before CPU-heavy per-row work.

    Small topic tables arrive as a single parquet split → one task → one
    core. At 100 TB the scan already has thousands of splits and this is
    a no-op (no shuffle); locally it buys full-core parallelism for the
    signature computation downstream."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingles_expr(text_col: str, strict: bool = False) -> F.Column:
    """Distinct word 3-gram shingles as a JVM-side array expression
    (whole-stage codegen — no Python worker).

    ``strict=True`` is the MinHash contract: only full 3-word shingles
    (docs with < 3 words yield an empty array and must be filtered);
    ``strict=False`` is the Jaccard contract, which keeps a trailing
    short shingle for sub-3-word docs."""
    words = f"split({text_col}, ' ')"
    if strict:
        # sequence(1, n) with n < 1 counts DOWN — guard short docs to []
        return F.expr(
            f"case when size({words}) >= {SHINGLE_WORDS} then"
            f" array_distinct(transform(sequence(1, size({words}) - {SHINGLE_WORDS - 1}),"
            f"   i -> concat_ws(' ', slice({words}, i, {SHINGLE_WORDS}))))"
            f" else array() end"
        )
    n = f"greatest(size({words}) - {SHINGLE_WORDS - 1}, 1)"
    return F.expr(
        f"array_distinct(transform(sequence(1, {n}),"
        f" i -> concat_ws(' ', slice({words}, i, {SHINGLE_WORDS}))))"
    )


def minhash_sig_expr(shingles_col: str = "shingles") -> F.Column:
    """MinHash signature computed entirely JVM-side: per seed, the min of
    ``substr(md5(seed:shingle), 1, 16)`` over the doc's shingles.

    Byte-identical to :func:`minhash_signature` (the Pandas-UDF form) and
    to the DuckDB oracle — but ~20× faster: md5 + array_min stay inside
    whole-stage codegen, no Arrow transfer, no Python interpreter."""
    return F.expr(
        f"transform(sequence(0, {MINHASH_SEEDS - 1}), seed ->"
        f" array_min(transform({shingles_col}, s ->"
        f"   substring(md5(concat(cast(seed as string), ':', s)), 1, 16))))"
    )


def _minhash_sig(text: str) -> list[str] | None:
    words = text.split(" ")
    if len(words) < SHINGLE_WORDS:
        return None
    shingles = {
        " ".join(words[i : i + SHINGLE_WORDS])
        for i in range(len(words) - SHINGLE_WORDS + 1)
    }
    sig = []
    for seed in range(MINHASH_SEEDS):
        sig.append(
            min(
                hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:16]
                for s in shingles
            )
        )
    return sig


@F.pandas_udf(T.ArrayType(T.StringType()))
def minhash_signature(texts: pd.Series) -> pd.Series:
    """MinHash signature (16 md5-seeded permutations over 3-word
    shingles). Arrow-batched; ~linear in corpus size, no shuffle."""
    return texts.map(_minhash_sig)


def _simhash_bits(text: str) -> str:
    import numpy as np

    counts: dict[str, int] = {}
    for w in text.split(" "):
        counts[w] = counts.get(w, 0) + 1
    if not counts:
        return "0" * 64
    # md5 digest bytes → 64 bits MSB-first == int(hex[:16],16) >> (63-j) & 1
    bits = np.stack(
        [
            np.unpackbits(
                np.frombuffer(hashlib.md5(w.encode()).digest()[:8], dtype=np.uint8)
            )
            for w in counts
        ]
    ).astype(np.int64)
    weights = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    scores = weights @ (2 * bits - 1)
    return "".join("1" if s >= 0 else "0" for s in scores)


@F.pandas_udf(T.StringType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash as a bit-string (word-frequency weighted,
    numpy-vectorized per document)."""
    return texts.map(_simhash_bits)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content digest: every doc mapped to the canonical
    (minimum-id) doc of its md5 group. One shuffle on the digest."""
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("digest"),
    ).withColumn(
        "canonical_id", F.min(id_col).over(Window.partitionBy("digest"))
    )


def lsh_band_keys(df: DataFrame, id_col: str, sig_col: str = "sig") -> DataFrame:
    """Explode a MinHash signature into (band, band_key) rows; the band
    key is the md5 of the band's signature slice."""
    rows = MINHASH_SEEDS // MINHASH_BANDS
    bands = F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1))
    out = df.select(
        F.col(id_col),
        F.explode(bands).alias("band"),
        F.col(sig_col),
    ).select(
        id_col,
        "band",
        F.md5(
            F.concat_ws(
                "|",
                F.col("band").cast("string"),
                F.concat_ws(",", F.slice(F.col(sig_col), F.col("band") * rows + 1, rows)),
            )
        ).alias("band_key"),
    )
    return out


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sig) MinHash signatures, computed JVM-side (codegen md5 over
    shingle arrays — no Python worker in the hot path)."""
    return (
        _spread(df.select(id_col, text_col))
        .select(F.col(id_col), shingles_expr(text_col, strict=True).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .select(id_col, minhash_sig_expr("shingles").alias("sig"))
    )


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs (id_a < id_b).

    Only rows sharing a band bucket join — the self-join is keyed on
    (band, band_key), so shuffle volume is O(n·bands), not O(n²)."""
    sigs = minhash_signatures(df, id_col, text_col)
    keys = lsh_band_keys(sigs, id_col)
    a = keys.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = keys.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exploded (id, shingle) table of distinct word n-gram shingles."""
    shingle_expr = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(split({text_col},' ')) - {SHINGLE_WORDS - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split({text_col},' '), i, {SHINGLE_WORDS}))))"
    )
    return df.select(F.col(id_col).alias("id"), shingle_expr.alias("shingles")).select(
        "id", F.explode("shingles").alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing a shingle.

    explode(distinct shingles) → equi-join on shingle → per-pair
    intersection counts → |A∪B| from per-doc sizes. Non-overlapping
    pairs never materialize."""
    sh = shingle_table(df, id_col, text_col)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Blocked-LSH candidate generation (pigeonhole guarantee): the 64-bit
    signature is split into ``max_hamming + 1`` blocks — any pair within
    ``max_hamming`` differing bits agrees on at least one whole block, so
    joining on (block_idx, block_bits) finds every qualifying pair while
    only same-block rows ever shuffle together (never O(n²)). Exact
    Hamming is then verified with two 32-bit ``bit_count(xor)`` ops —
    integer XOR, not per-character comparison."""
    n_blocks = max_hamming + 1
    base = 64 // n_blocks
    rem = 64 % n_blocks
    # block b covers [start_b, start_b + len_b): first `rem` blocks one wider
    bounds = []
    pos = 1
    for b_idx in range(n_blocks):
        ln = base + (1 if b_idx < rem else 0)
        bounds.append((pos, ln))
        pos += ln

    sims = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim")
    ).select(
        "id",
        "sim",
        F.expr("cast(conv(substring(sim, 1, 32), 2, 10) as bigint)").alias("h1"),
        F.expr("cast(conv(substring(sim, 33, 32), 2, 10) as bigint)").alias("h2"),
    )
    blocks = sims.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.substring("sim", start, ln).alias("key"),
                    )
                    for i, (start, ln) in enumerate(bounds)
                ]
            )
        ).alias("b"),
    ).select("id", "b.blk", "b.key")

    a = blocks.select(F.col("id").alias("id_a"), "blk", "key")
    b = blocks.select(F.col("id").alias("id_b"), "blk", "key")
    cands = (
        a.join(b, ["blk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sims.select(
        F.col("id").alias("id_a"), F.col("h1").alias("h1a"), F.col("h2").alias("h2a")
    )
    sb = sims.select(
        F.col("id").alias("id_b"), F.col("h1").alias("h1b"), F.col("h2").alias("h2b")
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.bit_count(F.col("h1a").bitwiseXOR(F.col("h1b")))
                + F.bit_count(F.col("h2a").bitwiseXOR(F.col("h2b")))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def verified_near_dups(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.7
) -> DataFrame:
    """The scale-path dedup pipeline: MinHash-LSH candidates, then exact
    Jaccard computed ONLY for candidate pairs (never all-pairs).

    At 100 TB: signatures are linear scans; the band join shuffles
    O(n·bands) keys; verification joins the shingle table onto the
    (small) candidate set — total cost is driven by the true near-dup
    density, not the corpus square."""
    cands = lsh_candidate_pairs(df, id_col, text_col)
    sh = shingle_table(df, id_col, text_col)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("_idb"), F.col("shingle").alias("shingle_b"))
    inter = (
        cands.join(a, "id_a")
        .join(
            b,
            (F.col("id_b") == F.col("_idb"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
