"""Multimodal-column queries: binary payload + typed metadata surface.

The decode path itself (functions/multimodal.py) is exercised by pytest
(deterministic fake decoder behind the real mapInPandas plumbing); this
oracle-checked query validates the binary column machinery both engines
share: text → bytes, digests, sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polar_spark.queries.registry import query
from polar_spark.sources.tables import load_table


@query(
    "multimodal_blob_meta",
    oracle="""
SELECT doc_id,
  'application/octet-stream' AS mime,
  octet_length(unhex(md5(text))) AS nbytes,
  substr(md5(text), 1, 2) AS head2,
  octet_length(encode(text)) AS payload_bytes
FROM documents
""",
)
def multimodal_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: digest-derived blob, MIME tag,
    byte length of payload — the typed-metadata convention for
    image/audio/video columns."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.unhex(F.md5("text"))).alias("nbytes"),
        F.substring(F.md5("text"), 1, 2).alias("head2"),
        F.octet_length(F.encode("text", "utf-8")).alias("payload_bytes"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
  CAST(unnest(list_filter(range(0, 1 + octet_length(encode(text)) % 61),
                          i -> i % 4 = 0)) AS INTEGER) AS frame_idx,
  substr(md5(doc_id::VARCHAR || ':' ||
             unnest(list_filter(range(0, 1 + octet_length(encode(text)) % 61),
                                i -> i % 4 = 0))::VARCHAR), 1, 16) AS frame_sig
FROM documents
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: each payload fans out to its
    sampled frames inside the Arrow batch (mapInPandas, stub codec —
    functions/multimodal.py)."""
    from polar_spark.functions.multimodal import attach_blob, frame_sample

    d = load_table(spark, sf_dir, "documents")
    blobs = attach_blob(d, "doc_id", "text", mime="video/mp4")
    return frame_sample(blobs, "doc_id", "blob", every_nth=4)


@query(
    "multimodal_resize",
    oracle="""
SELECT doc_id, 224 AS width, 224 AS height,
  md5(text) AS resized_hex, 16 AS resized_nbytes
FROM documents
""",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing: Arrow-batched binary-in/binary-out
    mapInPandas (stub codec — functions/multimodal.py).

    The operator itself emits BINARY (kept, pytest-covered); this
    oracle-checked query hex-encodes the payload so the driver's
    value-hasher can compare it (raw BINARY crashed the round-1
    canonicalizer)."""
    from polar_spark.functions.multimodal import attach_blob, resize_images

    d = load_table(spark, sf_dir, "documents")
    blobs = attach_blob(d, "doc_id", "text", mime="image/jpeg")
    resized = resize_images(blobs, "doc_id", "blob", width=224, height=224)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.lower(F.hex("resized")).alias("resized_hex"),
        "resized_nbytes",
    )


@query(
    "multimodal_audio_energy",
    oracle="""
WITH b AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
  WHERE length(coalesce(text, '')) = strlen(coalesce(text, ''))
), w AS (
  SELECT doc_id, t,
    unnest(range(0, CAST(ceil(len(t) / 256.0) AS INT))) AS wi
  FROM b
), s AS (
  SELECT doc_id, CAST(wi AS INT) AS wi, substr(t, wi * 256 + 1, 256) AS seg
  FROM w
), c AS (
  SELECT doc_id, wi, len(seg) AS n,
    list_transform(range(1, len(seg) + 1),
                   i -> ascii(substr(seg, i, 1)) - 128) AS codes
  FROM s
)
SELECT doc_id, wi AS window_idx, CAST(n AS INT) AS n_samples,
  CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT) AS energy,
  CAST(list_max(list_transform(codes, x -> abs(x))) AS INT) AS peak
FROM c
""",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality plumbing: text blobs decoded as fake 8-bit PCM and
    reduced to per-window integer energy/peak features through the real
    mapInPandas batch interface (functions/multimodal.audio_window_energy).

    ASCII contract, SELF-ENFORCING (ADVICE r4): the engine samples
    BYTES of the UTF-8 blob while the oracle enumerates CHARACTER
    codepoints — equal only for pure-ASCII payloads. Both sides
    therefore restrict to ASCII rows by the same law (chars == octets:
    Spark ``length = octet_length``, DuckDB ``length = strlen``), so the
    comparison no longer depends on a testdata property stated in prose;
    a future non-ASCII doc is excluded identically on both sides."""
    from polar_spark.functions.multimodal import attach_blob, audio_window_energy

    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
        .filter(F.length("text") == F.octet_length("text"))
    )
    blobs = attach_blob(d, "doc_id", "text", mime="audio/pcm;rate=8000")
    return audio_window_energy(blobs, "doc_id", "blob", window=256)
