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
