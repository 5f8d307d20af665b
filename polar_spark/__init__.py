"""polar_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of polarstreams/polar.

The reference (/root/reference, a Go event-streaming broker) provides:
topics, partition-key ordering, offset-based consumption, consumer groups,
at-least-once delivery, JSON/NDJSON payloads (SURVEY.md §1-2). This package
re-expresses those capabilities Spark-first:

- ``topics``/``produce``/``consume``: topic tables with Kafka-like schema
  ``(topic, partition, offset, timestamp, key, value)``, contiguous
  per-partition offsets, consumer-group offset ledger with earliest/latest
  reset policies (reference: internal/producing, internal/consuming).
- ``operators``: the relational surface (joins, aggs, windows, set ops,
  as-of joins) the reference lacks, via built-in Catalyst operators.
- ``functions``: LLM-data-pipeline operators — dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard), embedding similarity search, text analysis,
  multimodal column plumbing.
- ``streaming``: Structured Streaming ingestion/consumption wrappers.
- ``sources``: custom PySpark DataSource exposing topic semantics.
"""

__version__ = "0.1.0"

from polar_spark.session import ensure_driver_session, get_spark  # noqa: F401
from polar_spark.api import PolarEngine  # noqa: F401,E402
