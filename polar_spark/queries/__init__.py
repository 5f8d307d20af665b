"""The driver-checked query surface (SURVEY.md §2 inventory).

Each query is registered with a Spark implementation and (where
SQL-expressible) a DuckDB oracle. ``__spark_entry__`` re-exports the
registry. Import order defines registry contents.
"""

from polar_spark.queries.registry import QUERIES, oracle_map, query_map  # noqa: F401
import polar_spark.queries.relational  # noqa: F401,E402
import polar_spark.queries.tpch_more  # noqa: F401,E402
import polar_spark.queries.streamlike  # noqa: F401,E402
import polar_spark.queries.text  # noqa: F401,E402
import polar_spark.queries.dedup  # noqa: F401,E402
import polar_spark.queries.similarity  # noqa: F401,E402
import polar_spark.queries.multimodal  # noqa: F401,E402
import polar_spark.queries.sql_surface  # noqa: F401,E402
import polar_spark.queries.stateful  # noqa: F401,E402
import polar_spark.queries.skew  # noqa: F401,E402
import polar_spark.queries.stream_join  # noqa: F401,E402
import polar_spark.queries.pipeline_ops  # noqa: F401,E402
import polar_spark.queries.quality  # noqa: F401,E402
import polar_spark.queries.sketch_stream  # noqa: F401,E402
import polar_spark.queries.graph  # noqa: F401,E402
import polar_spark.queries.hybrid  # noqa: F401,E402
