from polar_spark.plans.explain import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_schema_columns,
    shuffle_count,
)
