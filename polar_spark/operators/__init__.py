from polar_spark.operators.asof import asof_join  # noqa: F401
from polar_spark.operators.sessionize import sessionize  # noqa: F401
from polar_spark.operators.topk import top_k_per_group  # noqa: F401
from polar_spark.operators.bloomjoin import bloom_semi_join, build_bloom  # noqa: F401
