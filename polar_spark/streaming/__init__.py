from polar_spark.streaming.ingest import StreamingProducer, stream_topic  # noqa: F401
from polar_spark.streaming.aggregates import (  # noqa: F401
    windowed_counts,
    session_aggregate,
)
from polar_spark.streaming.dedup import (  # noqa: F401
    StreamingNearDup,
    StreamingSemDedup,
)
from polar_spark.streaming.sketches import (  # noqa: F401
    StreamingCountMin,
    StreamingKMV,
)
