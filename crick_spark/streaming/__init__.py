from crick_spark.streaming.windows import (  # noqa: F401
    session_rollup_batch,
    stream_events,
    streamed_hourly_rollup,
    windowed_rollup,
)
from crick_spark.streaming.sketch_state import tdigest_stream_quantiles  # noqa: F401
