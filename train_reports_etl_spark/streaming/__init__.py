"""Event-time windowing (E5): batch-canonical implementations with
thin Structured Streaming variants."""

from train_reports_etl_spark.streaming.stateful import (
    streaming_dedup_first_seen,
    streaming_sessionize,
)
from train_reports_etl_spark.streaming.windows import (
    session_windows,
    sliding_windows,
    tumbling_windows,
)

__all__ = [
    "tumbling_windows",
    "sliding_windows",
    "session_windows",
    "streaming_dedup_first_seen",
    "streaming_sessionize",
]
