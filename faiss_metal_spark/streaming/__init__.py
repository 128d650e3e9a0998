from .continuous_topk import continuous_topk  # noqa: F401
from .knn_stream import read_query_stream, run_knn_stream  # noqa: F401
from .ops import (  # noqa: F401
    curate_stream,
    dedup_stream,
    hourly_counts,
    join_within,
    read_events_stream,
    run_to_memory,
    sessionize,
    sliding_counts,
    user_running_totals,
)
