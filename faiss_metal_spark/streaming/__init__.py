from .continuous_topk import continuous_topk  # noqa: F401
from .index_ingest import (  # noqa: F401
    ivf_store_search,
    ivfrq_store_search,
    read_vector_stream,
    run_ivf_ingest,
    run_ivfrq_ingest,
)
from .knn_stream import read_query_stream, run_knn_stream  # noqa: F401
from .ops import (  # noqa: F401
    curate_stream,
    dedup_segments_stream,
    dedup_stream,
    hourly_counts,
    join_within,
    read_events_stream,
    run_to_memory,
    sessionize,
    sliding_counts,
    user_running_totals,
)
