from .windows import tumbling_agg, sliding_agg, session_agg
from .ingest import (
    stream_events,
    incremental_index_maintenance,
    incremental_bm25_maintenance,
    read_state,
    commit_state,
    migrate_state,
)
from .stateful import running_user_totals

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_events",
    "incremental_index_maintenance",
    "incremental_bm25_maintenance",
    "read_state",
    "commit_state",
    "migrate_state",
    "running_user_totals",
]
