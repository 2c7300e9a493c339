"""Structured Streaming surface.

The reference is batch, but its cadence + freshness + idempotency
triple is exactly an incremental-ingest contract (SURVEY.md §2.7):
`@hourly` schedule ≙ processing-time / available-now triggers
(reference dags/crypto-etl-pipeline-psql.py:136,138), the freshness
SLO ≙ watermarking (include/soda/checks.yml:7-9), and the
`ON CONFLICT DO NOTHING` sink ≙ an idempotent ``foreachBatch``
writer (dags/crypto-etl-pipeline-psql.py:85-89).

Every transformation here is built on the unbounded-DataFrame API so
the exact same code runs batch or streaming; the streaming-only
pieces are the sources (file-watch), sinks (foreachBatch upsert) and
state (watermarks, GroupState).
"""

from .ingest import ingest_events_stream
from .runner import run_append_to_memory, run_complete_to_memory
from .sources import stream_events
from .stateful import user_running_stats
from .windows import session_stats, sliding_avg, tumbling_counts

__all__ = [
    "ingest_events_stream",
    "run_append_to_memory",
    "run_complete_to_memory",
    "stream_events",
    "user_running_stats",
    "session_stats",
    "sliding_avg",
    "tumbling_counts",
]
