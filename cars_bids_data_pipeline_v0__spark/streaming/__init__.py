"""Structured Streaming: incremental variants of the batch plans
(SURVEY §2.10)."""

from .ann_index import (
    ivf_index_probe,
    ivf_index_sink,
    ivf_pq_index_probe,
    ivf_pq_index_sink,
    ivf_reindex,
)
from .incremental import (
    enrich_stream,
    hourly_event_windows_stream,
    corpus_dedup_stream,
    dedup_stream_within_watermark,
    scd2_dim_stream,
    silver_ingest_stream,
    stateful_latest_per_key,
    stateful_zscore_stream,
    stream_events,
    stream_stream_join,
)

__all__ = [
    "ivf_index_probe",
    "ivf_index_sink",
    "ivf_pq_index_probe",
    "ivf_pq_index_sink",
    "ivf_reindex",
    "enrich_stream",
    "hourly_event_windows_stream",
    "corpus_dedup_stream",
    "dedup_stream_within_watermark",
    "scd2_dim_stream",
    "silver_ingest_stream",
    "stateful_latest_per_key",
    "stateful_zscore_stream",
    "stream_events",
    "stream_stream_join",
]
