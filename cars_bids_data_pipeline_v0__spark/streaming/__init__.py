"""Structured Streaming: incremental variants of the batch plans
(SURVEY §2.10)."""

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
