"""Sources & sinks (SURVEY §2.1, S1-S9)."""

from .ingest import (
    normalize_raw,
    read_raw_auctions,
    read_silver_ndjson,
    read_table,
    read_text_lines,
)
from .compaction import compact_partitions, compacted_copy, partition_stats
from .ingest import register_views
from .pyds import TxLogDataSource, register_txlog_source
from .sinks import merge_write_partitioned, write_json_debug, write_text_queue
from .tarshard import read_tar_shards, write_tar_shards
from .txlog import (
    TransactionLog,
    checkpoint_epoch_app_id,
    tx_compact,
    tx_optimize_zorder,
    tx_prunable_files_bloom,
    tx_scan_eq,
    tx_delete_where,
    tx_export_delta_log,
    tx_fsck,
    tx_export_symlink_manifest,
    tx_insert_if_absent,
    tx_merge_partitioned,
    tx_read,
    tx_read_latest,
    tx_read_delta_export,
    tx_register_view,
    tx_read_manifest,
    tx_stream_merge_sink,
    tx_upsert,
)

__all__ = [
    "TxLogDataSource",
    "register_txlog_source",
    "read_tar_shards",
    "write_tar_shards",
    "normalize_raw",
    "read_raw_auctions",
    "read_silver_ndjson",
    "read_table",
    "register_views",
    "read_text_lines",
    "compact_partitions",
    "compacted_copy",
    "partition_stats",
    "merge_write_partitioned",
    "write_json_debug",
    "write_text_queue",
    "TransactionLog",
    "checkpoint_epoch_app_id",
    "tx_compact",
    "tx_optimize_zorder",
    "tx_prunable_files_bloom",
    "tx_scan_eq",
    "tx_delete_where",
    "tx_export_delta_log",
    "tx_fsck",
    "tx_export_symlink_manifest",
    "tx_insert_if_absent",
    "tx_merge_partitioned",
    "tx_read",
    "tx_read_latest",
    "tx_read_delta_export",
    "tx_register_view",
    "tx_read_manifest",
    "tx_stream_merge_sink",
    "tx_upsert",
]
