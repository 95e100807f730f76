"""Structured Streaming surface: the Spark-native form of the
reference's streaming runtime (postrack.go:287-413).

Mapping (SURVEY.md §3.4):
  Changes/StartReplication  -> readStream + writeStream.start()
  handler decode loop       -> source decode into CHANGE_SCHEMA rows
  HandleFunc callback       -> foreachBatch / foreach
  lsn resume (lsn+1, :297)  -> checkpoint offsets
  keepAlive 5s ack (:107)   -> commit() after durable micro-batch
                               (fixes the ref's ack-before-process race)
"""

from postrack_spark.streaming.ops import (
    hourly_window_counts,
    session_window_stats,
    stream_dedup,
    stream_static_join,
    stream_stream_interval_join,
)
from postrack_spark.streaming.runner import (
    envelope_stream,
    events_stream,
    run_to_memory,
)
from postrack_spark.streaming.sinks import (
    foreach_batch_apply_changes,
    foreach_batch_incremental_agg,
    foreach_batch_ann_index,
    foreach_batch_cluster_maintenance,
    foreach_batch_dedup_index,
    foreach_batch_fold,
    foreach_batch_merge_fold,
    foreach_batch_incremental_agg_log,
    foreach_batch_incremental_join_agg,
    foreach_batch_incremental_join_agg_log,
    foreach_batch_scd2,
    compact_log_view,
    compact_pair_index,
    read_dedup_pairs,
    read_log_view,
    read_view,
)

__all__ = [
    "events_stream",
    "envelope_stream",
    "run_to_memory",
    "hourly_window_counts",
    "session_window_stats",
    "stream_dedup",
    "stream_static_join",
    "stream_stream_interval_join",
    "foreach_batch_apply_changes",
    "foreach_batch_incremental_agg",
    "foreach_batch_ann_index",
    "foreach_batch_cluster_maintenance",
    "foreach_batch_dedup_index",
    "foreach_batch_fold",
    "foreach_batch_merge_fold",
    "foreach_batch_incremental_agg_log",
    "foreach_batch_incremental_join_agg",
    "foreach_batch_incremental_join_agg_log",
    "foreach_batch_scd2",
    "compact_log_view",
    "compact_pair_index",
    "read_dedup_pairs",
    "read_log_view",
    "read_view",
]
