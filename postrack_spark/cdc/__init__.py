"""Change-data-capture core: the reference's domain, Spark-first.

The reference (postrack.go) delivers Postgres logical-replication events
as `HandleFunc(lsn, table, event, newValues, oldValues)` with row images
as map[string]string (postrack.go:35). Here the same data model is a
DataFrame with a fixed envelope schema (envelope.CHANGE_SCHEMA); the
operators that the reference leaves to user callbacks (materialization,
typed projection, event filtering) are first-class DataFrame transforms.
"""

from postrack_spark.cdc.envelope import (
    CHANGE_SCHEMA,
    DELETE,
    EVENT_KINDS,
    INSERT,
    TRUNCATE,
    UPDATE,
    filter_events,
    prune_images,
    typed_column,
)
from postrack_spark.cdc.fixtures import lineitem_changes, mixed_changes, orders_changes
from postrack_spark.cdc.ivm import delta_rows, incremental_agg, recover_before
from postrack_spark.cdc.materialize import (
    apply_changes,
    latest_per_key,
    snapshot_as_changes,
    snapshot_with_changes,
)

__all__ = [
    "CHANGE_SCHEMA",
    "INSERT",
    "UPDATE",
    "DELETE",
    "TRUNCATE",
    "EVENT_KINDS",
    "filter_events",
    "prune_images",
    "typed_column",
    "orders_changes",
    "lineitem_changes",
    "mixed_changes",
    "latest_per_key",
    "apply_changes",
    "snapshot_as_changes",
    "snapshot_with_changes",
    "delta_rows",
    "incremental_agg",
    "recover_before",
]
