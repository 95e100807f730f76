"""Streaming SOURCE over the Delta transaction log (sources side of
streaming/delta_log.py): a Python DataSource whose stream offsets are
LOG VERSIONS — each micro-batch consumes the commit range
(start_version, end_version], reading exactly the parquet files those
commits added. This is the append-only change-feed pattern
(delta-spark's ``readStream.format("delta")``): downstream pipelines
tail a lakehouse table incrementally with exactly-once semantics from
Spark's offset checkpointing, no file listings, no rescans.

Append-only is enforced, not assumed: a consumed commit containing a
``remove`` with ``dataChange=true`` (an overwrite or MERGE rewrite)
raises — emitting rewritten files as if they were fresh appends would
double-count rows. Compaction commits (``dataChange=false``) are
passed over silently, as the protocol intends. Row-level change feeds
over rewrites need per-row CDF files, which are out of scope (stated
here per the honest-seam rule).

``readChangeFeed=true`` switches the source to ROW-LEVEL CHANGES
(the delta-spark CDF read): each batch emits the table columns plus
``_change_type`` and ``_commit_version`` — commits carrying ``cdc``
actions contribute exactly their ``_change_data`` files (delete /
update_preimage / update_postimage rows staged by the COW writers
when delta.enableChangeDataFeed is set), append commits synthesize
'insert' rows from their adds, and a rewrite WITHOUT change files
still raises. Downstream signed folds (insert/postimage +,
delete/preimage -) reconstruct any aggregate of the table
incrementally — IVM fed by the log itself.

Partitioning: one input partition per ADDED FILE, so decode
parallelism scales with commit width; workers read their file with
pyarrow (the Python DataSource API runs outside the JVM scan path).
Supported column types: the primitive lattice avro/iceberg use —
long/int/double/float/string/boolean/binary.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from postrack_spark.streaming.delta_log import _list_versions, _log_path


def _commit_actions(table: str, version: int) -> list[dict]:
    with open(_log_path(table, version)) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _table_meta(table: str) -> tuple[str, dict]:
    """(schemaString, configuration) from the NEWEST metaData action —
    the live schema (renames/evolution included), not the creation
    one."""
    for v in reversed(_list_versions(table)):
        for a in _commit_actions(table, v):
            if "metaData" in a:
                md = a["metaData"]
                return md["schemaString"], md.get("configuration") or {}
    raise FileNotFoundError(f"no metaData action in {table}")


def _table_schema_json(table: str) -> str:
    return _table_meta(table)[0]


class DeltaFilePartition(InputPartition):
    def __init__(self, path: str, version: int = -1,
                 synth_insert: bool = False):
        self.path = path
        self.version = version
        self.synth_insert = synth_insert


class DeltaFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.table = options.get("path") or options.get("table")
        if not self.table:
            raise ValueError("delta_feed needs a 'path' option")
        self.max_versions = int(options.get("maxversionspertrigger", 0))
        self.cdf = str(options.get("readchangefeed", "false")).lower() == "true"
        schema_string, config = _table_meta(self.table)
        fields = json.loads(schema_string)["fields"]
        self._fields = [f["name"] for f in fields]
        # parquet stores PHYSICAL names under column mapping; project
        # each file through the indirection so pre-rename files keep
        # resolving (delta_log._column_mapping's rule, inlined to keep
        # the DataSource worker-importable without Spark-side deps)
        if config.get("delta.columnMapping.mode") in ("name", "id"):
            self._phys = [
                (f.get("metadata") or {}).get(
                    "delta.columnMapping.physicalName", f["name"])
                for f in fields]
        else:
            self._phys = list(self._fields)
        # pacing high-water mark, seeded from the planning side file so
        # a resumed reader paces from where the last run left off (the
        # postgres_cdc _progress.json pattern — a fresh reader instance
        # is never told the checkpoint's start offset, only asked for
        # latestOffset). Purely a PACING aid: Spark's checkpoint decides
        # what is actually re-read, so a stale value cannot skip data.
        self._hwm = -1
        try:
            with open(self._progress_path()) as f:
                self._hwm = json.load(f)["version"]
        except (FileNotFoundError, ValueError, KeyError):
            pass

    def _progress_path(self) -> str:
        return os.path.join(self.table, "_delta_log", "_feed_progress.json")

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        versions = _list_versions(self.table)
        latest = versions[-1] if versions else -1
        if self.max_versions > 0:
            # admission pacing mirrors maxFilesPerTrigger: bounded
            # catch-up per run (availableNow snapshots the first
            # reported offset — the postgres_cdc semantic)
            latest = min(latest, self._hwm + self.max_versions)
        self._hwm = max(self._hwm, latest)
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        self._hwm = max(self._hwm, end["version"])
        tmp = self._progress_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": self._hwm}, f)
        os.replace(tmp, self._progress_path())
        parts = []
        for v in _list_versions(self.table):
            if not (start["version"] < v <= end["version"]):
                continue
            actions = _commit_actions(self.table, v)
            cdc = [a["cdc"] for a in actions if "cdc" in a]
            if self.cdf and cdc:
                parts.extend(DeltaFilePartition(
                    os.path.join(self.table, c["path"]), v)
                    for c in cdc)
                continue
            for a in actions:
                if "remove" in a and a["remove"].get("dataChange", True):
                    raise ValueError(
                        f"delta_feed: commit {v} rewrites data without "
                        "change files — append-only without "
                        "readChangeFeed=true; with it, enable the change "
                        "feed before row-rewriting ops")
                if "add" in a and a["add"].get("dataChange", True):
                    parts.append(DeltaFilePartition(
                        os.path.join(self.table, a["add"]["path"]), v,
                        synth_insert=True))
        return parts or [DeltaFilePartition("")]

    def read(self, partition: DeltaFilePartition):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        cols = [
            tbl.column(name).to_pylist()
            if name in tbl.column_names else [None] * n
            for name in self._phys
        ]
        if not self.cdf:
            for row in zip(*cols):
                yield row
            return
        if partition.synth_insert:
            ctypes = ["insert"] * n
        else:
            ctypes = tbl.column("_change_type").to_pylist()
        for row, ct in zip(zip(*cols), ctypes):
            yield row + (ct, partition.version)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; the log is immutable


class DeltaFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "delta_feed"

    def schema(self):
        table = self.options.get("path") or self.options.get("table")
        base = StructType.fromJson(json.loads(_table_schema_json(table)))
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            from pyspark.sql.types import IntegerType, StringType

            return base.add("_change_type", StringType()).add(
                "_commit_version", IntegerType())
        return base

    def streamReader(self, schema) -> DataSourceStreamReader:
        return DeltaFeedStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(DeltaFeedDataSource)
