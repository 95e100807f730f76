"""Streaming SOURCE over Iceberg snapshots — the Iceberg twin of
sources/delta_feed.py: a Python DataSource whose stream offsets are
SNAPSHOT IDS. Each micro-batch consumes the snapshot range
(start, end], emitting exactly the data files those snapshots ADDED
(the spec's incremental append scan, the shape Flink/Spark use to
tail an Iceberg table). Downstream pipelines get exactly-once
tailing from Spark's offset checkpointing — no directory listings,
no rescans, O(manifests) driver-side metadata per batch.

Append-only is enforced by SET DIFFERENCE, not assumed: for every
consumed snapshot the reader diffs the live data-file set against its
predecessor. COMPACTION rides through: a snapshot whose summary
operation is 'replace' (the spec's rewrite_data_files label,
compact_iceberg stamps it) is a logical no-op — same rows in new
files, all already delivered — so the feed emits nothing and moves
its diff base forward, exactly how Delta consumers treat
dataChange=false commits. An UNLABELED file retirement or a new
delete manifest (MOR position/equality delete) still raises, because
emitting around either would double-count or ghost rows. Row-level
change feeds over deletes need per-row change files, out of scope
(the honest-seam rule). Linear main-line history is assumed:
snapshots staged on UNPUBLISHED branches look like rewrites to the
differ and raise rather than leak unpublished data.

Partitioning: one input partition per added file; workers read their
file with pyarrow. Columns added by schema evolution read as NULL
for pre-evolution files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from postrack_spark.sources.avro_codec import read_avro
from postrack_spark.streaming.iceberg import (
    ADDED,
    DATA_CONTENT,
    DELETE_CONTENT,
    EXISTING,
    _ICE_TO_SPARK,
    _current_metadata,
    _read_file,
    _snapshot,
)


def _snapshot_file_sets(table: str, meta: dict,
                        sid: int) -> tuple[set[str], set[str]]:
    """(live data files, live delete files) at snapshot ``sid``."""
    snap = _snapshot(meta, sid)
    mlist, _ = read_avro(_read_file(table, snap["manifest-list"]))
    data: set[str] = set()
    deletes: set[str] = set()
    for m in mlist:
        entries, _s = read_avro(_read_file(table, m["manifest_path"]))
        bucket = (deletes if m.get("content", DATA_CONTENT) == DELETE_CONTENT
                  else data)
        for e in entries:
            if e["status"] in (ADDED, EXISTING):
                bucket.add(e["data_file"]["file_path"])
    return data, deletes


def _table_ddl(table: str) -> str:
    meta = _current_metadata(table)
    if meta is None:
        raise FileNotFoundError(f"no iceberg metadata under {table}")
    return ", ".join(
        f"{f['name']} {_ICE_TO_SPARK[f['type']]}"
        for f in meta["schema"]["fields"])


class IcebergFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class IcebergFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.table = options.get("path") or options.get("table")
        if not self.table:
            raise ValueError("iceberg_feed needs a 'path' option")
        self.max_snapshots = int(options.get("maxsnapshotspertrigger", 0))
        meta = _current_metadata(self.table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {self.table}")
        self._fields = [f["name"] for f in meta["schema"]["fields"]]
        # pacing high-water mark (the delta_feed/_progress.json
        # pattern): PACING only — Spark's checkpoint decides what is
        # actually re-read, so a stale value cannot skip data
        self._hwm = 0
        try:
            with open(self._progress_path()) as f:
                self._hwm = json.load(f)["sid"]
        except (FileNotFoundError, ValueError, KeyError):
            pass

    def _progress_path(self) -> str:
        return os.path.join(self.table, "metadata", "_feed_progress.json")

    def initialOffset(self) -> dict:
        return {"sid": 0}

    def latestOffset(self) -> dict:
        meta = _current_metadata(self.table)
        sids = sorted(s["snapshot-id"] for s in meta["snapshots"])
        latest = sids[-1] if sids else 0
        if self.max_snapshots > 0:
            admitted = [s for s in sids if s > self._hwm]
            if admitted:
                latest = min(latest, admitted[
                    min(self.max_snapshots, len(admitted)) - 1])
            else:
                latest = self._hwm
        self._hwm = max(self._hwm, latest)
        return {"sid": latest}

    def partitions(self, start: dict, end: dict):
        self._hwm = max(self._hwm, end["sid"])
        tmp = self._progress_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"sid": self._hwm}, f)
        os.replace(tmp, self._progress_path())
        meta = _current_metadata(self.table)
        sids = sorted(s["snapshot-id"] for s in meta["snapshots"])
        # the checkpointed offset snapshot is the DIFF BASE for the
        # first unconsumed snapshot: if snapshot expiry removed it,
        # the differ would fall back to an empty (or far-older)
        # predecessor and re-emit every carried-forward file as
        # "added" — silent duplicates from a source that promises
        # exactly-once tailing. Raise instead (ADVICE r6): the
        # operator expired history past a live consumer's offset.
        if start["sid"] > 0 and start["sid"] not in sids:
            raise ValueError(
                f"iceberg_feed: checkpointed offset snapshot "
                f"{start['sid']} was expired from the table — cannot "
                "establish the incremental diff base; re-seed the "
                "consumer (expire_snapshots ran past a live offset)")
        summaries = {s["snapshot-id"]: (s.get("summary") or {})
                     for s in meta["snapshots"]}
        parts: list[IcebergFilePartition] = []
        prev_data: set[str] | None = None
        prev_del: set[str] | None = None
        for i, sid in enumerate(sids):
            if sid > end["sid"]:
                break
            if sid <= start["sid"]:
                continue
            if prev_data is None:
                if i == 0:
                    prev_data, prev_del = set(), set()
                else:
                    prev_data, prev_del = _snapshot_file_sets(
                        self.table, meta, sids[i - 1])
            data, dels = _snapshot_file_sets(self.table, meta, sid)
            if summaries.get(sid, {}).get("operation") == "replace":
                # COMPACTION (rewrite_data_files): the spec's 'replace'
                # operation promises the same logical rows in new
                # files — every row was already delivered from the
                # files it rewrote, so the feed emits NOTHING and
                # moves the diff base forward (the trust model is
                # dataChange=false in Delta: a writer labeling a
                # data-adding commit 'replace' violates its contract).
                # Retired delete files are part of the same rewrite.
                prev_data, prev_del = data, dels
                continue
            removed = prev_data - data
            if removed:
                raise ValueError(
                    f"iceberg_feed: snapshot {sid} retires data files "
                    f"{sorted(removed)[:3]} — this source is append-only "
                    "(rewrites must be 'replace' snapshots; branch "
                    "histories out of scope)")
            if dels - prev_del:
                raise ValueError(
                    f"iceberg_feed: snapshot {sid} adds MOR delete files "
                    "— row-level change feeds are out of scope")
            parts.extend(IcebergFilePartition(
                os.path.join(self.table, p)) for p in sorted(data - prev_data))
            prev_data, prev_del = data, dels
        return parts or [IcebergFilePartition("")]

    def read(self, partition: IcebergFilePartition):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        cols = [
            tbl.column(name).to_pylist()
            if name in tbl.column_names else [None] * n
            for name in self._fields
        ]
        for row in zip(*cols):
            yield row

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; snapshots are immutable


class IcebergFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_feed"

    def schema(self):
        table = self.options.get("path") or self.options.get("table")
        return _table_ddl(table)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return IcebergFeedStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(IcebergFeedDataSource)
