"""Iceberg-v1-format table writer/reader, pure protocol.

The Apache Iceberg table spec is public
(https://iceberg.apache.org/spec/): a table is parquet data files plus
a ``metadata/`` tree — numbered ``vN.metadata.json`` documents (schema
with field-ids, snapshot log, current snapshot pointer via
``version-hint.text``), per-snapshot MANIFEST LIST files and MANIFEST
files, both Avro Object Container Files. This module implements the
append-only v1 core with stdlib + Spark + the repo's own
cross-certified Avro codec (sources/avro_codec.py — certified against
avro-java, so the binary layer of these manifests is independently
validated even though no Iceberg implementation ships in this
container; the honest-certification caveat mirrors operators/mp4.py):

* ``append_iceberg`` — writes data parquet, a manifest (one
  ``manifest_entry`` per file: status=ADDED, data_file record with
  path/format/record_count/file_size), a manifest list (previous
  snapshot's manifests carried forward as EXISTING + the new one),
  a new metadata.json with the snapshot appended, and finally the
  ``version-hint.text`` swap — readers resolve through the hint, so
  the commit point is one atomic rename (the same durability order as
  the Delta log and the ``_CURRENT`` pointer sinks).
* ``read_iceberg`` — resolves current (or any historical
  ``snapshot_id``: time travel) through metadata.json → manifest list
  → manifests → live parquet, with the schema taken from metadata
  field definitions, not parquet inference.

* ``delete_positions_iceberg`` — format-version 2 MERGE-ON-READ
  position deletes: matching rows are identified by
  (file_path, row position) through Spark's ``_metadata.file_path`` /
  ``_metadata.row_index`` scan columns, written to a position-delete
  Avro file (the spec's reserved field-ids 2147483546/2147483545,
  sorted by path then pos), and committed as a content=1 delete
  manifest with the v2 sequence-number machinery — NO data file is
  rewritten (the point of MOR: delete cost is O(matches), rewrite
  deferred to compaction). ``read_iceberg`` then applies deletes as a
  broadcast anti-join on (file, pos) — the Spark-native MOR read.

* ``delete_keys_iceberg`` / ``upsert_iceberg`` — format-version 2
  EQUALITY deletes (data_file content=2, ``equality_ids`` naming the
  key columns by field-id): a delete file holds KEY VALUES, not
  positions, so deleting (or upserting) by key costs O(keys) with NO
  scan of the table at all — the shape Flink's CDC writer uses for
  upsert streams. Scoping is by SEQUENCE NUMBER per the spec: an
  equality delete at sequence S applies only to data files with
  sequence STRICTLY LESS than S (position deletes use <=), which is
  exactly what lets ``upsert_iceberg`` commit the delete and the
  replacement rows at the SAME sequence in ONE snapshot — the new
  rows survive their own delete by construction, no ordering hack.

Scope honestly stated: v2 is limited to deletes written by this
module (foreign v2 tables are out of scope). Hidden partitioning with
SPEC EVOLUTION (multiple specs, per-manifest spec-ids, per-spec
pruning), add-column schema evolution with stable field-ids, and
spec-shaped field-id-keyed binary column bounds are all in. The
position-delete writer AND reader are DISTRIBUTED — writes
repartition matches by file_path with each executor partition
emitting its own delete Avro; reads decode the delete Avros inside
mapInPandas over the file list — so only O(delete files) metadata
ever reaches the driver in either direction and a bulk 100 TB delete
scales with the cluster, not the driver.

Scale: metadata is O(files) Avro records — the format's whole point is
that snapshot resolution never lists directories; data stays in
distributed parquet scans of exactly the live files.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pandas

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from postrack_spark.sources.avro_codec import read_avro, write_avro

_SPARK_TO_ICE = {"long": "long", "bigint": "long", "int": "int",
                 "integer": "int", "double": "double", "float": "float",
                 "string": "string", "boolean": "boolean",
                 "binary": "binary", "date": "date",
                 "timestamp": "timestamptz"}

# data_file carries per-column lower/upper bounds (the spec's
# field-ids 125/128) harvested from the parquet footer at write time —
# the metadata readers use for min/max FILE SKIPPING. SPEC-SHAPED
# since round 7: the maps are keyed by FIELD-ID with the spec's
# single-value binary serialization (Appendix D: little-endian
# fixed-width numerics, UTF-8 strings), encoded the way Avro encodes
# non-string-keyed maps — an array of key/value records with
# logicalType "map" (avro-java surfaces it as that array). Only
# int/long/float/double/string columns participate (the footer
# harvest skips other stat types — fail-open, those columns scan).


def _bound_map_schema(rec_name: str, key_id: int, val_id: int) -> dict:
    return {"type": "array", "logicalType": "map",
            "items": {"type": "record", "name": rec_name, "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": "bytes", "field-id": val_id},
            ]}}


_MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": "long", "field-id": 1},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2",
            "fields": [
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                {"name": "lower_bounds", "field-id": 125,
                 "type": _bound_map_schema("k126_v127", 126, 127)},
                {"name": "upper_bounds", "field-id": 128,
                 "type": _bound_map_schema("k129_v130", 129, 130)},
                # spec field-id 140: which table sort order produced
                # this file's row layout (0 = unsorted); REQUIRED here
                # so every writer states it explicitly (the codec has
                # no field defaults — the documented bounds-map rule)
                {"name": "sort_order_id", "type": "int", "field-id": 140},
            ]}},
    ],
}


def _single_value_bin(ice_type: str, value) -> bytes | None:
    """Iceberg single-value binary serialization (spec Appendix D):
    ints/longs/floats/doubles little-endian fixed width, strings
    UTF-8. Returns None for types outside the harvest scope."""
    import struct as _struct

    if ice_type == "int":
        return _struct.pack("<i", int(value))
    if ice_type == "long":
        return _struct.pack("<q", int(value))
    if ice_type == "float":
        return _struct.pack("<f", float(value))
    if ice_type == "double":
        return _struct.pack("<d", float(value))
    if ice_type == "string":
        return str(value).encode("utf-8")
    return None


def _single_value_unbin(ice_type: str, b: bytes):
    import struct as _struct

    if ice_type == "int":
        return _struct.unpack("<i", b)[0]
    if ice_type == "long":
        return _struct.unpack("<q", b)[0]
    if ice_type == "float":
        return _struct.unpack("<f", b)[0]
    if ice_type == "double":
        return _struct.unpack("<d", b)[0]
    if ice_type == "string":
        return b.decode("utf-8")
    return None


def _name_mapping_property(meta: dict) -> dict | None:
    """{field-id: first mapped parquet column name} from the table's
    schema.name-mapping.default property (spec: the fallback
    resolution for parquet files without field ids), or None. Fails
    open (None) on malformed JSON — the scan then resolves by schema
    names, exactly the no-property behavior."""
    raw = (meta.get("properties") or {}).get("schema.name-mapping.default")
    if not raw:
        return None
    try:
        return {e["field-id"]: e["names"][0] for e in json.loads(raw)
                if e.get("names")}
    except (ValueError, KeyError, TypeError):
        return None


def _bind_bounds(entries: list[dict], schema_fields: list[dict]) -> None:
    """Convert each staged entry's raw footer bounds (column-name ->
    python value, stashed by the stage functions) into the spec's
    field-id-keyed binary maps, under the RESOLVED table schema — the
    binding happens at commit time because the name->field-id mapping
    is the table's, not the incoming frame's. Idempotent across OCC
    retries (re-derives from the stash every call)."""
    fid = {f["name"]: (f["id"], f["type"]) for f in schema_fields}
    for e in entries:
        dfile = e["data_file"]
        raw = dfile.get("_raw_bounds")
        if raw is None:
            dfile.setdefault("lower_bounds", [])
            dfile.setdefault("upper_bounds", [])
            continue
        mins, maxs = raw
        for name, out in (("lower_bounds", mins), ("upper_bounds", maxs)):
            kvs = []
            for col, v in sorted(out.items()):
                if col not in fid:
                    continue
                i, t = fid[col]
                b = _single_value_bin(t, v)
                if b is not None:
                    kvs.append({"key": i, "value": b})
            dfile[name] = kvs

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
    ],
}

# v2 manifest list: content distinguishes data (0) from delete (1)
# manifests; sequence_number orders deletes against data files.
_MANIFEST_LIST_SCHEMA_V2 = {
    "type": "record", "name": "manifest_file",
    "fields": _MANIFEST_LIST_SCHEMA["fields"] + [
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
    ],
}

# position-delete file rows use the spec's RESERVED field ids
_POS_DELETE_SCHEMA = {
    "type": "record", "name": "pos_delete",
    "fields": [
        {"name": "file_path", "type": "string", "field-id": 2147483546},
        {"name": "pos", "type": "long", "field-id": 2147483545},
    ],
}

# manifest schema for EQUALITY-delete manifests: data_file grows the
# spec's content (field-id 134: 0=data, 1=position deletes, 2=equality
# deletes) and equality_ids (field-id 135, element-id 136 — the table
# field-ids of the key columns). Kept as a SEPARATE schema so existing
# data/position manifests stay byte-stable; Avro carries the writer
# schema in the container header, so readers branch on what they find.
_EQ_MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": "long", "field-id": 1},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2",
            "fields": [
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "equality_ids", "field-id": 135, "type": {
                    "type": "array", "items": "int", "element-id": 136}},
            ]}},
    ],
}

# format-version 3 DATA manifests additionally carry first_row_id
# (spec field-id 142, ROW LINEAGE): the table-wide id of the file's
# first row — every row's stable id is first_row_id + its position,
# assigned once at commit from the metadata's next-row-id counter and
# NEVER reused (the Delta row-tracking twin, id-space style).
_MANIFEST_SCHEMA_V3 = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": "long", "field-id": 1},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2",
            "fields": list(
                _MANIFEST_SCHEMA["fields"][2]["type"]["fields"]) + [
                {"name": "first_row_id", "type": "long", "field-id": 142},
            ]}},
    ],
}

# format-version 3 DELETION VECTOR manifests: the data_file points at
# a PUFFIN file and carries the spec's DV addressing triplet —
# referenced_data_file (143, which data file the vector masks),
# content_offset (144) and content_size_in_bytes (145, the blob's
# position inside the puffin). record_count = the vector's cardinality.
_DV_MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": "long", "field-id": 1},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2",
            "fields": [
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "referenced_data_file", "type": "string",
                 "field-id": 143},
                {"name": "content_offset", "type": "long", "field-id": 144},
                {"name": "content_size_in_bytes", "type": "long",
                 "field-id": 145},
            ]}},
    ],
}

ADDED, EXISTING = 1, 0
DATA_CONTENT, DELETE_CONTENT = 0, 1
# data_file.content values (field-id 134)
FILE_DATA, FILE_POS_DELETES, FILE_EQ_DELETES = 0, 1, 2


class IcebergCommitConflict(RuntimeError):
    """Another writer created this metadata version first."""


# ---------------------------------------------------------------------------
# Partition transforms (spec §Partition Transforms) — HIDDEN partitioning:
# the table declares (source column, transform) pairs; writers derive the
# partition tuple per row, the manifest records it per file, and readers
# prune FILES from the manifest walk — metadata-level pruning that never
# lists a directory and works the same at 100 TB. Transform results are
# spec-exact (bucket uses murmur3_x86_32 over the spec's serializations;
# Appendix B's published test vectors pin it in tests/test_iceberg.py).

def _murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (public domain, Austin Appleby) — the hash the
    Iceberg spec mandates for bucket transforms."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def bucket_transform(value, n: int) -> int:
    """Spec bucket[N]: (murmur3_x86_32(serialized) & Int.MAX) % N.
    ints/longs serialize as 8-byte little-endian (int hashes as long,
    so bucketing is widening-stable); strings as UTF-8 bytes."""
    if isinstance(value, int) and not isinstance(value, bool):
        data = (value & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    elif isinstance(value, str):
        data = value.encode("utf-8")
    else:
        raise NotImplementedError(
            f"bucket transform for {type(value).__name__} out of scope")
    return (_murmur3_32(data) & 0x7FFFFFFF) % n


def _transform_plan(name: str, transform: str, src_ice_type: str):
    """Resolve one (source column, transform) pair to
    (partition field name, result iceberg type, Spark Column builder).
    The Column builder stays JVM-side for everything except bucket[N]
    (murmur3 over spec serializations needs Python — emitted as an
    Arrow-batched pandas_udf, never row-at-a-time)."""
    from pyspark.sql import functions as F

    if transform == "identity":
        return name, src_ice_type, lambda: F.col(name)
    if transform == "year":
        return (f"{name}_year", "int",
                lambda: (F.year(name) - F.lit(1970)).cast("int"))
    if transform == "month":
        return (f"{name}_month", "int",
                lambda: ((F.year(name) - F.lit(1970)) * 12
                         + F.month(name) - F.lit(1)).cast("int"))
    if transform == "day":
        return (f"{name}_day", "int",
                lambda: F.datediff(F.to_date(name),
                                   F.lit("1970-01-01")).cast("int"))
    if transform.startswith("truncate[") and transform.endswith("]"):
        w = int(transform[len("truncate["):-1])
        if src_ice_type == "string":
            return (f"{name}_trunc", "string",
                    lambda: F.substring(F.col(name), 1, w))
        # spec: v - (((v % W) + W) % W) — floors toward -inf
        return (f"{name}_trunc", src_ice_type,
                lambda: F.expr(
                    f"{name} - ((({name} % {w}) + {w}) % {w})"))
    if transform.startswith("bucket[") and transform.endswith("]"):
        n = int(transform[len("bucket["):-1])

        def _col():
            # annotations resolve against MODULE globals under
            # `from __future__ import annotations` — hence the
            # module-level pandas import
            import pandas  # noqa: F401 — re-assert availability
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("int")
            def _bucket(s: "pandas.Series") -> "pandas.Series":
                return s.map(lambda v: bucket_transform(
                    v if isinstance(v, str) else int(v), n))

            return _bucket(F.col(name))

        return f"{name}_bucket", "int", _col
    raise NotImplementedError(f"partition transform {transform!r}")


def _meta_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def _commit_metadata(table: str, version: int, meta: dict) -> None:
    """The commit point, made SAFE for concurrent writers: the
    vN.metadata.json is created put-if-absent (O_CREAT|O_EXCL — the
    delta_log.commit_delta rule; a plain open(...,'w') would let the
    second of two racing commits silently overwrite the first, orphaning
    its files from the live view), then the version hint swings to it
    atomically. A loser gets IcebergCommitConflict and must RECOMPUTE
    from the new current metadata, not retry stale state.

    Every commit also maintains the spec's ``metadata-log`` — the
    lineage of previous metadata files with their timestamps (capped
    at 100 entries, the write.metadata.previous-versions-max idiom) —
    centralized HERE so every metadata writer gets it for free."""
    if version > 0:
        prev_name = f"v{version - 1}.metadata.json"
        prev_path = os.path.join(_meta_dir(table), prev_name)
        log = [e for e in (meta.get("metadata-log") or [])
               if e.get("metadata-file") != prev_name]
        if os.path.exists(prev_path):
            try:
                with open(prev_path) as f:
                    prev_ts = json.load(f).get("last-updated-ms")
            except (OSError, ValueError):
                prev_ts = None
            log.append({"timestamp-ms": prev_ts,
                        "metadata-file": prev_name})
        meta = {**meta, "metadata-log": log[-100:]}
    path = os.path.join(_meta_dir(table), f"v{version}.metadata.json")
    try:
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError:
        raise IcebergCommitConflict(f"metadata version {version} exists")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    tmp = os.path.join(_meta_dir(table), f".hint.tmp.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(_meta_dir(table), "version-hint.text"))


def _current_metadata(table: str) -> dict | None:
    hint = os.path.join(_meta_dir(table), "version-hint.text")
    if not os.path.exists(hint):
        return None
    with open(hint) as f:
        v = int(f.read().strip())
    # the hint is best-effort (two racing committers can swing it out
    # of order): probe FORWARD for newer committed versions — the
    # HadoopTables discovery rule, which makes a stale/backwards hint
    # harmless
    while os.path.exists(os.path.join(_meta_dir(table),
                                      f"v{v + 1}.metadata.json")):
        v += 1
    with open(os.path.join(_meta_dir(table), f"v{v}.metadata.json")) as f:
        return json.load(f)


def _ice_schema(schema: StructType) -> dict:
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        s = f.dataType.simpleString()
        if s not in _SPARK_TO_ICE:
            raise NotImplementedError(f"iceberg mapping for spark type {s!r}")
        fields.append({"id": i, "name": f.name, "required": not f.nullable,
                       "type": _SPARK_TO_ICE[s]})
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _evolve_ice_schema(current_schema: dict, schema: StructType,
                       merge_schema: bool) -> tuple[dict, int]:
    """Schema ENFORCEMENT + optional EVOLUTION for Iceberg appends,
    with the property the format exists for: existing columns KEEP
    their field-ids forever (equality_ids, partition source-ids and
    bound maps all reference them), and new columns get FRESH ids
    above the current last-column-id. Drift without ``merge_schema``,
    missing columns, and type conflicts raise. Returns
    (schema dict, new last-column-id)."""
    cur_fields = current_schema["fields"]
    cur_d = {f["name"]: f for f in cur_fields}
    new_pairs = []
    for f in schema.fields:
        st = f.dataType.simpleString()
        if st not in _SPARK_TO_ICE:
            raise NotImplementedError(f"iceberg mapping for spark type {st!r}")
        new_pairs.append((f.name, _SPARK_TO_ICE[st], not f.nullable))
    new_d = {n: t for n, t, _r in new_pairs}
    conflicts = [f"{n}: {cur_d[n]['type']} -> {t}" for n, t, _r in new_pairs
                 if n in cur_d and cur_d[n]["type"] != t]
    if conflicts:
        raise ValueError("schema type conflict on " + "; ".join(conflicts))
    missing = [f["name"] for f in cur_fields if f["name"] not in new_d]
    if missing:
        raise ValueError(f"write is missing table columns {missing}")
    extra = [n for n, _t, _r in new_pairs if n not in cur_d]
    last_id = max((f["id"] for f in cur_fields), default=0)
    if not extra:
        return current_schema, last_id
    if not merge_schema:
        raise ValueError(
            f"schema drift: new columns {extra} — pass merge_schema=True "
            "to evolve (new columns get fresh field-ids; existing ids "
            "never change)")
    fields = [dict(f) for f in cur_fields]
    for n, t, _req in new_pairs:
        if n in cur_d:
            continue
        last_id += 1
        # evolved columns are always optional: pre-evolution files
        # have no values for them
        fields.append({"id": last_id, "name": n, "required": False,
                       "type": t})
    return {"type": "struct", "schema-id": 0, "fields": fields}, last_id


def _fold_totals(parent_summary: dict | None, *, data_files: int = 0,
                 records: int = 0, files_size: int = 0,
                 delete_files: int = 0, pos_deletes: int = 0,
                 eq_deletes: int = 0) -> dict:
    """Spec total-* summary fields folded from the PARENT snapshot's
    summary — O(1) per commit, never a manifest walk; a parent written
    before these fields existed contributes 0 (stated honestly). The
    spec's semantics: total-records counts DATA file rows (MOR deletes
    do not decrement it — they increment total-position/equality-
    deletes instead), and a REPLACE passes parent_summary=None to
    restart the totals at its own numbers."""
    def g(k: str) -> int:
        try:
            return int((parent_summary or {}).get(k, 0))
        except (TypeError, ValueError):
            return 0

    return {
        "total-data-files": str(g("total-data-files") + data_files),
        "total-records": str(g("total-records") + records),
        "total-files-size": str(g("total-files-size") + files_size),
        "total-delete-files": str(g("total-delete-files") + delete_files),
        "total-position-deletes": str(
            g("total-position-deletes") + pos_deletes),
        "total-equality-deletes": str(
            g("total-equality-deletes") + eq_deletes),
    }


def append_iceberg(df: DataFrame, table: str, format_version: int = 1,
                   carry_forward: bool = True,
                   expected_snapshot_id: int | None = None,
                   summary_extra: dict | None = None,
                   partition_by: list[tuple[str, str]] | None = None,
                   merge_schema: bool = False,
                   branch: str | None = None,
                   sort_by: list | None = None,
                   staged_entries: list[dict] | None = None,
                   staged_schema: StructType | None = None) -> int:
    """Append df as a new snapshot; returns the snapshot id.
    ``format_version=2`` writes the v2 sequence-number machinery and
    unlocks delete_positions_iceberg on the table.
    ``carry_forward=False`` makes the new snapshot's manifest list
    contain ONLY this write's manifest — the REPLACE shape compaction
    needs (prior data and delete files leave the live view in the
    same atomic hint swap; history keeps them for time travel).
    ``expected_snapshot_id`` pins the commit to a snapshot the STAGED
    BYTES were computed from: any concurrent commit raises
    IcebergCommitConflict to the caller instead of retrying, because
    for a REPLACE the staged data is a function of the snapshot it
    read — blind-retrying stale bytes would resurrect a concurrently
    deleted row or drop a concurrent append from the live view (the
    lost-update class the Delta COW merge recomputes inside its own
    loop). Plain appends (expected_snapshot_id=None) retry safely:
    their bytes don't depend on the snapshot they land on.
    ``branch`` appends ON TOP OF a named ref instead of the main
    head: the snapshot carries prior manifests from the BRANCH head,
    the ref moves to it, and main (current-snapshot-id) stays where
    it was — the staging half of the write-audit-publish pattern
    (``fast_forward_iceberg`` is the publish half). A first write to
    an unknown branch name forks it from the current main head.
    ``sort_by`` ([col] or [(col, "asc"|"desc")]) declares the table's
    WRITE ORDER (spec sort orders): rows sort WITHIN each written file
    — sortWithinPartitions, no global shuffle — the order is recorded
    in table metadata and on each file's manifest entry
    (sort_order_id), and later plain appends INHERIT and apply the
    default order. Sorted files yield tight disjoint footer bounds,
    which is what makes the existing min/max stats skipping
    file-precise on range predicates at 100 TB."""
    from pyspark.sql import functions as F

    if format_version not in (1, 2, 3):
        raise ValueError("format_version must be 1, 2 or 3")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    os.makedirs(_meta_dir(table), exist_ok=True)

    # 1. data files — staged ONCE (the bytes don't depend on the
    # version we end up committing at; losers of commit races reuse
    # them on the recompute pass)
    spec: list[dict] = []
    staged_sid = 0
    manifest_schema = (_MANIFEST_SCHEMA_V3 if format_version == 3
                       else _MANIFEST_SCHEMA)
    # source-ids resolve against the LIVE table schema when one
    # exists (field-ids are forever and never track df column
    # order); _ice_schema(df.schema) — ids by incoming column
    # position — is only correct at table creation (ADVICE r6)
    pre = _current_metadata(table)
    if pre is not None and staged_entries is None:
        # v3 DEFAULT VALUES (spec "Default values"): a column with a
        # write-default fills when the writer omits it — the fill
        # happens BEFORE schema enforcement, so enforcement still
        # rejects genuinely-missing non-defaulted columns
        for f in pre["schema"]["fields"]:
            if "write-default" in f and f["name"] not in df.columns:
                df = df.withColumn(
                    f["name"],
                    F.lit(f["write-default"]).cast(
                        _ICE_TO_SPARK[f["type"]]))
    in_schema = df.schema if staged_entries is None else staged_schema
    schema_fields_pre = (pre["schema"]["fields"] if pre is not None
                         else _ice_schema(in_schema)["fields"])
    if staged_entries is not None:
        # PRE-STAGED lane (the pyiceberg DataSource writer): data
        # files already live under data/ with harvested footer bounds;
        # this call only runs the metadata commit. Write-order and
        # partitioning cannot be honored post-hoc, so both refuse.
        if partition_by or sort_by is not None:
            raise NotImplementedError(
                "staged appends are unpartitioned and unsorted — use "
                "the DataFrame lane for partition_by/sort_by")
        _orders_pre, _default_oid = _sort_orders(pre)
        if _orders_pre.get(_default_oid):
            raise NotImplementedError(
                "table declares a default write order — staged files "
                "cannot be sorted post-hoc; use the DataFrame lane")
        entries = [dict(e) for e in staged_entries]
        for e in entries:
            e["data_file"] = dict(e["data_file"])
            e["data_file"]["sort_order_id"] = 0
        staged_oid = 0
        sort_fields: list = []
    elif sort_by is not None:
        sort_fields, sort_cols = _resolve_sort_fields(
            schema_fields_pre, sort_by)
        staged_oid, _orders_pre = _assign_sort_order(pre, sort_fields)
    else:  # inherit the table's default write order
        orders_pre, default_oid = _sort_orders(pre)
        sort_fields = orders_pre.get(default_oid, [])
        staged_oid = default_oid if sort_fields else 0
        byid = {f["id"]: f["name"] for f in schema_fields_pre}
        sort_cols = [(byid[sf["source-id"]], sf["direction"] == "asc")
                     for sf in sort_fields]
    if staged_entries is None:
        if sort_cols and not partition_by:
            # non-partitioned path sorts here; the partitioned path
            # sorts AFTER its own partition shuffle (sorting now would
            # be a full wasted pass — the repartition destroys the
            # order)
            df = df.sortWithinPartitions(*[
                F.col(c).asc_nulls_first() if asc
                else F.col(c).desc_nulls_last()
                for c, asc in sort_cols])
        if partition_by:
            proposed, plan = _resolve_partition_spec(
                schema_fields_pre, partition_by)
            # spec EVOLUTION: match-or-allocate against the table's
            # specs (the staged manifest schema depends on the final
            # field-ids, so resolution happens pre-staging; a
            # concurrent spec change is re-checked inside the OCC loop)
            staged_sid, spec, _specs_pre, _pid_pre = _assign_spec(
                pre, proposed)
            manifest_schema = _manifest_schema_partitioned(
                spec, plan, base_schema=manifest_schema)
            entries = _stage_data_files_partitioned(df, table, plan,
                                                    sort_cols=sort_cols)
        else:
            entries = _stage_data_files(df, table)
        for e in entries:
            e["data_file"]["sort_order_id"] = staged_oid

    for _ in range(10):  # snapshot-pinned OCC (the delta_log rule)
        current = _current_metadata(table)
        if current is not None and current["format-version"] != format_version:
            raise ValueError(
                f"table is format-version {current['format-version']}, "
                f"append requested {format_version}")
        if expected_snapshot_id is not None and (
                current is None
                or current["current-snapshot-id"] != expected_snapshot_id):
            raise IcebergCommitConflict(
                f"table advanced past snapshot {expected_snapshot_id}; "
                "staged bytes are stale — caller must recompute")
        version = 0 if current is None else current["last-version"] + 1
        snapshot_id = version + 1  # deterministic, monotone
        seq = ((current or {}).get("last-sequence-number", 0) or 0) + 1
        if current is None:
            table_schema = _ice_schema(in_schema)
            last_col_id = len(in_schema.fields)
        else:
            # ENFORCED against the live schema; field-ids are forever
            table_schema, last_col_id = _evolve_ice_schema(
                current["schema"], in_schema, merge_schema)
        for e in entries:
            e["snapshot_id"] = snapshot_id
        first_rid = None
        next_rid = None
        if format_version == 3:
            # ROW LINEAGE (spec v3): every data file gets the table-
            # wide id of its first row from the next-row-id counter;
            # ids assign per OCC attempt (the counter moves with
            # concurrent commits) and are NEVER reused. Rewrites
            # (compaction) allocate fresh ids — the spec permits
            # non-preserving writers; stated honestly.
            next_rid = int((current or {}).get("next-row-id", 0) or 0)
            first_rid = next_rid
            for e in entries:
                e["data_file"]["first_row_id"] = next_rid
                next_rid += e["data_file"]["record_count"]
        # bounds bind against the RESOLVED table schema (field-ids
        # are the table's forever, not the incoming frame's order)
        _bind_bounds(entries, table_schema["fields"])

        # 2. resolve this commit's partition spec against the CURRENT
        # metadata (spec evolution: multiple specs coexist, each
        # manifest records its own spec-id)
        _cur_specs, cur_default = _specs(current)
        if partition_by:
            used_sid, spec_now, specs_final, last_pid = _assign_spec(
                current, proposed)
            if (used_sid != staged_sid
                    or [f["field-id"] for f in spec_now]
                    != [f["field-id"] for f in spec]):
                # a concurrent writer changed the spec table under us:
                # the staged manifest's partition field-ids are stale
                raise IcebergCommitConflict(
                    "concurrent partition-spec change — restage")
            default_sid = used_sid
        else:
            used_sid, specs_final = _plain_spec_assignment(current)
            last_pid = _last_partition_id(current, specs_final)
            default_sid = cur_default if current is not None else 0

        # sort-order resolution against CURRENT metadata (orders are
        # append-only, so an inherited order always survives; an
        # explicit sort_by that lost an id race must restage — its
        # manifest already embeds the staged order id)
        if sort_by is not None:
            used_oid, orders_final = _assign_sort_order(current, sort_fields)
            if used_oid != staged_oid:
                raise IcebergCommitConflict(
                    "concurrent sort-order change — restage")
            default_oid_final = used_oid
        else:
            orders_final, default_oid_final = _sort_orders(current)
            if staged_oid not in orders_final:  # defensive: append-only
                orders_final = {**orders_final, staged_oid: sort_fields}

        # 3. manifest for this snapshot (a lost race orphans it —
        # unreferenced, harmless)
        manifest_rel = os.path.join(
            "metadata", f"manifest-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        manifest_blob = write_avro(entries, manifest_schema, codec="deflate")
        with open(os.path.join(table, manifest_rel), "wb") as f:
            f.write(manifest_blob)

        # 3. manifest list: carry prior manifests forward + the new one
        refs = dict((current or {}).get("refs") or {})
        if branch is not None and current is None:
            raise ValueError("cannot branch an empty table")
        base_sid = None
        if current is not None:
            base_sid = current["current-snapshot-id"]
            if branch is not None and branch in refs:
                if refs[branch].get("type") != "branch":
                    raise ValueError(f"ref {branch!r} is a tag, not a branch")
                base_sid = refs[branch]["snapshot-id"]
        prior = []
        if current is not None and carry_forward:
            snap = _snapshot(current, base_sid)
            prior_list, _ = read_avro(_read_file(table, snap["manifest-list"]))
            prior = prior_list
        new_entry = {
            "manifest_path": manifest_rel,
            "manifest_length": len(manifest_blob),
            "partition_spec_id": used_sid,
            "added_snapshot_id": snapshot_id,
        }
        if format_version >= 2:
            new_entry["content"] = DATA_CONTENT
            new_entry["sequence_number"] = seq
        mlist = prior + [new_entry]
        mlist_rel = os.path.join(
            "metadata", f"snap-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        list_schema = (_MANIFEST_LIST_SCHEMA_V2 if format_version >= 2
                       else _MANIFEST_LIST_SCHEMA)
        with open(os.path.join(table, mlist_rel), "wb") as f:
            f.write(write_avro(mlist, list_schema, codec="deflate"))

        # 4. new metadata.json via put-if-absent + hint swap
        now_ms = int(time.time() * 1000)
        added_records = sum(e["data_file"]["record_count"]
                            for e in entries)
        added_size = sum(e["data_file"]["file_size_in_bytes"]
                         for e in entries)
        # spec TOTAL-* summary fields: running totals folded from the
        # parent snapshot's summary (O(1) — never a manifest walk; a
        # parent written before these fields existed contributes 0,
        # stated honestly). A REPLACE (carry_forward=False) restarts
        # the totals at this write's own numbers — the manifest list
        # holds only this write.
        base_summary: dict | None = None
        if current is not None and carry_forward:
            base_summary = (_snapshot(current, base_sid).get("summary")
                            or {})
        changed_parts = (len({tuple(sorted(
            (e["data_file"].get("partition") or {}).items()))
            for e in entries}) if entries else 0)
        new_snap = {
            "snapshot-id": snapshot_id, "timestamp-ms": now_ms,
            "parent-snapshot-id": base_sid,
            "manifest-list": mlist_rel,
            # spec summary counts (what engines and inspect tooling
            # read to answer "what did this commit do" without a
            # manifest walk)
            "summary": {
                "operation": "append",
                "added-data-files": str(len(entries)),
                "added-records": str(added_records),
                "added-files-size": str(added_size),
                "changed-partition-count": str(changed_parts),
                **_fold_totals(base_summary, data_files=len(entries),
                               records=added_records,
                               files_size=added_size),
                **(summary_extra or {}),
            },
        }
        if format_version >= 2:
            new_snap["sequence-number"] = seq
        if format_version == 3:
            new_snap["first-row-id"] = first_rid
        snapshots = (current["snapshots"] if current else []) + [new_snap]
        meta = {
            "format-version": format_version,
            "table-uuid": (current or {}).get("table-uuid", str(uuid.uuid4())),
            "location": os.path.abspath(table),
            "last-updated-ms": now_ms,
            "last-column-id": last_col_id,
            "schema": table_schema,
            # spec v2 multi-spec keys + the legacy single-spec mirror
            # (= the default spec's fields) for older readers
            "partition-specs": [{"spec-id": s, "fields": fl}
                                for s, fl in sorted(specs_final.items())],
            "default-spec-id": default_sid,
            "last-partition-id": last_pid,
            "partition-spec": specs_final.get(default_sid, []),
            "sort-orders": [{"order-id": o, "fields": fl}
                            for o, fl in sorted(orders_final.items())],
            "default-sort-order-id": default_oid_final,
            # properties and the metadata-log lineage CARRY — an
            # append must not erase table-level configuration, and
            # _commit_metadata can only APPEND to a lineage the new
            # metadata actually brought along
            "properties": dict((current or {}).get("properties") or {}),
            "metadata-log": list((current or {}).get("metadata-log") or []),
            # registered partition-statistics files carry too (their
            # snapshots may still be live; expiry retires them)
            "partition-statistics": list(
                (current or {}).get("partition-statistics") or []),
            # a branch append NEVER moves main — preserve the previous
            # metadata's head verbatim (base_sid is the BRANCH base,
            # which after the first branch commit is not main anymore)
            "current-snapshot-id": (current["current-snapshot-id"]
                                    if branch is not None else snapshot_id),
            "refs": ({**refs, branch: {"snapshot-id": snapshot_id,
                                       "type": "branch"}}
                     if branch is not None else refs),
            "snapshots": snapshots,
            "last-version": version,
        }
        if format_version >= 2:
            meta["last-sequence-number"] = seq
        if format_version == 3:
            meta["next-row-id"] = next_rid
        try:
            _commit_metadata(table, version, meta)
            return snapshot_id
        except IcebergCommitConflict:
            if expected_snapshot_id is not None:
                raise  # stale staged bytes: caller recomputes
            continue  # recompute from the new current metadata
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


_PART_TO_AVRO = {"int": "int", "long": "long", "string": "string"}


def _specs(meta: dict | None) -> tuple[dict[int, list[dict]], int]:
    """Partition specs by spec-id plus the default spec-id, reading
    both the spec-v2 multi-spec keys (``partition-specs`` +
    ``default-spec-id``) and the legacy single ``partition-spec``
    (implicitly spec 0)."""
    if meta is None:
        return {}, 0
    if "partition-specs" in meta:
        return ({s["spec-id"]: s["fields"] for s in meta["partition-specs"]},
                meta.get("default-spec-id", 0))
    return {0: meta.get("partition-spec", [])}, 0


def _spec_semantics(fields: list[dict]) -> tuple:
    return tuple((f["name"], f["transform"], f["source-id"])
                 for f in fields)


def _last_partition_id(meta: dict | None,
                       specs: dict[int, list[dict]]) -> int:
    known = [f["field-id"] for fl in specs.values() for f in fl]
    recorded = (meta or {}).get("last-partition-id", 999)
    return max([recorded, 999] + known)


def _assign_spec(meta: dict | None, proposed: list[dict]
                 ) -> tuple[int, list[dict], dict[int, list[dict]], int]:
    """PARTITION SPEC EVOLUTION (spec v2): match ``proposed`` fields
    (name/transform/source-id; field-ids tentative) against the
    table's existing specs. An exact semantic match reuses that spec
    verbatim — same spec-id, same field-ids. Otherwise a NEW spec-id
    is allocated; its partition-field-ids REUSE the id of any existing
    field with the same (source-id, transform) — the spec's rule that
    an unchanged partition field keeps its id across spec versions, so
    old manifests' tuples stay addressable — and fresh ids above
    last-partition-id for genuinely new fields. Returns
    (spec_id, fields, specs_by_id incl. the new one, last_partition_id).
    """
    specs, _default = _specs(meta)
    if not specs and meta is None:
        last = max([f["field-id"] for f in proposed], default=999)
        return 0, proposed, {0: proposed}, last
    for sid in sorted(specs):
        if _spec_semantics(specs[sid]) == _spec_semantics(proposed):
            return sid, specs[sid], specs, _last_partition_id(meta, specs)
    last_pid = _last_partition_id(meta, specs)
    by_src_transform = {}
    for fl in specs.values():
        for g in fl:
            by_src_transform.setdefault(
                (g["source-id"], g["transform"]), g["field-id"])
    fields = []
    for f in proposed:
        fid = by_src_transform.get((f["source-id"], f["transform"]))
        if fid is None:
            last_pid += 1
            fid = last_pid
        fields.append({**f, "field-id": fid})
    new_sid = max(specs, default=-1) + 1
    return new_sid, fields, {**specs, new_sid: fields}, last_pid


def _plain_spec_assignment(meta: dict | None
                           ) -> tuple[int, dict[int, list[dict]]]:
    """Spec id for an UNPARTITIONED manifest: reuse an existing
    unpartitioned spec, else allocate one (without touching the
    default) — plain appends into a partitioned table stay legal and
    their manifests record a truthful spec."""
    specs, _default = _specs(meta)
    if not specs:
        return 0, {0: []}
    for sid in sorted(specs):
        if not specs[sid]:
            return sid, specs
    new_sid = max(specs) + 1
    return new_sid, {**specs, new_sid: []}


def _delete_manifest_spec_id(meta: dict) -> int:
    """Spec id recorded on DELETE manifests (which carry no partition
    tuples here): an existing unpartitioned spec when the table has
    one, else 0 — a documented simplification for partitioned-at-birth
    tables; readers never partition-prune delete manifests."""
    specs, _default = _specs(meta)
    for sid in sorted(specs):
        if not specs[sid]:
            return sid
    return 0


# ---------------------------------------------------------------------------
# SORT ORDERS (spec "Sort Orders"): table metadata carries a list of
# immutable sort orders ({order-id, fields: [{transform, source-id,
# direction, null-order}]}) plus default-sort-order-id; each data
# file's manifest entry records which order produced its row layout
# (sort_order_id, field-id 140; 0 = unsorted). Semantics here:
# ``append_iceberg(sort_by=...)`` sorts rows WITHIN each written file
# (sortWithinPartitions — no global shuffle) and sets the table's
# default write order, which later plain appends INHERIT and apply.
# The payoff is bounds quality: sorted files have tight, mostly
# disjoint min/max ranges, so the existing stats skipping prunes
# range predicates file-precisely. Identity transforms only (stated).

def _sort_orders(meta: dict | None) -> tuple[dict[int, list[dict]], int]:
    """{order-id: fields} and the default order id; order 0 (the
    spec's reserved 'unsorted') always exists."""
    if meta is None or "sort-orders" not in meta:
        return {0: []}, 0
    return ({o["order-id"]: o["fields"] for o in meta["sort-orders"]},
            meta.get("default-sort-order-id", 0))


def _resolve_sort_fields(schema_fields: list[dict], sort_by):
    """Normalize user sort_by (["col", ...] or [("col", "asc"|"desc"),
    ...]) into spec sort fields + [(column, ascending)] apply plan.
    Null ordering follows the engines' defaults: asc=nulls-first,
    desc=nulls-last."""
    by_name = {f["name"]: f for f in schema_fields}
    fields: list[dict] = []
    names: list[tuple[str, bool]] = []
    for item in sort_by:
        col, direction = (item, "asc") if isinstance(item, str) else item
        if direction not in ("asc", "desc"):
            raise ValueError(f"sort direction must be asc|desc: {direction!r}")
        if col not in by_name:
            raise KeyError(f"sort column {col!r} not in table schema "
                           f"(have {sorted(by_name)})")
        fields.append({
            "transform": "identity",
            "source-id": by_name[col]["id"],
            "direction": direction,
            "null-order": "nulls-first" if direction == "asc"
                          else "nulls-last",
        })
        names.append((col, direction == "asc"))
    return fields, names


def _assign_sort_order(meta: dict | None,
                       fields: list[dict]) -> tuple[int, dict[int, list[dict]]]:
    """Match-or-allocate, the _assign_spec rule: an existing order with
    identical semantics is reused verbatim (orders are immutable),
    else the next order-id is allocated."""
    orders, _default = _sort_orders(meta)
    for oid in sorted(orders):
        if orders[oid] == fields:
            return oid, orders
    oid = max(orders) + 1
    return oid, {**orders, oid: fields}


def _resolve_partition_spec(schema_fields: list[dict],
                            partition_by: list[tuple[str, str]]):
    """Build (spec descriptor for metadata.json, staging plan).
    spec descriptor rows follow the v1 ``partition-spec`` shape:
    {name, transform, source-id, field-id (1000+i, the spec's
    partition-field id space)}."""
    by_name = {f["name"]: f for f in schema_fields}
    spec, plan = [], []
    for i, (col, transform) in enumerate(partition_by):
        if col not in by_name:
            raise KeyError(f"partition source column {col!r} not in schema")
        pname, ptype, colfn = _transform_plan(
            col, transform, by_name[col]["type"])
        if ptype not in _PART_TO_AVRO:
            raise NotImplementedError(
                f"partition value type {ptype} out of scope")
        spec.append({"name": pname, "transform": transform,
                     "source-id": by_name[col]["id"],
                     "field-id": 1000 + i})
        plan.append((pname, ptype, colfn))
    return spec, plan


def _manifest_schema_partitioned(spec: list[dict],
                                 plan: list[tuple],
                                 base_schema: dict | None = None) -> dict:
    """Manifest schema whose data_file carries the spec's ``partition``
    record (field-id 102; one field per partition field, typed by the
    transform's result type, ids from the 1000+ space)."""
    part_fields = [
        {"name": s["name"], "type": _PART_TO_AVRO[ptype],
         "field-id": s["field-id"]}
        for s, (_n, ptype, _c) in zip(spec, plan)]
    src = base_schema or _MANIFEST_SCHEMA
    base = [dict(f) for f in src["fields"]]
    data_file = {
        "type": "record", "name": "r2",
        "fields": list(src["fields"][2]["type"]["fields"]) + [
            {"name": "partition", "field-id": 102, "type": {
                "type": "record", "name": "r102", "fields": part_fields}},
        ]}
    return {
        "type": "record", "name": "manifest_entry",
        "fields": [base[0], base[1],
                   {"name": "data_file", "field-id": 2, "type": data_file}],
    }


def _stage_data_files_partitioned(df: DataFrame, table: str,
                                  plan: list[tuple],
                                  sort_cols: list[tuple[str, bool]]
                                  | None = None) -> list[dict]:
    """Partitioned staging: derive the partition tuple per row (hidden
    partitioning — the USER never sees or maintains these columns),
    write one parquet tree partitioned by the tuple, and record each
    file's tuple in its manifest entry. The repartition puts one
    partition value per task — right for bounded tuples (months,
    buckets); a production writer would additionally split oversized
    partitions by target file size (stated, not needed at test SFs)."""
    from urllib.parse import unquote

    from pyspark.sql import functions as F

    staging_cols = [f"_p{i}" for i in range(len(plan))]
    aug = df
    for sc, (_pname, _ptype, colfn) in zip(staging_cols, plan):
        aug = aug.withColumn(sc, colfn())
    scratch = os.path.join(table, f"_staging_{uuid.uuid4().hex}")
    shuffled = aug.repartition(*[F.col(c) for c in staging_cols])
    if sort_cols:  # the table's write order, re-applied AFTER the
        # partition shuffle (which would otherwise destroy it)
        shuffled = shuffled.sortWithinPartitions(*[
            F.col(c).asc_nulls_first() if asc else F.col(c).desc_nulls_last()
            for c, asc in sort_cols])
    (shuffled
     .write.partitionBy(*staging_cols).mode("overwrite").parquet(scratch))
    entries = []
    for root_dir, _dirs, files in os.walk(scratch):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            rel = os.path.relpath(root_dir, scratch)
            raw = dict(seg.split("=", 1)
                       for seg in rel.split(os.sep) if "=" in seg)
            pvals: dict = {}
            for sc, (pname, ptype, _c) in zip(staging_cols, plan):
                v = unquote(raw[sc])
                if v == "__HIVE_DEFAULT_PARTITION__":
                    raise NotImplementedError(
                        "null partition values out of scope")
                pvals[pname] = v if ptype == "string" else int(v)
            final = os.path.join("data", f"{uuid.uuid4().hex}.parquet")
            os.replace(os.path.join(root_dir, fn),
                       os.path.join(table, final))
            lower, upper = _footer_bounds(os.path.join(table, final))
            entries.append({
                "status": ADDED, "snapshot_id": 0,
                "data_file": {
                    "file_path": final, "file_format": "PARQUET",
                    "record_count": _parquet_rows(
                        os.path.join(table, final)),
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(table, final)),
                    "_raw_bounds": (lower, upper),
                    "lower_bounds": [], "upper_bounds": [],
                    "sort_order_id": 0,
                    "partition": pvals,
                }})
    shutil.rmtree(scratch, ignore_errors=True)
    entries.sort(key=lambda e: e["data_file"]["file_path"])
    return entries


def _stage_data_files(df: DataFrame, table: str) -> list[dict]:
    """Write df's partitions as parquet under ``data/`` and return
    ADDED manifest entries (snapshot_id stamped later, per commit
    attempt). Staged bytes are snapshot-independent, so OCC losers
    reuse them."""
    scratch = os.path.join(table, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(scratch)
    entries = []
    for name in sorted(os.listdir(scratch)):
        if not name.endswith(".parquet"):
            continue
        final = os.path.join("data", f"{uuid.uuid4().hex}.parquet")
        os.replace(os.path.join(scratch, name), os.path.join(table, final))
        lower, upper = _footer_bounds(os.path.join(table, final))
        entries.append({
            "status": ADDED, "snapshot_id": 0,  # stamped per attempt
            "data_file": {
                "file_path": final, "file_format": "PARQUET",
                # record_count per file needs a footer read; the spec
                # requires it, so read it (cheap metadata-only)
                "record_count": _parquet_rows(os.path.join(table, final)),
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(table, final)),
                "_raw_bounds": (lower, upper),
                "lower_bounds": [], "upper_bounds": [],
                "sort_order_id": 0,
            }})
    shutil.rmtree(scratch, ignore_errors=True)
    return entries


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _footer_bounds(path: str) -> tuple[dict, dict]:
    """Per-column (lower, upper) bounds from the parquet footer's
    row-group statistics — a metadata-only read, the same harvest
    delta_log._file_stats_json does for Delta's stats skipping.
    Values are rendered as decimal strings; only int/float/string
    stats participate (bytes/timestamps skipped — fail-open)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            if "." in name:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if not isinstance(mn, (int, float, str)) or isinstance(
                    mn, bool):
                continue
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    return mins, maxs


def _read_file(table: str, rel: str) -> bytes:
    with open(os.path.join(table, rel), "rb") as f:
        return f.read()


def _snapshot(meta: dict, snapshot_id: int) -> dict:
    for s in meta["snapshots"]:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise FileNotFoundError(
        f"snapshot {snapshot_id} not in table "
        f"(have {[s['snapshot-id'] for s in meta['snapshots']]})")


_ICE_TO_SPARK = {"long": "bigint", "int": "int", "double": "double",
                 "float": "float", "string": "string", "boolean": "boolean",
                 "binary": "binary", "date": "date",
                 "timestamptz": "timestamp"}


def _translate_partition_filter(partition_filter: dict,
                                filter_fids: dict,
                                spec_fields: list[dict]) -> dict:
    """Re-key a partition_filter (names as of the DEFAULT spec) for a
    manifest written under ``spec_fields`` (possibly another spec).
    Matching is by partition FIELD-ID — two specs sharing a field-id
    share (source column, transform) by construction, so the filter's
    values mean the same thing for both — never by bare name, which
    could collide across specs with different transforms. Filter
    entries whose field-id is absent from this spec drop out: those
    files fail open and scan."""
    by_fid = {f["field-id"]: f["name"] for f in spec_fields}
    names = {f["name"] for f in spec_fields}
    out = {}
    for name, allowed in partition_filter.items():
        fid = filter_fids.get(name)
        if fid is not None and fid in by_fid:
            out[by_fid[fid]] = allowed
        elif fid is None and name in names:
            # name unknown to the default spec but present here: honor
            # it by name (caller explicitly targeted this spec)
            out[name] = allowed
    return out


def _partition_pruned(data_file: dict, partition_filter: dict) -> bool:
    """True when the file's recorded partition tuple PROVES it holds
    no matching rows. Files without a tuple (written before the spec,
    or by the unpartitioned writers) are never pruned — fail-open."""
    part = data_file.get("partition")
    if not isinstance(part, dict):
        return False
    for name, allowed in partition_filter.items():
        if name not in part:
            continue  # fail-open on unknown fields
        vals = allowed if isinstance(allowed, (list, tuple, set)) else [allowed]
        if part[name] not in vals:
            return True
    return False


def _stats_pruned(data_file: dict, stats_filter: dict,
                  schema_fields: list[dict]) -> bool:
    """True when the file's recorded [lower, upper] bounds PROVE the
    wanted range [lo, hi] cannot intersect it. Bounds are the spec's
    field-id-keyed single-value-binary maps (Avro array-of-kv-records
    shape). Fail-open everywhere: missing bounds, unknown columns,
    undecodable values all scan."""
    lower = data_file.get("lower_bounds")
    upper = data_file.get("upper_bounds")
    if not isinstance(lower, list) or not isinstance(upper, list):
        return False
    lo_by_fid = {kv["key"]: kv["value"] for kv in lower}
    hi_by_fid = {kv["key"]: kv["value"] for kv in upper}
    meta_by_name = {f["name"]: (f["id"], f["type"]) for f in schema_fields}
    for col, (lo, hi) in stats_filter.items():
        if col not in meta_by_name:
            continue
        i, t = meta_by_name[col]
        if i not in lo_by_fid or i not in hi_by_fid:
            continue
        try:
            fmn = _single_value_unbin(t, lo_by_fid[i])
            fmx = _single_value_unbin(t, hi_by_fid[i])
        except Exception:
            continue
        if fmn is None or fmx is None:
            continue
        if (hi is not None and fmn > hi) or (lo is not None and fmx < lo):
            return True
    return False


def read_iceberg(spark: SparkSession, table: str,
                 snapshot_id: int | None = None,
                 partition_filter: dict | None = None,
                 stats_filter: dict | None = None,
                 scan_stats: dict | None = None,
                 ref: str | None = None,
                 timestamp_ms: int | None = None,
                 with_row_ids: bool = False) -> DataFrame:
    """Snapshot read (current, or time travel to ``snapshot_id``).
    On format-version 2 tables, position deletes apply as a broadcast
    anti-join on (file, row position) and EQUALITY deletes as
    broadcast anti-joins on their key columns, scoped by sequence
    number (an equality delete at sequence S drops rows only from
    data files with sequence STRICTLY below S — the spec rule that
    makes same-snapshot upsert batches self-consistent). Both delete
    sides are metadata-small and broadcast; the data side is one
    distributed parquet scan — the merge-on-read path.

    ``partition_filter`` ({partition field name: value or list of
    values}) prunes FILES during the manifest walk — hidden
    partitioning's payoff: at 100 TB the reader plans from O(files)
    metadata and never opens a pruned file's footer, let alone lists
    a directory. Pruning is proof-based and fail-open: files with no
    recorded tuple (older spec, unpartitioned writers) always scan.
    ``stats_filter`` ({column: (lo, hi)}, either bound None for
    open-ended) prunes files whose recorded footer-harvested
    lower/upper bounds prove the range empty — Iceberg's min/max file
    skipping, the manifest-level sibling of parquet row-group
    pruning and of Delta's pruned_read_delta. Both pruners are
    OPTIMIZATIONS: callers still apply the row filter.
    ``scan_stats`` (out-param dict) receives files_total /
    files_scanned so callers can CERTIFY pruning instead of trusting
    it."""
    from pyspark.sql import functions as F

    plan = plan_scan_iceberg(
        table, snapshot_id=snapshot_id, partition_filter=partition_filter,
        stats_filter=stats_filter, scan_stats=scan_stats, ref=ref,
        timestamp_ms=timestamp_ms)
    meta = plan["meta"]
    paths = plan["paths"]
    pos_delete_files = plan["pos_delete_files"]
    pos_delete_records = plan["pos_delete_records"]
    dv_descriptors = plan["dv_descriptors"]
    eq_deletes = plan["eq_deletes"]
    fields = meta["schema"]["fields"]
    ddl = ", ".join(
        f"{f['name']} {_ICE_TO_SPARK[f['type']]}" for f in fields)
    if with_row_ids and meta["format-version"] != 3:
        # validated BEFORE the empty-scan shortcut: an empty v1/v2
        # table must refuse, not silently serve a lineage-less frame
        raise ValueError(
            "row lineage needs a format-version 3 table whose live "
            "files all carry first_row_id (v3 ROW LINEAGE — the spec "
            "assigns ids at commit; pre-lineage files have none)")
    if not paths:
        if with_row_ids:
            # empty scans keep the contract: the _row_id column exists
            return spark.createDataFrame([], ddl + ", _row_id long")
        return spark.createDataFrame([], ddl)
    nm = _name_mapping_property(meta)
    if nm:
        # schema.name-mapping.default (spec): parquet columns resolve
        # through the mapping's names — the lane that makes UniForm-
        # synced column-mapping Delta tables readable (their parquet
        # stores PHYSICAL names; the Iceberg schema carries logical)
        scan_ddl = ", ".join(
            f"`{nm.get(f['id'], f['name'])}` {_ICE_TO_SPARK[f['type']]}"
            for f in fields)
        sel = [F.col(nm.get(f["id"], f["name"])).alias(f["name"])
               for f in fields]
    else:
        scan_ddl = ddl
        sel = [F.col(f["name"]) for f in fields]
    # v3 DEFAULT VALUES (spec "Default values"): initial-default
    # fills a column for files written BEFORE it existed — those files
    # have data sequence at or below the add-time boundary the column
    # records, so the pre set is pure plan metadata
    init_fill: dict[str, tuple] = {}
    for f in fields:
        if "initial-default" in f and f.get("_added_at_seq") is not None:
            pre_files = {p for p, s in paths if s <= f["_added_at_seq"]}
            if pre_files:
                init_fill[f["name"]] = (
                    pre_files, f["initial-default"], f["type"])
    fr_ids = plan["first_row_ids"]
    if with_row_ids and {p for p, _s in paths} - set(fr_ids):
        raise ValueError(
            "row lineage: live files without first_row_id in a "
            "format-version 3 table (pre-lineage files — rewrite them "
            "via compaction to assign ids)")
    raw = spark.read.schema(scan_ddl).parquet(
        *[os.path.join(table, p) for p, _s in paths])
    df = raw.select(*sel) if nm else raw
    if (not pos_delete_files and not eq_deletes and not dv_descriptors
            and not with_row_ids and not init_fill):
        return df
    cols = [f["name"] for f in fields]
    root = os.path.abspath(table)
    # _metadata must resolve on the SCAN relation, so project the
    # logical aliases and the metadata columns in one select from raw
    tagged = raw.select(
        *sel,
        _rel_path_col(root).alias("_fp"),
        F.col("_metadata.row_index").alias("_pos"),
    )
    # v3 initial-default fill happens BEFORE the delete anti-joins:
    # an equality delete keyed on a defaulted column must see the
    # spec-effective value, not the scan's NULL (review finding —
    # filling after the joins makes deletes miss pre-add rows)
    for name in sorted(init_fill):
        pre_files, val, ice_t = init_fill[name]
        flag = f"_init_{name}"
        pre_df = spark.createDataFrame(
            [(p,) for p in sorted(pre_files)], "_fp string"
        ).withColumn(flag, F.lit(True))
        tagged = tagged.join(F.broadcast(pre_df), "_fp", "left")
        tagged = tagged.withColumn(
            name,
            F.when(F.col(flag).isNotNull(),
                   F.lit(val).cast(_ICE_TO_SPARK[ice_t]))
            .otherwise(F.col(name)))
    if pos_delete_files or dv_descriptors:
        frames = []
        if pos_delete_files:
            frames.append(_pos_delete_frame(spark, root, pos_delete_files))
        if dv_descriptors:
            frames.append(_dv_delete_frame(spark, root, dv_descriptors))
        ddf = frames[0]
        for extra in frames[1:]:
            ddf = ddf.unionByName(extra)
        # broadcast only when the manifests PROVE the delete side is
        # small (record_count is required file metadata, so the
        # decision is plan-time and O(files)); past the cap, leave the
        # strategy to Spark/AQE — a 1e8-position delete set must not
        # be forced through a broadcast build
        if pos_delete_records <= _POS_DELETE_BROADCAST_MAX:
            ddf = F.broadcast(ddf)
        tagged = tagged.join(ddf, ["_fp", "_pos"], "left_anti")
    if eq_deletes:
        # rows need their file's data sequence to scope the deletes;
        # the (file -> seq) map is O(files) metadata, broadcast
        seq_df = spark.createDataFrame(
            [(p, s) for p, s in paths], "_fp string, _dseq long")
        # LEFT join: if _rel_path_col's prefix guard ever nulled a
        # path, the row keeps a null _dseq and SURVIVES the scoped
        # anti-joins below (fail-open beats silently dropping data)
        tagged = tagged.join(F.broadcast(seq_df), "_fp", "left")
        name_to_type = {f["name"]: _ICE_TO_SPARK[f["type"]]
                        for f in meta["schema"]["fields"]}
        for names, bucket in sorted(eq_deletes.items()):
            kddl = ", ".join(
                f"_eq_{n} {name_to_type[n]}" for n in names
            ) + ", _eseq long"
            kdf = spark.createDataFrame(
                [tuple(k) + (s,) for k, s in sorted(bucket.items())], kddl)
            cond = F.col("_dseq") < kdf["_eseq"]
            for n in names:
                # eqNullSafe: the spec matches NULL delete values to
                # NULL data values (equality, not SQL three-valued =)
                cond = cond & tagged[n].eqNullSafe(kdf[f"_eq_{n}"])
            tagged = tagged.join(F.broadcast(kdf), cond, "left_anti")
    if with_row_ids:
        # ROW LINEAGE read: _row_id = the file's first_row_id + the
        # row's physical position — stable across MOR deletes (masked
        # rows dropped above never renumber survivors) and O(files)
        # broadcast metadata, the read_delta_with_row_ids twin
        rid_df = spark.createDataFrame(
            [(p, fr_ids[p]) for p, _s in paths], "_fp string, _frid long")
        tagged = tagged.join(F.broadcast(rid_df), "_fp", "left")
        return tagged.select(
            *cols, (F.col("_frid") + F.col("_pos")).alias("_row_id"))
    return tagged.select(*cols)


def plan_scan_iceberg(table: str,
                      snapshot_id: int | None = None,
                      partition_filter: dict | None = None,
                      stats_filter: dict | None = None,
                      scan_stats: dict | None = None,
                      ref: str | None = None,
                      timestamp_ms: int | None = None) -> dict:
    """The manifest-walk PLANNING half of read_iceberg, shared verbatim
    with the batch DataSource lane (sources/lakehouse_ds.py) so SQL
    reads prune identically to library reads by construction. Returns
    {meta, snapshot_id, paths: [(rel, data seq)], pos_delete_files,
    pos_delete_records, eq_deletes: {key names: {key tuple: max seq}}}.
    O(files) driver metadata; no data file is opened."""
    meta = _current_metadata(table)
    if meta is None:
        raise FileNotFoundError(f"no iceberg metadata under {table}")
    if meta["format-version"] not in (1, 2, 3):
        raise NotImplementedError("only format-version 1/2/3 readable here")
    if timestamp_ms is not None:
        # TIMESTAMP AS OF (the spec's snapshot-log rule): newest
        # snapshot with timestamp-ms at or before the asked instant
        if snapshot_id is not None or ref is not None:
            raise ValueError(
                "pass exactly one of snapshot_id / ref / timestamp_ms")
        eligible = [s2 for s2 in meta["snapshots"]
                    if s2["timestamp-ms"] <= timestamp_ms]
        if not eligible:
            raise ValueError(
                f"timestamp {timestamp_ms} precedes the first snapshot")
        snapshot_id = max(eligible, key=lambda s2: s2["timestamp-ms"])[
            "snapshot-id"]
    if ref is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or ref, not both")
        refs = meta.get("refs") or {}
        if ref not in refs:
            raise KeyError(f"no ref {ref!r} on table "
                           f"(have {sorted(refs)})")
        snapshot_id = refs[ref]["snapshot-id"]
    sid = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    snap = _snapshot(meta, sid)
    mlist, _ = read_avro(_read_file(table, snap["manifest-list"]))
    paths: list[tuple[str, int]] = []  # (rel path, data sequence number)
    total_files = 0
    # position-delete FILES (never their contents): the driver keeps
    # only O(delete files) metadata — rel path + manifest-recorded
    # record_count — and the (file, pos) pairs are decoded
    # executor-side in _pos_delete_frame below (the round-6
    # distributed-WRITE fix's dual; a 1e8-position delete set must
    # never materialize as a driver Python list)
    pos_delete_files: list[str] = []
    pos_delete_records = 0
    # format-version 3 deletion vectors: O(DV) descriptors only —
    # (puffin path, offset, length, referenced data file); bitmaps
    # decode executor-side in _dv_delete_frame
    dv_descriptors: list[dict] = []
    first_row_ids: dict[str, int] = {}
    # equality deletes grouped by their key-column tuple: for each key
    # tuple the MAX delete sequence wins (a delete at seq 9 subsumes
    # one at seq 5 — both drop files below 5; only <9 matters).
    # Equality deletes stay driver-side by design: they are O(keys)
    # CDC batches, not O(matched rows).
    eq_deletes: dict[tuple[str, ...], dict[tuple, int]] = {}
    id_to_name = {f["id"]: f["name"] for f in meta["schema"]["fields"]}
    specs_r, default_sid_r = _specs(meta)
    filter_fids: dict = {}
    if partition_filter:
        default_fields = specs_r.get(default_sid_r, [])
        filter_fids = {
            n: next((f["field-id"] for f in default_fields
                     if f["name"] == n), None)
            for n in partition_filter}
    for m in mlist:
        entries, _ = read_avro(_read_file(table, m["manifest_path"]))
        seq = m.get("sequence_number", 0)
        m_filter = None
        if partition_filter:
            # each manifest prunes under ITS OWN spec (spec evolution:
            # old- and new-spec files coexist in one snapshot)
            m_filter = _translate_partition_filter(
                partition_filter, filter_fids,
                specs_r.get(m.get("partition_spec_id", 0), []))
        if m.get("content", DATA_CONTENT) == DELETE_CONTENT:
            for e in entries:
                if e["status"] not in (ADDED, EXISTING):
                    continue
                # spec inheritance: an entry carries its own explicit
                # sequence_number (rewritten manifests persist the
                # original seq per entry) or inherits the manifest's
                eseq = e.get("sequence_number")
                eseq = seq if eseq is None else eseq
                dfile = e["data_file"]
                if dfile.get("file_format") == "PUFFIN":
                    dv_descriptors.append({
                        "path": dfile["file_path"],
                        "offset": dfile["content_offset"],
                        "length": dfile["content_size_in_bytes"],
                        "referenced": dfile["referenced_data_file"],
                    })
                    pos_delete_records += int(
                        dfile.get("record_count") or 0)
                    continue
                if dfile.get("content", FILE_POS_DELETES) == FILE_EQ_DELETES:
                    rows, _s = read_avro(
                        _read_file(table, dfile["file_path"]))
                    names = tuple(
                        id_to_name[i] for i in dfile["equality_ids"])
                    bucket = eq_deletes.setdefault(names, {})
                    for r in rows:
                        key = tuple(r[n] for n in names)
                        if eseq > bucket.get(key, -1):
                            bucket[key] = eseq
                else:
                    pos_delete_files.append(dfile["file_path"])
                    pos_delete_records += int(dfile.get("record_count") or 0)
            continue
        for e in entries:
            if e["status"] in (ADDED, EXISTING):
                eseq = e.get("sequence_number")
                eseq = seq if eseq is None else eseq
                total_files += 1
                if m_filter and _partition_pruned(
                        e["data_file"], m_filter):
                    continue
                if stats_filter and _stats_pruned(
                        e["data_file"], stats_filter,
                        meta["schema"]["fields"]):
                    continue
                paths.append((e["data_file"]["file_path"], eseq))
                if e["data_file"].get("first_row_id") is not None:
                    first_row_ids[e["data_file"]["file_path"]] = (
                        e["data_file"]["first_row_id"])
    if scan_stats is not None:
        scan_stats["files_total"] = total_files
        scan_stats["files_scanned"] = len(paths)
    return {
        "meta": meta,
        "snapshot_id": sid,
        "paths": paths,
        "pos_delete_files": pos_delete_files,
        "pos_delete_records": pos_delete_records,
        "dv_descriptors": dv_descriptors,
        "eq_deletes": eq_deletes,
        "first_row_ids": first_row_ids,
    }


# positions provably (manifest record_count) at or below this total
# broadcast; above it Spark/AQE picks the join strategy. ~1M
# (path, pos) rows is tens of MB — comfortably inside an executor
# broadcast build; the 1e8 case the cap exists for is ~10 GB.
_POS_DELETE_BROADCAST_MAX = 1_000_000


def _pos_delete_frame(spark: SparkSession, root: str,
                      rel_paths: list[str]) -> DataFrame:
    """Distributed decode of position-delete Avro files: only the file
    LIST (O(delete files) metadata) leaves the driver; each executor
    partition opens and decodes its own files through avro_codec
    inside mapInPandas (the source_avro_roundtrip pattern), so the
    (file, pos) pairs themselves never exist driver-side. One
    round-robin partition per delete file keeps the decode parallel —
    a single-threaded driver loop over N delete Avros was the round-6
    read-path bottleneck this replaces (VERDICT r6 #1)."""
    files_df = spark.createDataFrame(
        [(p,) for p in sorted(rel_paths)], "rel string"
    ).repartition(min(len(rel_paths), 64))

    def _decode(batches):
        import os as _os

        import pandas as _pd

        for pdf in batches:
            for rel in pdf["rel"]:
                with open(_os.path.join(root, rel), "rb") as f:
                    rows, _schema = read_avro(f.read())
                if rows:
                    yield _pd.DataFrame({
                        "_fp": [r["file_path"] for r in rows],
                        "_pos": [r["pos"] for r in rows],
                    })

    return files_df.mapInPandas(_decode, "_fp string, _pos long")


def _rel_path_col(root: str):
    """_metadata.file_path (a file: URI) relativized to the table root
    as a Column — the delta-merge URI-strip lesson, in one expression.
    The root prefix is removed with a LITERAL substr, never a dynamic
    regexp_replace pattern: a table root containing regex
    metacharacters ('+', '(', '.', '$' — all legal in paths) would
    silently mis-relativize every path, desynchronizing the MOR
    reader's anti-join from the position-delete writer."""
    from pyspark.sql import functions as F

    stripped = F.regexp_replace(
        F.col("_metadata.file_path"), r"^file:/+", "/")
    prefix = root + "/"
    # guard: only strip when the prefix actually matches (it always
    # should — the scan reads files under root — but a silent partial
    # strip would corrupt (file, pos) identity)
    return F.when(
        F.substring(stripped, 1, len(prefix)) == F.lit(prefix),
        F.substr(stripped, F.lit(len(prefix) + 1)),
    ).otherwise(F.lit(None))


def _dv_delete_frame(spark: SparkSession, root: str,
                     descriptors: list[dict]) -> DataFrame:
    """Distributed decode of format-version 3 Puffin DELETION VECTORS
    into the same (_fp, _pos) anti-join shape _pos_delete_frame
    produces: only the O(DV) descriptor rows leave the driver; each
    executor partition decodes its blobs (offset/length addressing)
    and emits the referenced data file's deleted positions."""
    rows = [(d["path"], int(d["offset"]), int(d["length"]),
             d["referenced"])
            for d in sorted(descriptors,
                            key=lambda d: (d["path"], d["offset"]))]
    files_df = spark.createDataFrame(
        rows, "path string, off long, ln long, ref string"
    ).repartition(min(len(rows), 64))

    def _decode(batches):
        import os as _os

        import pandas as _pd

        from postrack_spark.streaming.puffin import decode_dv_blob

        for pdf in batches:
            # the writer deliberately collocates many DVs per Puffin —
            # group by path so each file's bytes are read ONCE
            by_path: dict = {}
            for path, off, ln, ref in zip(pdf["path"], pdf["off"],
                                          pdf["ln"], pdf["ref"]):
                by_path.setdefault(path, []).append(
                    (int(off), int(ln), ref))
            for path, blobs in by_path.items():
                with open(_os.path.join(root, path), "rb") as f:
                    data = f.read()
                for off, ln, ref in blobs:
                    vals = decode_dv_blob(data, off, ln).values()
                    if vals:
                        yield _pd.DataFrame({"_fp": [ref] * len(vals),
                                             "_pos": vals})

    return files_df.mapInPandas(_decode, "_fp string, _pos long")


def _delete_positions_v3(spark: SparkSession, table: str,
                         condition: str) -> tuple[int, int]:
    """Format-version 3 DELETE: Puffin DELETION VECTORS (spec v3 —
    DVs REPLACE position-delete files; a v3 writer must not add new
    position-delete files). Matching rows become per-data-file roaring
    bitmaps, collocated one Puffin file per executor partition (the
    spec's recommended layout), committed under ONE content=1 manifest
    whose entries carry the DV addressing triplet
    (referenced_data_file / content_offset / content_size_in_bytes).

    Spec invariants maintained: at most ONE DV per data file per
    snapshot — a re-delete UNIONS the file's existing vector
    (executor-side decode+merge, like Delta's DV stacking) and the
    new snapshot's manifest list DROPS prior DV manifests, carrying
    their unaffected entries as EXISTING into the new manifest.
    Returns (snapshot id, NEWLY deleted row count — re-marked rows
    count zero, the Delta DV accounting rule).

    Scale: the (file, pos) sets live only in executor bitmaps; the
    driver sees O(DV files) descriptor rows. Snapshot-pinned OCC like
    the v2 path: positions are a function of the snapshot scanned."""
    from pyspark.sql import functions as F

    for _ in range(10):
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        snap = _snapshot(meta, meta["current-snapshot-id"])
        mlist, _ = read_avro(_read_file(table, snap["manifest-list"]))
        data_paths: list[str] = []
        keep_mlist: list[dict] = []
        existing_dvs: dict[str, dict] = {}
        for m in mlist:
            entries, _s = read_avro(_read_file(table, m["manifest_path"]))
            if m.get("content", DATA_CONTENT) == DELETE_CONTENT:
                dv_entries = [e for e in entries if e["data_file"].get(
                    "file_format") == "PUFFIN"]
                if dv_entries:
                    # our DV manifests never mix entry kinds
                    for e in dv_entries:
                        existing_dvs[
                            e["data_file"]["referenced_data_file"]] = e
                    continue  # superseded: rewritten below
                keep_mlist.append(m)  # equality-delete manifest
                continue
            keep_mlist.append(m)
            data_paths += [e["data_file"]["file_path"] for e in entries
                           if e["status"] in (ADDED, EXISTING)]
        if not data_paths:
            return meta["current-snapshot-id"], 0
        ddl = ", ".join(f"{f['name']} {_ICE_TO_SPARK[f['type']]}"
                        for f in meta["schema"]["fields"])
        root = os.path.abspath(table)
        df = spark.read.schema(ddl).parquet(
            *[os.path.join(table, p) for p in data_paths])
        matches = df.filter(
            F.coalesce(F.expr(condition), F.lit(False))
        ).select(
            _rel_path_col(root).alias("file_path"),
            F.col("_metadata.row_index").alias("pos"),
        )
        version = meta["last-version"] + 1
        snapshot_id = version + 1
        seq = meta["last-sequence-number"] + 1
        dv_closure = {p: (e["data_file"]["file_path"],
                          e["data_file"]["content_offset"],
                          e["data_file"]["content_size_in_bytes"])
                      for p, e in existing_dvs.items()}
        table_abs = root

        def _write_dv(batches):
            import os as _os

            import pandas as _pd

            from postrack_spark.streaming.puffin import (
                DV_BLOB_TYPE,
                decode_dv_blob,
                dv_blob,
                write_puffin,
            )
            from postrack_spark.streaming.roaring import RoaringArray64

            by_file: dict[str, list[int]] = {}
            for pdf in batches:
                for p, q in zip(pdf["file_path"], pdf["pos"]):
                    by_file.setdefault(p, []).append(int(q))
            if not by_file:
                return
            blobs, cards = [], []
            for p in sorted(by_file):
                rb = RoaringArray64(by_file[p])
                old = dv_closure.get(p)
                if old is not None:
                    with open(_os.path.join(table_abs, old[0]), "rb") as f:
                        data = f.read()
                    for v in decode_dv_blob(data, old[1], old[2]).values():
                        rb.add(v)
                blobs.append((dv_blob(rb), {
                    "type": DV_BLOB_TYPE, "fields": [],
                    "snapshot-id": snapshot_id, "sequence-number": seq,
                    "properties": {"referenced-data-file": p,
                                   "cardinality": str(rb.cardinality())},
                }))
                cards.append((p, rb.cardinality()))
            file_bytes, metas = write_puffin(blobs)
            rel = _os.path.join("data", f"dv-{uuid.uuid4().hex}.puffin")
            with open(_os.path.join(table_abs, rel), "wb") as f:
                f.write(file_bytes)
            yield _pd.DataFrame([{
                "puffin": rel, "file_size": len(file_bytes),
                "referenced": p, "offset": m["offset"],
                "length": m["length"], "cardinality": c,
            } for (p, c), m in zip(cards, metas)])

        written = sorted(
            matches.repartition(
                max(1, len(data_paths)), "file_path").mapInPandas(
                _write_dv,
                "puffin string, file_size long, referenced string,"
                " offset long, length long, cardinality long",
            ).collect(),
            key=lambda r: (r["puffin"], r["offset"]))
        if not written:
            return meta["current-snapshot-id"], 0
        prev_cards = {p: e["data_file"]["record_count"]
                      for p, e in existing_dvs.items()}
        n_new = sum(r["cardinality"] - prev_cards.get(r["referenced"], 0)
                    for r in written)
        new_entries = [{"status": ADDED, "snapshot_id": snapshot_id,
                        "data_file": {
                            "file_path": r["puffin"],
                            "file_format": "PUFFIN",
                            "record_count": r["cardinality"],
                            "file_size_in_bytes": r["file_size"],
                            "content": FILE_POS_DELETES,
                            "referenced_data_file": r["referenced"],
                            "content_offset": r["offset"],
                            "content_size_in_bytes": r["length"],
                        }} for r in written]
        affected = {r["referenced"] for r in written}
        for p, e in sorted(existing_dvs.items()):
            if p not in affected:
                new_entries.append({"status": EXISTING,
                                    "snapshot_id": e["snapshot_id"],
                                    "data_file": dict(e["data_file"])})
        manifest_rel = os.path.join(
            "metadata",
            f"manifest-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        manifest_blob = write_avro(new_entries, _DV_MANIFEST_SCHEMA,
                                   codec="deflate")
        with open(os.path.join(table, manifest_rel), "wb") as f:
            f.write(manifest_blob)
        new_mlist = keep_mlist + [{
            "manifest_path": manifest_rel,
            "manifest_length": len(manifest_blob),
            "partition_spec_id": _delete_manifest_spec_id(meta),
            "added_snapshot_id": snapshot_id,
            "content": DELETE_CONTENT,
            "sequence_number": seq,
        }]
        mlist_rel = os.path.join(
            "metadata", f"snap-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        with open(os.path.join(table, mlist_rel), "wb") as f:
            f.write(write_avro(new_mlist, _MANIFEST_LIST_SCHEMA_V2,
                               codec="deflate"))
        now_ms = int(time.time() * 1000)
        new_meta = dict(meta)
        new_meta["snapshots"] = meta["snapshots"] + [{
            "snapshot-id": snapshot_id, "timestamp-ms": now_ms,
            "parent-snapshot-id": meta["current-snapshot-id"],
            "manifest-list": mlist_rel, "sequence-number": seq,
            "summary": {
                "operation": "delete",
                "added-delete-files": str(len({r["puffin"]
                                               for r in written})),
                "added-dvs": str(len(written)),
                "added-position-deletes": str(n_new),
                # DV entries count as delete files; superseded vectors
                # leave the totals as their merged replacements arrive
                **_fold_totals(
                    snap.get("summary"),
                    delete_files=len(written) - sum(
                        1 for p in affected if p in existing_dvs),
                    pos_deletes=n_new),
            },
        }]
        new_meta["current-snapshot-id"] = snapshot_id
        new_meta["last-version"] = version
        new_meta["last-sequence-number"] = seq
        new_meta["last-updated-ms"] = now_ms
        try:
            _commit_metadata(table, version, new_meta)
            return snapshot_id, n_new
        except IcebergCommitConflict:
            continue  # recompute positions from the new snapshot
    raise IcebergCommitConflict(f"lost 10 delete races on {table}")


def delete_positions_iceberg(spark: SparkSession, table: str,
                             condition: str) -> tuple[int, int]:
    """MERGE-ON-READ position delete (format-version 2 only): rows
    matching ``condition`` (SQL DELETE semantics — NULL survives) are
    recorded as (file_path, row position) in a position-delete Avro
    file and committed as a content=1 delete manifest; NO data parquet
    is rewritten. Positions come from the scan's _metadata.row_index —
    the same mechanism the reader's anti-join uses, so writer and
    reader agree by construction. Returns (snapshot id, rows deleted).

    The write is DISTRIBUTED: matches repartition by file_path and
    each non-empty executor partition writes its own position-delete
    Avro (rows sorted by (path, pos) within the file — the spec's
    required order; hash partitioning keeps any one data file's
    positions in one delete file) via mapInPandas. Only O(delete
    files) metadata rows reach the driver — never the (path, pos)
    pairs — so a scattered 100 TB predicate matching 1e8 rows stays
    executor-side. All delete files commit under ONE content=1
    manifest (the spec allows many delete files per manifest).
    Executors write into table storage directly and the driver commits
    metadata — the standard Iceberg write protocol. Delete files
    staged by a lost OCC race are unreferenced orphans, same class as
    orphaned manifests (an orphan-file sweep reclaims them;
    expire_snapshots only deletes referenced history by design)."""
    from pyspark.sql import functions as F

    for _ in range(10):  # snapshot-pinned OCC (the delta_log rule):
        # positions are computed against THIS snapshot's files, so a
        # concurrent commit (e.g. compaction rewriting them) must force
        # a full recompute — stale (file, pos) pairs would point into
        # retired or reshuffled files
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        if meta["format-version"] == 3:
            # v3 forbids NEW position-delete files: the same call
            # writes Puffin DELETION VECTORS instead (the spec's
            # successor representation)
            return _delete_positions_v3(spark, table, condition)
        if meta["format-version"] != 2:
            raise NotImplementedError(
                "position deletes need a format-version 2/3 table")
        snap = _snapshot(meta, meta["current-snapshot-id"])
        mlist, _ = read_avro(_read_file(table, snap["manifest-list"]))
        data_paths = []
        for m in mlist:
            if m.get("content", DATA_CONTENT) != DATA_CONTENT:
                continue
            entries, _s = read_avro(_read_file(table, m["manifest_path"]))
            data_paths += [e["data_file"]["file_path"] for e in entries
                           if e["status"] in (ADDED, EXISTING)]
        ddl = ", ".join(
            f"{f['name']} {_ICE_TO_SPARK[f['type']]}"
            for f in meta["schema"]["fields"])
        root = os.path.abspath(table)
        df = spark.read.schema(ddl).parquet(
            *[os.path.join(table, p) for p in data_paths])
        matches = df.filter(
            F.coalesce(F.expr(condition), F.lit(False))
        ).select(
            _rel_path_col(root).alias("file_path"),
            F.col("_metadata.row_index").alias("pos"),
        )
        table_abs = root

        def _write_delete_files(batches):
            import pandas as _pd

            pairs: list[tuple[str, int]] = []
            for pdf in batches:
                pairs.extend(
                    (p, int(q)) for p, q in zip(pdf["file_path"], pdf["pos"]))
            if not pairs:
                return
            pairs.sort()
            blob = write_avro(
                [{"file_path": p, "pos": q} for p, q in pairs],
                _POS_DELETE_SCHEMA, codec="deflate")
            rel = os.path.join("data", f"delete-{uuid.uuid4().hex}.avro")
            with open(os.path.join(table_abs, rel), "wb") as f:
                f.write(blob)
            yield _pd.DataFrame([{
                "file_path": rel,
                "record_count": len(pairs),
                "file_size_in_bytes": len(blob),
            }])

        # explicit partition count (= live data file count, already in
        # hand from the manifest walk) so AQE's small-shuffle coalesce
        # can't fold everything into one partition — delete-file
        # granularity tracks data-file granularity, which is what the
        # reader's per-file anti-join and future compaction want
        written = sorted(
            matches.repartition(
                max(1, len(data_paths)), "file_path").mapInPandas(
                _write_delete_files,
                "file_path string, record_count long,"
                " file_size_in_bytes long",
            ).collect(),
            key=lambda r: r["file_path"])
        n_deleted = sum(r["record_count"] for r in written)
        if not written:
            return meta["current-snapshot-id"], 0
        version = meta["last-version"] + 1
        snapshot_id = version + 1
        seq = meta["last-sequence-number"] + 1
        manifest_rel = os.path.join(
            "metadata",
            f"manifest-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        manifest_blob = write_avro([{
            "status": ADDED, "snapshot_id": snapshot_id,
            "data_file": {
                "file_path": r["file_path"], "file_format": "AVRO",
                "record_count": r["record_count"],
                "file_size_in_bytes": r["file_size_in_bytes"],
                "lower_bounds": [], "upper_bounds": [],
                "sort_order_id": 0,
            }} for r in written], _MANIFEST_SCHEMA, codec="deflate")
        with open(os.path.join(table, manifest_rel), "wb") as f:
            f.write(manifest_blob)
        new_mlist = mlist + [{
            "manifest_path": manifest_rel,
            "manifest_length": len(manifest_blob),
            "partition_spec_id": _delete_manifest_spec_id(meta),
            "added_snapshot_id": snapshot_id,
            "content": DELETE_CONTENT,
            "sequence_number": seq,
        }]
        mlist_rel = os.path.join(
            "metadata", f"snap-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        with open(os.path.join(table, mlist_rel), "wb") as f:
            f.write(write_avro(new_mlist, _MANIFEST_LIST_SCHEMA_V2,
                               codec="deflate"))
        now_ms = int(time.time() * 1000)
        new_meta = dict(meta)
        new_meta["snapshots"] = meta["snapshots"] + [{
            "snapshot-id": snapshot_id, "timestamp-ms": now_ms,
            "parent-snapshot-id": meta["current-snapshot-id"],
            "manifest-list": mlist_rel, "sequence-number": seq,
            "summary": {
                "operation": "delete",
                "added-delete-files": str(len(written)),
                "added-position-deletes": str(n_deleted),
                **_fold_totals(snap.get("summary"),
                               delete_files=len(written),
                               pos_deletes=n_deleted),
            },
        }]
        new_meta["current-snapshot-id"] = snapshot_id
        new_meta["last-version"] = version
        new_meta["last-sequence-number"] = seq
        new_meta["last-updated-ms"] = now_ms
        try:
            _commit_metadata(table, version, new_meta)
            return snapshot_id, n_deleted
        except IcebergCommitConflict:
            continue  # recompute positions from the new snapshot
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


_ICE_TO_AVRO = {"long": "long", "int": "int", "double": "double",
                "float": "float", "string": "string",
                "boolean": "boolean"}


def _eq_key_plan(meta: dict, key_cols: list[str]) -> tuple[list[int], dict]:
    """Resolve key columns to table field-ids and build the equality
    delete FILE's Avro schema (each field carries its table field-id,
    per spec — that is what equality_ids refers to)."""
    by_name = {f["name"]: f for f in meta["schema"]["fields"]}
    ids, fields = [], []
    for c in key_cols:
        if c not in by_name:
            raise KeyError(f"equality column {c!r} not in table schema")
        ice_t = by_name[c]["type"]
        if ice_t not in _ICE_TO_AVRO:
            raise NotImplementedError(
                f"equality delete on {ice_t} column out of scope")
        ids.append(by_name[c]["id"])
        fields.append({"name": c, "type": _ICE_TO_AVRO[ice_t],
                       "field-id": by_name[c]["id"]})
    return ids, {"type": "record", "name": "eq_delete", "fields": fields}


def _stage_eq_delete_files(keys: DataFrame, table: str,
                           key_cols: list[str], file_schema: dict
                           ) -> list[dict]:
    """DISTRIBUTED equality-delete file write (the position-delete
    writer's pattern): each non-empty partition of the DISTINCT key
    set writes one delete Avro (rows sorted by key — the spec's
    recommended order) and only O(delete files) descriptor rows reach
    the driver. Snapshot-independent: staged once, reused across OCC
    retries."""
    table_abs = os.path.abspath(table)

    def _write(batches):
        import pandas as _pd

        rows: list[tuple] = []
        for pdf in batches:
            if pdf[key_cols].isna().any().any():
                raise ValueError(
                    "NULL equality-delete key (writer scope: non-null "
                    "keys; the reader still honors the spec's "
                    "null-matches-null rule for foreign files)")
            rows.extend(tuple(t) for t in
                        pdf[key_cols].itertuples(index=False, name=None))
        if not rows:
            return
        rows.sort()
        py = [{c: (v.item() if hasattr(v, "item") else v)
               for c, v in zip(key_cols, r)} for r in rows]
        blob = write_avro(py, file_schema, codec="deflate")
        rel = os.path.join("data", f"eq-delete-{uuid.uuid4().hex}.avro")
        with open(os.path.join(table_abs, rel), "wb") as f:
            f.write(blob)
        yield _pd.DataFrame([{
            "file_path": rel,
            "record_count": len(rows),
            "file_size_in_bytes": len(blob),
        }])

    return sorted(
        keys.select(*key_cols).distinct().mapInPandas(
            _write,
            "file_path string, record_count long, file_size_in_bytes long",
        ).collect(),
        key=lambda r: r["file_path"])


def _eq_manifest_blob(written: list, snapshot_id: int,
                      equality_ids: list[int]) -> bytes:
    return write_avro([{
        "status": ADDED, "snapshot_id": snapshot_id,
        "data_file": {
            "file_path": r["file_path"], "file_format": "AVRO",
            "record_count": r["record_count"],
            "file_size_in_bytes": r["file_size_in_bytes"],
            "content": FILE_EQ_DELETES,
            "equality_ids": list(equality_ids),
        }} for r in written], _EQ_MANIFEST_SCHEMA, codec="deflate")


def delete_keys_iceberg(spark: SparkSession, table: str,
                        keys: DataFrame) -> tuple[int, int]:
    """EQUALITY delete (format-version 2): every column of ``keys``
    is an equality column; current rows matching any key row are
    dropped from subsequent reads. Cost is O(keys) — NO table scan,
    NO position computation, NO data rewrite: the delete file stores
    the key VALUES and the reader applies them as a broadcast
    anti-join scoped by sequence number. This is the GDPR
    forget-by-key shape at its cheapest (the Delta twin,
    delete_keys_delta, must at least rewrite matching files;
    position deletes must at least scan to find positions).
    Returns (snapshot id, distinct key count). Keys committed at
    sequence S delete only from data files with sequence < S, so a
    later re-insert of the same key is visible — upsert semantics
    compose for free."""
    key_cols = list(keys.columns)
    meta0 = _current_metadata(table)
    if meta0 is None:
        raise FileNotFoundError(f"no iceberg metadata under {table}")
    if meta0["format-version"] not in (2, 3):
        raise NotImplementedError(
            "equality deletes need a format-version 2/3 table")
    eq_ids, file_schema = _eq_key_plan(meta0, key_cols)
    written = _stage_eq_delete_files(keys, table, key_cols, file_schema)
    if not written:
        return meta0["current-snapshot-id"], 0
    n_keys = sum(r["record_count"] for r in written)

    for _ in range(10):  # plain-append OCC: staged key bytes don't
        # depend on the snapshot they land on, so retry is safe
        meta = _current_metadata(table)
        version = meta["last-version"] + 1
        snapshot_id = version + 1
        seq = meta["last-sequence-number"] + 1
        snap = _snapshot(meta, meta["current-snapshot-id"])
        mlist, _ = read_avro(_read_file(table, snap["manifest-list"]))
        manifest_rel = os.path.join(
            "metadata",
            f"manifest-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        blob = _eq_manifest_blob(written, snapshot_id, eq_ids)
        with open(os.path.join(table, manifest_rel), "wb") as f:
            f.write(blob)
        new_mlist = mlist + [{
            "manifest_path": manifest_rel, "manifest_length": len(blob),
            "partition_spec_id": _delete_manifest_spec_id(meta),
            "added_snapshot_id": snapshot_id,
            "content": DELETE_CONTENT, "sequence_number": seq,
        }]
        mlist_rel = os.path.join(
            "metadata", f"snap-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        with open(os.path.join(table, mlist_rel), "wb") as f:
            f.write(write_avro(new_mlist, _MANIFEST_LIST_SCHEMA_V2,
                               codec="deflate"))
        now_ms = int(time.time() * 1000)
        new_meta = dict(meta)
        new_meta["snapshots"] = meta["snapshots"] + [{
            "snapshot-id": snapshot_id, "timestamp-ms": now_ms,
            "parent-snapshot-id": meta["current-snapshot-id"],
            "manifest-list": mlist_rel, "sequence-number": seq,
            "summary": {
                "operation": "delete",
                "added-delete-files": str(len(written)),
                "added-equality-deletes": str(n_keys),
                **_fold_totals(snap.get("summary"),
                               delete_files=len(written),
                               eq_deletes=n_keys),
            },
        }]
        new_meta["current-snapshot-id"] = snapshot_id
        new_meta["last-version"] = version
        new_meta["last-sequence-number"] = seq
        new_meta["last-updated-ms"] = now_ms
        try:
            _commit_metadata(table, version, new_meta)
            return snapshot_id, n_keys
        except IcebergCommitConflict:
            continue
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


def upsert_iceberg(df: DataFrame, table: str, key_cols: list[str],
                   summary_extra: dict | None = None) -> tuple[int, int]:
    """CDC UPSERT in ONE snapshot (the Flink Iceberg writer's shape):
    commit an equality-delete file holding df's key values AND df's
    data files, both at the SAME new sequence number. The spec scopes
    equality deletes to data files with STRICTLY SMALLER sequence, so
    the batch's own rows survive its own delete while every older
    version of those keys disappears — latest-wins per key with
    O(batch) write cost and zero table scan. Returns
    (snapshot id, upserted row count).

    The batch must be key-unique (one row per key): two same-key rows
    at one sequence would BOTH survive, so that shape raises instead
    of silently keeping two versions. Deduplicate upstream
    (max_by on the CDC ordering column) — that is what a real CDC
    writer's per-checkpoint buffer does."""
    from pyspark.sql import functions as F

    # pin the batch ONCE (eager): the frame is otherwise evaluated
    # three times (dup gate, data staging, eq-delete staging) and a
    # nondeterministic input could pass the key-unique gate yet stage
    # data rows and delete keys that disagree — two live rows per key
    # at one sequence (ADVICE r6). O(batch) cost, the CDC write unit.
    df = df.localCheckpoint(eager=True)
    dup = (df.groupBy(*key_cols).count().filter(F.col("count") > 1)
           .limit(1).collect())
    if dup:
        raise ValueError(
            f"upsert batch has duplicate key {tuple(dup[0])[:-1]!r}; "
            "dedupe to latest-wins before upserting")

    meta0 = _current_metadata(table)
    if meta0 is not None and meta0["format-version"] not in (2, 3):
        raise NotImplementedError(
            "upsert needs a format-version 2/3 table")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    os.makedirs(_meta_dir(table), exist_ok=True)
    if meta0 is None:
        # first write creates the table: a plain v2 append (nothing
        # older exists for the delete to apply to)
        sid = append_iceberg(df, table, format_version=2,
                             summary_extra=summary_extra)
        return sid, df.count()

    # upsert batches are schema-ENFORCED (no evolution in the CDC
    # write path — a drifting stream should fail loudly)
    _evolve_ice_schema(meta0["schema"], df.schema, False)
    eq_ids, file_schema = _eq_key_plan(meta0, key_cols)
    data_entries = _stage_data_files(df, table)
    _bind_bounds(data_entries, meta0["schema"]["fields"])
    n_rows = sum(e["data_file"]["record_count"] for e in data_entries)
    eq_written = _stage_eq_delete_files(
        df.select(*key_cols), table, key_cols, file_schema)

    for _ in range(10):  # plain-append OCC (staged bytes are
        # snapshot-independent: data is the batch, keys are the batch)
        meta = _current_metadata(table)
        version = meta["last-version"] + 1
        snapshot_id = version + 1
        seq = meta["last-sequence-number"] + 1
        snap = _snapshot(meta, meta["current-snapshot-id"])
        mlist, _ = read_avro(_read_file(table, snap["manifest-list"]))
        first_rid = None
        next_rid = None
        for e in data_entries:
            e["snapshot_id"] = snapshot_id
        if meta["format-version"] == 3:
            # ROW LINEAGE rides the CDC write path too — an upsert
            # that skipped id assignment would permanently disable
            # with_row_ids reads on its own table (review r8)
            next_rid = int(meta.get("next-row-id", 0) or 0)
            first_rid = next_rid
            for e in data_entries:
                e["data_file"]["first_row_id"] = next_rid
                next_rid += e["data_file"]["record_count"]
        data_rel = os.path.join(
            "metadata",
            f"manifest-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        data_blob = write_avro(
            data_entries,
            _MANIFEST_SCHEMA_V3 if meta["format-version"] == 3
            else _MANIFEST_SCHEMA,
            codec="deflate")
        with open(os.path.join(table, data_rel), "wb") as f:
            f.write(data_blob)
        new_mlist = mlist + [{
            "manifest_path": data_rel, "manifest_length": len(data_blob),
            "partition_spec_id": _delete_manifest_spec_id(meta),
            "added_snapshot_id": snapshot_id,
            "content": DATA_CONTENT, "sequence_number": seq,
        }]
        if eq_written:
            eq_rel = os.path.join(
                "metadata",
                f"manifest-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
            eq_blob = _eq_manifest_blob(eq_written, snapshot_id, eq_ids)
            with open(os.path.join(table, eq_rel), "wb") as f:
                f.write(eq_blob)
            new_mlist.append({
                "manifest_path": eq_rel, "manifest_length": len(eq_blob),
                "partition_spec_id": _delete_manifest_spec_id(meta),
                "added_snapshot_id": snapshot_id,
                "content": DELETE_CONTENT, "sequence_number": seq,
            })
        mlist_rel = os.path.join(
            "metadata", f"snap-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        with open(os.path.join(table, mlist_rel), "wb") as f:
            f.write(write_avro(new_mlist, _MANIFEST_LIST_SCHEMA_V2,
                               codec="deflate"))
        now_ms = int(time.time() * 1000)
        new_meta = dict(meta)
        new_meta["snapshots"] = meta["snapshots"] + [{
            "snapshot-id": snapshot_id, "timestamp-ms": now_ms,
            "parent-snapshot-id": meta["current-snapshot-id"],
            "manifest-list": mlist_rel, "sequence-number": seq,
            "summary": {
                "operation": "overwrite",
                "added-data-files": str(len(data_entries)),
                "added-records": str(n_rows),
                "added-delete-files": str(len(eq_written)),
                "added-equality-deletes": str(sum(
                    r["record_count"] for r in eq_written)),
                **_fold_totals(
                    snap.get("summary"),
                    data_files=len(data_entries), records=n_rows,
                    files_size=sum(e["data_file"]["file_size_in_bytes"]
                                   for e in data_entries),
                    delete_files=len(eq_written),
                    eq_deletes=sum(r["record_count"]
                                   for r in eq_written)),
                **(summary_extra or {}),
            },
        }]
        new_meta["current-snapshot-id"] = snapshot_id
        new_meta["last-version"] = version
        new_meta["last-sequence-number"] = seq
        new_meta["last-updated-ms"] = now_ms
        if meta["format-version"] == 3:
            new_meta["next-row-id"] = next_rid
            new_meta["snapshots"][-1]["first-row-id"] = first_rid
        try:
            _commit_metadata(table, version, new_meta)
            return snapshot_id, n_rows
        except IcebergCommitConflict:
            continue
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


def tag_iceberg(table: str, name: str,
                snapshot_id: int | None = None,
                max_ref_age_ms: int | None = None) -> int:
    """Create an immutable TAG ref (metadata-only commit): a named
    time-travel anchor — ``read_iceberg(..., ref=name)`` resolves to
    this snapshot, and expire_snapshots RETAINS tagged snapshots (a
    tag is a retention promise) — until the optional
    ``max_ref_age_ms`` ages the tag out (the spec's max-ref-age-ms
    field), after which expiry drops the ref and its snapshot follows
    the normal rules. Re-tagging an existing name raises. Returns the
    tagged snapshot id."""
    for _ in range(10):
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        refs = dict(meta.get("refs") or {})
        if name in refs:
            raise ValueError(f"ref {name!r} already exists")
        sid = (snapshot_id if snapshot_id is not None
               else meta["current-snapshot-id"])
        _snapshot(meta, sid)  # must exist
        ref = {"snapshot-id": sid, "type": "tag"}
        if max_ref_age_ms is not None:
            ref["max-ref-age-ms"] = int(max_ref_age_ms)
        version = meta["last-version"] + 1
        new_meta = dict(meta)
        new_meta["refs"] = {**refs, name: ref}
        new_meta["last-version"] = version
        new_meta["last-updated-ms"] = int(time.time() * 1000)
        try:
            _commit_metadata(table, version, new_meta)
            return sid
        except IcebergCommitConflict:
            continue
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


def set_ref_retention_iceberg(table: str, name: str,
                              min_snapshots_to_keep: int | None = None,
                              max_snapshot_age_ms: int | None = None,
                              max_ref_age_ms: int | None = None,
                              clear: tuple = ()) -> dict:
    """Set the spec's retention fields on an existing ref
    (metadata-only commit): ``min-snapshots-to-keep`` /
    ``max-snapshot-age-ms`` govern how much of a BRANCH's ancestry
    expire_snapshots protects (they are branch semantics — setting
    them on a tag raises); ``max-ref-age-ms`` ages the ref itself out
    on either kind. Passing None PRESERVES a field already set
    (partial updates are the semantics every caller assumes — a call
    adding an age cap must not silently drop a min-snapshots promise);
    list field names in ``clear`` to remove them explicitly. Returns
    the updated ref record."""
    clearable = {"min-snapshots-to-keep", "max-snapshot-age-ms",
                 "max-ref-age-ms"}
    bad_clear = set(clear) - clearable
    if bad_clear:
        raise ValueError(f"cannot clear {sorted(bad_clear)}")
    for _ in range(10):
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        refs = dict(meta.get("refs") or {})
        if name not in refs:
            raise KeyError(f"no ref {name!r} on table")
        ref = {k: v for k, v in refs[name].items() if k not in clear}
        if refs[name].get("type") != "branch" and (
                min_snapshots_to_keep is not None
                or max_snapshot_age_ms is not None):
            raise ValueError(
                "min-snapshots-to-keep / max-snapshot-age-ms are branch"
                f" retention fields; {name!r} is a "
                f"{refs[name].get('type')}")
        if min_snapshots_to_keep is not None:
            ref["min-snapshots-to-keep"] = int(min_snapshots_to_keep)
        if max_snapshot_age_ms is not None:
            ref["max-snapshot-age-ms"] = int(max_snapshot_age_ms)
        if max_ref_age_ms is not None:
            ref["max-ref-age-ms"] = int(max_ref_age_ms)
        version = meta["last-version"] + 1
        new_meta = dict(meta)
        new_meta["refs"] = {**refs, name: ref}
        new_meta["last-version"] = version
        new_meta["last-updated-ms"] = int(time.time() * 1000)
        try:
            _commit_metadata(table, version, new_meta)
            return ref
        except IcebergCommitConflict:
            continue
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


def fast_forward_iceberg(table: str, branch: str) -> int:
    """PUBLISH a branch (the write-audit-publish pattern's last step):
    move main (current-snapshot-id) to the branch head in one
    metadata-only commit. Requires main to be an ANCESTOR of the
    branch head (walked via parent-snapshot-id) — a true
    fast-forward; anything else would silently drop main-only
    commits, so it raises instead. Returns the published snapshot
    id."""
    for _ in range(10):
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        refs = dict(meta.get("refs") or {})
        if branch not in refs or refs[branch].get("type") != "branch":
            raise KeyError(f"no branch {branch!r} on table")
        head = refs[branch]["snapshot-id"]
        main = meta["current-snapshot-id"]
        parents = {sn["snapshot-id"]: sn.get("parent-snapshot-id")
                   for sn in meta["snapshots"]}
        cur: int | None = head
        while cur is not None and cur != main:
            cur = parents.get(cur)
        if cur != main:
            raise ValueError(
                f"main {main} is not an ancestor of {branch!r} head "
                f"{head}: not a fast-forward")
        if head == main:
            return main  # nothing to publish
        version = meta["last-version"] + 1
        new_meta = dict(meta)
        new_meta["current-snapshot-id"] = head
        new_meta["last-version"] = version
        new_meta["last-updated-ms"] = int(time.time() * 1000)
        try:
            _commit_metadata(table, version, new_meta)
            return head
        except IcebergCommitConflict:
            continue
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


def rollback_iceberg(table: str, snapshot_id: int) -> int:
    """rollback_to_snapshot (spec maintenance action) — the Iceberg
    twin of delta_log.restore_delta: move main back to an ANCESTOR
    snapshot in one metadata-only commit. History is append-only —
    the rolled-back snapshots stay time-travelable (the incident
    remains auditable) until expire_snapshots, and the rollback
    itself can be rolled forward again via fast_forward semantics.
    Requires the target to be an ancestor of the current main head
    (walked via parent-snapshot-id); anything else raises — use tags
    or branches for non-linear jumps. Returns the new metadata
    version."""
    for _ in range(10):
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        _snapshot(meta, snapshot_id)  # must exist
        parents = {sn["snapshot-id"]: sn.get("parent-snapshot-id")
                   for sn in meta["snapshots"]}
        cur: int | None = meta["current-snapshot-id"]
        while cur is not None and cur != snapshot_id:
            cur = parents.get(cur)
        if cur != snapshot_id:
            raise ValueError(
                f"snapshot {snapshot_id} is not an ancestor of main "
                f"{meta['current-snapshot-id']}: not a rollback")
        if meta["current-snapshot-id"] == snapshot_id:
            return meta["last-version"]
        version = meta["last-version"] + 1
        new_meta = dict(meta)
        new_meta["current-snapshot-id"] = snapshot_id
        new_meta["last-version"] = version
        new_meta["last-updated-ms"] = int(time.time() * 1000)
        try:
            _commit_metadata(table, version, new_meta)
            return version
        except IcebergCommitConflict:
            continue
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


def last_committed_batch_iceberg(table: str, app_id: str) -> int | None:
    """Highest streaming batch id committed for ``app_id``, read from
    snapshot SUMMARIES — the Iceberg idiom for exactly-once streaming
    commits (the Flink writer stores its max committed checkpoint id
    in the summary the same way; Delta uses txn actions). O(snapshots)
    metadata, no file IO beyond metadata.json."""
    meta = _current_metadata(table)
    if meta is None:
        return None
    best = None
    for s in meta["snapshots"]:
        summ = s.get("summary") or {}
        if summ.get("app-id") == app_id and "batch-id" in summ:
            b = int(summ["batch-id"])
            best = b if best is None else max(best, b)
    return best


def foreach_batch_iceberg_upsert(table: str, key_cols: list[str],
                                 order_cols: list[str],
                                 app_id: str | None = None):
    """foreachBatch hook: per-batch CDC UPSERT into an Iceberg v2
    table (equality delete + replacement rows in ONE snapshot), with
    exactly-once replay protection via the snapshot-summary batch id
    (``last_committed_batch_iceberg``) — a replayed batch id commits
    nothing, and because the upsert is a single atomic snapshot there
    is no torn half-applied state to skip over.

    Each batch folds to ONE image per key first (max_by over
    ``order_cols`` — the per-checkpoint buffer a real CDC writer
    keeps), satisfying upsert_iceberg's key-unique contract. ACROSS
    batches, latest-wins holds under ORDERED admission (equality
    deletes apply by sequence number, not by order_cols — the same
    contract as Flink's upsert streams; WAL-ordered CDC capture
    provides it natively, and the test harness stamps file mtimes)."""
    from pyspark.sql import functions as F

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        aid = app_id or os.path.abspath(table)
        last = last_committed_batch_iceberg(table, aid)
        if last is not None and batch_id <= last:
            return  # replay of an already-committed batch
        cols = [c for c in batch_df.columns if c not in key_cols]
        folded = batch_df.groupBy(*key_cols).agg(
            F.max_by(F.struct(*cols), F.struct(*order_cols)).alias("_w"))
        folded = folded.select(
            *key_cols, *[F.col(f"_w.{c}").alias(c) for c in cols])
        upsert_iceberg(folded, table, key_cols, summary_extra={
            "app-id": aid, "batch-id": str(batch_id)})

    return apply_batch


def compact_iceberg(spark: SparkSession, table: str,
                    target_files: int = 1,
                    zorder_by: tuple[str, str] | None = None) -> int:
    """MOR compaction (the spec's rewrite_data_files action): read the
    current snapshot WITH deletes applied, rewrite it as
    ``target_files`` fresh parquet files, and commit a snapshot whose
    manifest list holds ONLY the new data manifest — retiring both the
    old data files and every position-delete file from the live view
    (history keeps them for time travel until expire_snapshots). This
    is the deferred rewrite MOR trades for: deletes stay O(matches)
    day to day, and the anti-join cost is repaid once, here. Returns
    the new snapshot id.

    ``zorder_by=(x, y)`` makes this the rewrite_data_files ZORDER
    strategy: rows range-partition on the Morton interleave
    (sources/layout.zorder_repartition), so each output file's
    harvested footer bounds become a tight rectangle in BOTH columns
    and stats_filter reads prune most files for 2-D range predicates
    — Delta's compact_delta(zorder_by=) twin, delivered through the
    manifests' field-id bounds."""
    for _ in range(10):  # REPLACE-shape OCC: re-read AND re-stage on
        # conflict. The staged rewrite is a function of the snapshot it
        # read; reusing it after a concurrent commit would resurrect a
        # concurrent position delete (the rewrite still holds the row)
        # or drop a concurrent append (carry_forward=False retires its
        # manifest) — so the snapshot is pinned via expected_snapshot_id
        # and a conflict restarts the whole read-rewrite-commit cycle.
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        fv = meta["format-version"]
        df = read_iceberg(
            spark, table, snapshot_id=meta["current-snapshot-id"])
        if zorder_by is not None:
            from postrack_spark.sources.layout import zorder_repartition

            df = zorder_repartition(df, zorder_by[0], zorder_by[1],
                                    num_partitions=target_files)
            df = df.drop("__z")
        else:
            df = df.coalesce(target_files)
        # one ordinary commit whose manifest list holds only this write —
        # readers switch from (old data ⊖ deletes) to the rewritten set
        # at the atomic hint swap, never seeing duplicates
        try:
            # summary operation "replace" is the spec's label for
            # rewrite commits — downstream consumers (iceberg_feed)
            # use it to ride through compaction as a logical no-op
            return append_iceberg(
                df, table, format_version=fv, carry_forward=False,
                expected_snapshot_id=meta["current-snapshot-id"],
                summary_extra={"operation": "replace"})
        except IcebergCommitConflict:
            continue  # a failed attempt's staged files orphan, harmless
    raise IcebergCommitConflict(f"lost 10 compaction races on {table}")


def rewrite_manifests_iceberg(table: str) -> tuple[int, int, int]:
    """METADATA-ONLY manifest compaction (the spec's rewrite_manifests
    maintenance action): merge the current snapshot's small DATA
    manifests into one manifest per (partition-spec, sequence-number,
    writer-schema) group and commit a new snapshot — zero data files
    touched, zero rows moved. Returns (snapshot id, manifests before,
    manifests after); when nothing merges, returns the CURRENT
    snapshot id with before == after and commits nothing.

    Semantics preserved exactly:
    - groups DO merge across sequence numbers, and that is safe for
      one reason only: every merged entry persists its ORIGINAL
      sequence number explicitly (per-entry field-id 3) and both read
      lanes honor entry-over-manifest inheritance — do NOT "simplify"
      the per-entry stamping away; the delete scoping (strictly-< for
      equality) rides on it;
    - grouping never crosses a partition spec id or a writer schema
      (entries re-encode VERBATIM under the group's own writer schema,
      carried by the Avro container header — bounds, partition tuples,
      sort_order_id and v3 first_row_id all ride through untouched);
    - merged entries are re-stamped status=EXISTING with their
      ORIGINAL snapshot_id (the spec's rewrite rule); DELETED entries
      drop; DELETE manifests (content=1) carry verbatim.
    The snapshot's summary operation is "replace" (the spec label for
    rewrites), which iceberg_feed already rides through as a logical
    no-op. Superseded manifests stay referenced by older snapshots and
    are reclaimed by expire_snapshots_iceberg's reachability closure.
    At 100 TB this is what keeps scan PLANNING O(live files grouped),
    not O(commits): a CDC table taking thousands of small appends
    accumulates one tiny manifest per commit, and every read pays one
    open()+Avro parse per manifest until this folds them."""
    for _ in range(10):
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        snap = _snapshot(meta, meta["current-snapshot-id"])
        mlist, _ls = read_avro(_read_file(table, snap["manifest-list"]))
        v2plus = meta["format-version"] >= 2
        # bucket data manifests by the semantic group key
        groups: dict[tuple, list[int]] = {}
        loaded: dict[int, tuple[list[dict], dict]] = {}
        for i, m in enumerate(mlist):
            if m.get("content", DATA_CONTENT) != DATA_CONTENT:
                continue
            entries, wschema = read_avro(
                _read_file(table, m["manifest_path"]))
            loaded[i] = (entries, wschema)
            key = (m["partition_spec_id"],
                   json.dumps(wschema, sort_keys=True))
            groups.setdefault(key, []).append(i)
        merged_groups = {k: idxs for k, idxs in groups.items()
                         if len(idxs) > 1}
        if not merged_groups:
            return meta["current-snapshot-id"], len(mlist), len(mlist)
        version = meta["last-version"] + 1
        snapshot_id = version + 1
        first_of_group = {idxs[0]: k for k, idxs in merged_groups.items()}
        absorbed = {i for idxs in merged_groups.values() for i in idxs}
        new_mlist: list[dict] = []
        written_rels: list[str] = []
        for i, m in enumerate(mlist):
            if i not in absorbed:
                new_mlist.append(m)  # delete manifests + singletons
                continue
            k = first_of_group.get(i)
            if k is None:
                continue  # absorbed into an earlier member's merge
            idxs = merged_groups[k]
            entries = []
            for j in idxs:
                src_seq = mlist[j].get("sequence_number", 0)
                for e in loaded[j][0]:
                    if e["status"] not in (ADDED, EXISTING):
                        continue
                    ne = {**e, "status": EXISTING}
                    # the spec's rewrite rule: persist the ORIGINAL
                    # sequence number explicitly per entry (it can no
                    # longer be inherited — members had different seqs)
                    if ne.get("sequence_number") is None:
                        ne["sequence_number"] = src_seq
                    entries.append(ne)
            wschema = loaded[idxs[0]][1]
            names = [f["name"] for f in wschema["fields"]]
            if "sequence_number" not in names:
                wschema = {**wschema, "fields": (
                    wschema["fields"][:2]
                    + [{"name": "sequence_number", "type": "long",
                        "field-id": 3}]
                    + wschema["fields"][2:])}
            blob = write_avro(entries, wschema, codec="deflate")
            rel = os.path.join(
                "metadata",
                f"manifest-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
            with open(os.path.join(table, rel), "wb") as f:
                f.write(blob)
            written_rels.append(rel)
            entry = {
                "manifest_path": rel, "manifest_length": len(blob),
                "partition_spec_id": m["partition_spec_id"],
                "added_snapshot_id": snapshot_id,
            }
            if v2plus:
                entry["content"] = DATA_CONTENT
                # every merged entry carries an EXPLICIT seq, so this
                # inheritance default is dead; min() is the
                # conservative value for any future manifest-level use
                entry["sequence_number"] = min(
                    mlist[j].get("sequence_number", 0) for j in idxs)
            new_mlist.append(entry)
        mlist_rel = os.path.join(
            "metadata", f"snap-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        with open(os.path.join(table, mlist_rel), "wb") as f:
            f.write(write_avro(
                new_mlist,
                _MANIFEST_LIST_SCHEMA_V2 if v2plus else _MANIFEST_LIST_SCHEMA,
                codec="deflate"))
        now_ms = int(time.time() * 1000)
        new_meta = dict(meta)
        new_snap = {
            "snapshot-id": snapshot_id, "timestamp-ms": now_ms,
            "parent-snapshot-id": meta["current-snapshot-id"],
            "manifest-list": mlist_rel,
            "summary": {
                "operation": "replace",
                "manifests-replaced": str(len(absorbed)),
                "manifests-created": str(len(written_rels)),
                # data unchanged: totals carry forward from the parent
                **_fold_totals(snap.get("summary")),
            },
        }
        if v2plus:
            new_snap["sequence-number"] = meta["last-sequence-number"]
        new_meta["snapshots"] = meta["snapshots"] + [new_snap]
        new_meta["current-snapshot-id"] = snapshot_id
        new_meta["last-version"] = version
        new_meta["last-updated-ms"] = now_ms
        try:
            _commit_metadata(table, version, new_meta)
            return snapshot_id, len(mlist), len(new_mlist)
        except IcebergCommitConflict:
            continue  # losers orphan their rewritten manifests, harmless
    raise IcebergCommitConflict(f"lost 10 rewrite races on {table}")


def add_column_iceberg(table: str, name: str, ice_type: str,
                       initial_default=None, write_default=None) -> int:
    """v3 SCHEMA EVOLUTION with DEFAULT VALUES (spec "Default
    values"): add an optional column in a metadata-only commit.
    ``write_default`` fills the column when later writers omit it;
    ``initial_default`` is the value READS return for rows written
    before the column existed (spec: fixed at add time, never
    changed). The pre-existing file set is recovered from data
    sequences — the column records the table's last-sequence-number at
    add time (a documented internal attribute; files at or below it
    predate the column by construction, because schema enforcement
    makes every later write carry it). format-version 3 only, the
    spec's home for default values. Returns the metadata version."""
    if ice_type not in _ICE_TO_SPARK:
        raise NotImplementedError(f"iceberg type {ice_type!r}")
    for _ in range(10):
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        if meta["format-version"] != 3:
            raise ValueError(
                "default values are a format-version 3 feature "
                f"(table is v{meta['format-version']})")
        if any(f["name"] == name for f in meta["schema"]["fields"]):
            raise ValueError(f"column {name!r} already exists")
        fid = meta.get("last-column-id", 0) + 1
        field = {"id": fid, "name": name, "type": ice_type,
                 "required": False}
        if initial_default is not None:
            field["initial-default"] = initial_default
            field["_added_at_seq"] = meta.get("last-sequence-number", 0)
        if write_default is not None:
            field["write-default"] = write_default
        version = meta["last-version"] + 1
        new_meta = dict(meta)
        new_meta["schema"] = {**meta["schema"],
                              "fields": meta["schema"]["fields"] + [field]}
        new_meta["last-column-id"] = fid
        new_meta["last-version"] = version
        new_meta["last-updated-ms"] = int(time.time() * 1000)
        try:
            _commit_metadata(table, version, new_meta)
            return version
        except IcebergCommitConflict:
            continue
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


def changelog_iceberg(spark: SparkSession, table: str,
                      from_snapshot_id: int | None = None,
                      to_snapshot_id: int | None = None) -> DataFrame:
    """CHANGELOG SCAN (the Iceberg create_changelog_view concept): the
    row-level changes between two snapshots on the main ancestry line
    as (table columns, _change_type 'insert'/'delete', _snapshot_id).
    ``from_snapshot_id`` is EXCLUSIVE (None = from table creation),
    ``to_snapshot_id`` inclusive (None = current). Per snapshot, by
    its summary operation:

    - append    -> data files new vs the parent read as inserts;
    - delete    -> the (file, position) pairs NEW at this snapshot
      (pos-delete Avros and v3 DVs both; superseding re-delete DVs
      diff via exceptAll, so re-deletes emit only the newly-dead
      rows) joined back to the parent-visible raw files, and
      equality keys whose scope sequence moved joined semi against
      the parent snapshot read — both emitted as deletes;
    - overwrite (single-snapshot upsert) -> its eq-delete side as
      deletes plus its data files as inserts;
    - replace (compaction / manifest or delete rewrites / sync) ->
      no logical change, skipped.

    A signed fold of the changelog therefore reconstructs any
    aggregate of the final state from the starting one — the Iceberg
    twin of read_changes_delta. Cost: O(files changed per snapshot)
    planning; the delete materialization reads only the referenced
    parent files (plus, for equality deletes, one MOR-filtered parent
    read per upsert snapshot — bounded by the keys' broadcast
    semi-join). Name-mapped (UniForm-synced) tables are out of scope
    (their history is all 'replace' sync points anyway)."""
    from pyspark.sql import functions as F

    meta = _current_metadata(table)
    if meta is None:
        raise FileNotFoundError(f"no iceberg metadata under {table}")
    if _name_mapping_property(meta):
        raise NotImplementedError(
            "changelog over name-mapped (synced) tables out of scope")
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    to_sid = (to_snapshot_id if to_snapshot_id is not None
              else meta["current-snapshot-id"])
    chain: list[dict] = []
    cur = to_sid
    while cur is not None and cur != from_snapshot_id:
        sn = by_id.get(cur)
        if sn is None:
            raise ValueError(
                f"snapshot {cur} not in table history (expired?)")
        chain.append(sn)
        cur = sn.get("parent-snapshot-id")
    if from_snapshot_id is not None and cur != from_snapshot_id:
        raise ValueError(
            f"{from_snapshot_id} is not an ancestor of {to_sid}")
    chain.reverse()
    fields = meta["schema"]["fields"]
    cols = [f["name"] for f in fields]
    ddl = ", ".join(
        f"{f['name']} {_ICE_TO_SPARK[f['type']]}" for f in fields)
    out_ddl = ddl + ", _change_type string, _snapshot_id long"
    name_to_type = {f["name"]: _ICE_TO_SPARK[f["type"]] for f in fields}
    root = os.path.abspath(table)
    plans: dict[int, dict] = {}

    def plan_of(sid: int) -> dict:
        if sid not in plans:
            plans[sid] = plan_scan_iceberg(table, snapshot_id=sid)
        return plans[sid]

    def pairs_frame(plan: dict | None):
        if plan is None:
            return None
        fr = []
        if plan["pos_delete_files"]:
            fr.append(_pos_delete_frame(
                spark, root, plan["pos_delete_files"]))
        if plan["dv_descriptors"]:
            fr.append(_dv_delete_frame(
                spark, root, plan["dv_descriptors"]))
        if not fr:
            return None
        out = fr[0]
        for x in fr[1:]:
            out = out.unionByName(x)
        return out

    frames: list[DataFrame] = []
    for sn in chain:
        sid = sn["snapshot-id"]
        op = (sn.get("summary") or {}).get("operation")
        parent = sn.get("parent-snapshot-id")
        p_plan = plan_of(parent) if parent is not None else None
        s_plan = plan_of(sid)
        if op == "replace":
            continue
        parent_paths = {p for p, _s in (p_plan["paths"] if p_plan else [])}
        added = [p for p, _s in s_plan["paths"] if p not in parent_paths]
        if op == "append":
            if added:
                df = spark.read.schema(ddl).parquet(
                    *[os.path.join(table, p) for p in added])
                frames.append(
                    df.select(*cols)
                    .withColumn("_change_type", F.lit("insert"))
                    .withColumn("_snapshot_id", F.lit(sid)))
            continue
        if op not in ("delete", "overwrite"):
            raise NotImplementedError(
                f"changelog over snapshot operation {op!r}")
        sp = pairs_frame(s_plan)
        pp = pairs_frame(p_plan)
        if sp is not None:
            delta_pairs = sp if pp is None else sp.exceptAll(pp)
            ref_files = [p for p, _s in (p_plan["paths"] if p_plan
                                         else s_plan["paths"])]
            if ref_files:
                tagged = spark.read.schema(ddl).parquet(
                    *[os.path.join(table, p) for p in ref_files]
                ).select(
                    *cols,
                    _rel_path_col(root).alias("_fp"),
                    F.col("_metadata.row_index").alias("_pos"),
                )
                frames.append(
                    tagged.join(delta_pairs, ["_fp", "_pos"], "left_semi")
                    .select(*cols)
                    .withColumn("_change_type", F.lit("delete"))
                    .withColumn("_snapshot_id", F.lit(sid)))
        s_eq = s_plan["eq_deletes"]
        p_eq = p_plan["eq_deletes"] if p_plan else {}
        for names, bucket in sorted(s_eq.items()):
            pbucket = p_eq.get(names, {})
            new_keys = sorted(
                k for k, sq in bucket.items()
                if sq > pbucket.get(k, -1))
            if not new_keys or parent is None:
                continue
            kddl = ", ".join(
                f"_eq_{n} {name_to_type[n]}" for n in names)
            kdf = spark.createDataFrame(
                [tuple(k) for k in new_keys], kddl)
            parent_vis = read_iceberg(spark, table, snapshot_id=parent)
            cond = F.lit(True)
            for n in names:
                cond = cond & parent_vis[n].eqNullSafe(kdf[f"_eq_{n}"])
            frames.append(
                parent_vis.join(F.broadcast(kdf), cond, "left_semi")
                .select(*cols)
                .withColumn("_change_type", F.lit("delete"))
                .withColumn("_snapshot_id", F.lit(sid)))
        if op == "overwrite" and added:
            df = spark.read.schema(ddl).parquet(
                *[os.path.join(table, p) for p in added])
            frames.append(
                df.select(*cols)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_snapshot_id", F.lit(sid)))
    if not frames:
        return spark.createDataFrame([], out_ddl)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df)
    return out


def rewrite_position_deletes_iceberg(spark: SparkSession, table: str,
                                     target_files: int = 1
                                     ) -> tuple[int, int, int]:
    """The spec's rewrite_position_delete_files maintenance action:
    merge the current snapshot's position-delete AVRO files into
    ``target_files`` consolidated files (deduplicated, sorted) under
    ONE fresh content=1 manifest, superseding the manifests that held
    only the merged files — a day of per-commit MOR deletes stops
    costing the reader one Avro open+decode per delete file. Data
    manifests, equality-delete manifests, v3 Puffin DV manifests, and
    any MIXED manifest carry verbatim (our writers never mix; fail
    untouched, never wrong). Decode and rewrite are DISTRIBUTED — the
    (file, pos) pairs ride _pos_delete_frame's executor decode and a
    per-target-file mapInPandas writer; only O(delete files) metadata
    rows reach the driver. The snapshot is summary-labeled 'replace'
    (no logical data change; iceberg_feed rides through). Returns
    (snapshot id, delete files before, delete files after); a no-op
    when already at-or-below target returns the current snapshot
    unchanged."""
    import pandas as _pd  # noqa: F401 — worker annotation resolution

    for _ in range(10):
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        snap = _snapshot(meta, meta["current-snapshot-id"])
        mlist, _ls = read_avro(_read_file(table, snap["manifest-list"]))
        superseded: set[int] = set()
        pos_files: list[dict] = []
        max_seq = 0
        for i, m in enumerate(mlist):
            if m.get("content", DATA_CONTENT) != DELETE_CONTENT:
                continue
            entries, _e = read_avro(_read_file(table, m["manifest_path"]))
            live = [e for e in entries if e["status"] in (ADDED, EXISTING)]
            plain = [
                e for e in live
                if e["data_file"].get("file_format") != "PUFFIN"
                and e["data_file"].get(
                    "content", FILE_POS_DELETES) == FILE_POS_DELETES]
            if plain and len(plain) == len(live):
                superseded.add(i)
                pos_files.extend(e["data_file"] for e in plain)
                max_seq = max(max_seq, m.get("sequence_number", 0))
        if len(pos_files) <= target_files:
            return (meta["current-snapshot-id"],
                    len(pos_files), len(pos_files))
        pairs = _pos_delete_frame(
            spark, table, [d["file_path"] for d in pos_files]
        ).toDF("file_path", "pos").dropDuplicates(["file_path", "pos"])
        table_abs = table

        def _write_merged(batches):
            rows: list[tuple[str, int]] = []
            for pdf in batches:
                rows.extend(
                    (p, int(q)) for p, q in zip(pdf["file_path"], pdf["pos"]))
            if not rows:
                return
            rows.sort()
            blob = write_avro(
                [{"file_path": p, "pos": q} for p, q in rows],
                _POS_DELETE_SCHEMA, codec="deflate")
            rel = os.path.join("data", f"delete-{uuid.uuid4().hex}.avro")
            with open(os.path.join(table_abs, rel), "wb") as f:
                f.write(blob)
            import pandas as pd2
            yield pd2.DataFrame([{
                "file_path": rel, "record_count": len(rows),
                "file_size_in_bytes": len(blob)}])

        written = sorted(
            pairs.repartition(max(1, target_files), "file_path")
            .mapInPandas(
                _write_merged,
                "file_path string, record_count long,"
                " file_size_in_bytes long").collect(),
            key=lambda r: r["file_path"])
        version = meta["last-version"] + 1
        snapshot_id = version + 1
        manifest_rel = os.path.join(
            "metadata",
            f"manifest-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        manifest_blob = write_avro([{
            "status": ADDED, "snapshot_id": snapshot_id,
            "data_file": {
                "file_path": r["file_path"], "file_format": "AVRO",
                "record_count": r["record_count"],
                "file_size_in_bytes": r["file_size_in_bytes"],
                "lower_bounds": [], "upper_bounds": [],
                "sort_order_id": 0,
            }} for r in written], _MANIFEST_SCHEMA, codec="deflate")
        with open(os.path.join(table, manifest_rel), "wb") as f:
            f.write(manifest_blob)
        new_mlist = [m for i, m in enumerate(mlist)
                     if i not in superseded] + [{
                         "manifest_path": manifest_rel,
                         "manifest_length": len(manifest_blob),
                         "partition_spec_id": _delete_manifest_spec_id(meta),
                         "added_snapshot_id": snapshot_id,
                         "content": DELETE_CONTENT,
                         "sequence_number": max_seq,
                     }]
        mlist_rel = os.path.join(
            "metadata", f"snap-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}.avro")
        with open(os.path.join(table, mlist_rel), "wb") as f:
            f.write(write_avro(new_mlist, _MANIFEST_LIST_SCHEMA_V2,
                               codec="deflate"))
        now_ms = int(time.time() * 1000)
        n_recs = sum(r["record_count"] for r in written)
        new_meta = dict(meta)
        new_meta["snapshots"] = meta["snapshots"] + [{
            "snapshot-id": snapshot_id, "timestamp-ms": now_ms,
            "parent-snapshot-id": meta["current-snapshot-id"],
            "manifest-list": mlist_rel,
            "sequence-number": meta["last-sequence-number"],
            "summary": {
                "operation": "replace",
                "rewritten-delete-files": str(len(pos_files)),
                "added-delete-files": str(len(written)),
                **_fold_totals(
                    snap.get("summary"),
                    delete_files=len(written) - len(pos_files),
                    pos_deletes=n_recs - sum(
                        int(d.get("record_count") or 0)
                        for d in pos_files)),
            },
        }]
        new_meta["current-snapshot-id"] = snapshot_id
        new_meta["last-version"] = version
        new_meta["last-updated-ms"] = now_ms
        try:
            _commit_metadata(table, version, new_meta)
            return snapshot_id, len(pos_files), len(written)
        except IcebergCommitConflict:
            continue  # losers orphan their merged files, harmless
    raise IcebergCommitConflict(f"lost 10 rewrite races on {table}")


def sync_iceberg_from_delta(spark: SparkSession, table: str) -> int:
    """Zero-copy Delta -> Iceberg metadata sync (the Delta UniForm /
    Apache XTable concept, both public): generate an Iceberg-v1
    snapshot over the CURRENT Delta snapshot's live parquet files —
    same bytes on disk, two table formats' metadata side by side
    (``_delta_log/`` and ``metadata/`` coexist in one directory; the
    manifest entries point at the very same relative paths the Delta
    log references). Each sync appends ONE Iceberg snapshot whose
    manifest list contains exactly that sync's manifest (no
    carry-forward — the Delta snapshot is already the full live set),
    so Iceberg time travel steps through sync points. Returns the
    snapshot id.

    Caveats stated: Delta tombstone rows (op='DELETE' images kept by
    merge_delta) are ordinary rows in both views — readers of either
    format filter them identically; and vacuum_delta must retain any
    file a still-wanted Iceberg snapshot references (version-based
    retention covers the latest sync by construction since both
    formats reference the same live set).
    """
    import json as _json

    from pyspark.sql.types import StructType as _StructType

    from postrack_spark.streaming.delta_log import (
        _replay as _delta_replay,
    )

    acts_map, schema_string, _v, _txns, _dconfig = _delta_replay(table, None)
    acts = list(acts_map.items())
    # COLUMN-MAPPING tables sync by TRANSLATION (the r7 refusal
    # lifted): the Iceberg schema carries the LOGICAL names keyed by
    # the delta.columnMapping.id values as Iceberg field-ids — the two
    # metadata systems are id-based on both sides — and the physical
    # parquet names ride the spec's schema.name-mapping.default
    # property, so readers resolve the physical columns by mapping
    # (name mode: parquet has no field ids) or by parquet field id
    # (id mode stamps them; ids EQUAL the mapping ids by construction)
    _dfields = _json.loads(schema_string)["fields"]
    _cm_mode = (_dconfig or {}).get("delta.columnMapping.mode")
    cm_ids: dict[str, int] = {}
    cm_phys: dict[str, str] = {}
    if _cm_mode in ("name", "id"):
        for f in _dfields:
            md = f.get("metadata") or {}
            cm_ids[f["name"]] = md["delta.columnMapping.id"]
            cm_phys[f["name"]] = md.get(
                "delta.columnMapping.physicalName", f["name"])
    if any(a.get("deletionVector") for _p, a in acts):
        # the sync points Iceberg metadata at the SAME parquet bytes;
        # a file carrying a Delta deletion vector has no Iceberg-side
        # representation here, so the synced snapshot would resurrect
        # deleted rows — refuse until compaction retires the DVs
        # (real UniForm imposes the same constraint)
        raise NotImplementedError(
            "UniForm sync of a table with deletion vectors: run "
            "compact_delta first")
    paths = [p for p, _a in acts]
    schema = _StructType.fromJson(_json.loads(schema_string))
    os.makedirs(_meta_dir(table), exist_ok=True)
    current = _current_metadata(table)
    version = 0 if current is None else current["last-version"] + 1
    snapshot_id = version + 1

    ice_schema = _ice_schema(schema)
    if cm_ids:
        for f in ice_schema["fields"]:
            f["id"] = cm_ids[f["name"]]
    phys_to_logical = {v: k for k, v in cm_phys.items()}
    entries = []
    for p in sorted(paths):
        lower, upper = _footer_bounds(os.path.join(table, p))
        if phys_to_logical:
            # footer bounds are keyed by the parquet's PHYSICAL names;
            # re-key to logical so _bind_bounds resolves field ids
            lower = {phys_to_logical.get(k, k): v for k, v in lower.items()}
            upper = {phys_to_logical.get(k, k): v for k, v in upper.items()}
        entries.append({
            "status": ADDED, "snapshot_id": snapshot_id,
            "data_file": {
                "file_path": p, "file_format": "PARQUET",
                "record_count": _parquet_rows(os.path.join(table, p)),
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(table, p)),
                "_raw_bounds": (lower, upper),
                "lower_bounds": [], "upper_bounds": [],
                "sort_order_id": 0,
            }})
    _bind_bounds(entries, ice_schema["fields"])
    manifest_rel = os.path.join("metadata", f"manifest-{snapshot_id:08d}.avro")
    manifest_blob = write_avro(entries, _MANIFEST_SCHEMA, codec="deflate")
    with open(os.path.join(table, manifest_rel), "wb") as f:
        f.write(manifest_blob)
    mlist_rel = os.path.join("metadata", f"snap-{snapshot_id:08d}.avro")
    with open(os.path.join(table, mlist_rel), "wb") as f:
        f.write(write_avro([{
            "manifest_path": manifest_rel,
            "manifest_length": len(manifest_blob),
            "partition_spec_id": 0,
            "added_snapshot_id": snapshot_id,
        }], _MANIFEST_LIST_SCHEMA, codec="deflate"))

    now_ms = int(time.time() * 1000)
    snapshots = (current["snapshots"] if current else []) + [{
        "snapshot-id": snapshot_id, "timestamp-ms": now_ms,
        "manifest-list": mlist_rel,
        "summary": {"operation": "replace", "source": "delta-sync"},
    }]
    # carry existing properties (the r7 property-erasure lesson), then
    # re-derive the sync-owned keys from the CURRENT delta schema
    properties = dict((current or {}).get("properties") or {})
    properties["delta.sync"] = "true"
    properties.pop("schema.name-mapping.default", None)
    if cm_phys:
        properties["schema.name-mapping.default"] = _json.dumps(
            [{"field-id": cm_ids[n], "names": [cm_phys[n]]}
             for n in sorted(cm_ids)],
            separators=(",", ":"))
    meta = {
        "format-version": 1,
        "table-uuid": (current or {}).get("table-uuid", str(uuid.uuid4())),
        "location": os.path.abspath(table),
        "last-updated-ms": now_ms,
        "last-column-id": max([f["id"] for f in ice_schema["fields"]],
                              default=len(schema.fields)),
        "schema": ice_schema,
        "partition-spec": [],
        "properties": properties,
        "metadata-log": list((current or {}).get("metadata-log") or []),
        "partition-statistics": list(
            (current or {}).get("partition-statistics") or []),
        "current-snapshot-id": snapshot_id,
        # tags/branches made against earlier syncs survive re-sync
        "refs": (current or {}).get("refs", {}),
        "snapshots": snapshots,
        "last-version": version,
    }
    _commit_metadata(table, version, meta)
    return snapshot_id


def inspect_iceberg(spark: SparkSession, table: str, kind: str) -> DataFrame:
    """METADATA TABLES (the spec's inspection surface — what
    ``SELECT * FROM tbl.snapshots`` serves in engine-integrated
    Iceberg): expose the table's own metadata as DataFrames, built
    from O(files) driver-side metadata — never a data scan.

    kinds:
      snapshots  — snapshot_id, parent_id, timestamp_ms, operation,
                   manifest_list, sequence_number
      history    — the main-line ancestry: made_current_at,
                   snapshot_id, parent_id, is_current_ancestor
      manifests  — path, length, partition_spec_id, content,
                   sequence_number, added_snapshot_id
      files      — live files at the CURRENT snapshot: file_path,
                   content, record_count, file_size_in_bytes,
                   sequence_number, partition (JSON string)
      refs       — name, type, snapshot_id
      metadata_log — timestamp_ms, metadata_file (the spec's lineage
                   of previous metadata versions)
      partitions — live DATA rollup by partition tuple (JSON string):
                   file_count, record_count
      detail     — 1-row operational card (the detail_delta twin):
                   format_version, table_uuid, location, current
                   snapshot, snapshot/spec/sort counts, the summary
                   total-* numbers, properties JSON
    """
    import json as _json

    meta = _current_metadata(table)
    if meta is None:
        raise FileNotFoundError(f"no iceberg metadata under {table}")
    if kind == "detail":
        snap = None
        if meta.get("current-snapshot-id") is not None:
            try:
                snap = _snapshot(meta, meta["current-snapshot-id"])
            except FileNotFoundError:
                snap = None
        summ = (snap or {}).get("summary") or {}

        def _tot(k2: str):
            try:
                return int(summ.get(k2))
            except (TypeError, ValueError):
                return None

        row = (
            meta["format-version"], meta.get("table-uuid"),
            meta.get("location"), meta.get("current-snapshot-id"),
            len(meta.get("snapshots") or []),
            len(meta.get("partition-specs")
                or ([meta.get("partition-spec")]
                    if meta.get("partition-spec") else [])),
            len(meta.get("sort-orders") or []),
            _tot("total-data-files"), _tot("total-records"),
            _tot("total-files-size"), _tot("total-delete-files"),
            _json.dumps(meta.get("properties") or {}, sort_keys=True,
                        separators=(",", ":")),
        )
        return spark.createDataFrame(
            [row],
            "format_version int, table_uuid string, location string,"
            " current_snapshot_id long, n_snapshots int, n_specs int,"
            " n_sort_orders int, total_data_files long,"
            " total_records long, total_files_size long,"
            " total_delete_files long, properties string")
    if kind == "snapshots":
        rows = [(s["snapshot-id"], s.get("parent-snapshot-id"),
                 s["timestamp-ms"],
                 (s.get("summary") or {}).get("operation"),
                 s["manifest-list"], s.get("sequence-number"),
                 _json.dumps(s.get("summary") or {}, sort_keys=True,
                             separators=(",", ":")))
                for s in meta["snapshots"]]
        return spark.createDataFrame(
            rows, "snapshot_id long, parent_id long, timestamp_ms long,"
                  " operation string, manifest_list string,"
                  " sequence_number long, summary string")
    if kind == "history":
        ancestors = set()
        by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
        cur = meta["current-snapshot-id"]
        while cur is not None and cur in by_id:
            ancestors.add(cur)
            cur = by_id[cur].get("parent-snapshot-id")
        rows = [(s["timestamp-ms"], s["snapshot-id"],
                 s.get("parent-snapshot-id"),
                 s["snapshot-id"] in ancestors)
                for s in meta["snapshots"]]
        return spark.createDataFrame(
            rows, "made_current_at long, snapshot_id long, parent_id long,"
                  " is_current_ancestor boolean")
    if kind == "refs":
        rows = [(name, r.get("type"), r["snapshot-id"])
                for name, r in sorted((meta.get("refs") or {}).items())]
        return spark.createDataFrame(
            rows, "name string, type string, snapshot_id long")
    if kind == "metadata_log":
        rows = [(e.get("timestamp-ms"), e.get("metadata-file"))
                for e in (meta.get("metadata-log") or [])]
        return spark.createDataFrame(
            rows, "timestamp_ms long, metadata_file string")
    snap = _snapshot(meta, meta["current-snapshot-id"])
    mlist, _s = read_avro(_read_file(table, snap["manifest-list"]))
    if kind == "manifests":
        rows = [(m["manifest_path"], m["manifest_length"],
                 m.get("partition_spec_id", 0),
                 m.get("content", DATA_CONTENT),
                 m.get("sequence_number"), m.get("added_snapshot_id"))
                for m in mlist]
        return spark.createDataFrame(
            rows, "path string, length long, partition_spec_id int,"
                  " content int, sequence_number long,"
                  " added_snapshot_id long")
    if kind in ("files", "partitions"):
        rows = []
        for m in mlist:
            entries, _e = read_avro(_read_file(table, m["manifest_path"]))
            seq = m.get("sequence_number")
            content = m.get("content", DATA_CONTENT)
            for e in entries:
                if e["status"] not in (ADDED, EXISTING):
                    continue
                d = e["data_file"]
                part = d.get("partition")
                rows.append((
                    d["file_path"],
                    content if content == DATA_CONTENT
                    else d.get("content", FILE_POS_DELETES),
                    d["record_count"], d["file_size_in_bytes"], seq,
                    _json.dumps(part, sort_keys=True)
                    if isinstance(part, dict) else None,
                    d.get("sort_order_id", 0),
                ))
        files = spark.createDataFrame(
            rows, "file_path string, content int, record_count long,"
                  " file_size_in_bytes long, sequence_number long,"
                  " partition string, sort_order_id int")
        if kind == "files":
            return files
        from pyspark.sql import functions as F

        return (files.filter(F.col("content") == DATA_CONTENT)
                .groupBy("partition")
                .agg(F.count("*").alias("file_count"),
                     F.sum("record_count").alias("record_count")))
    raise ValueError(
        f"unknown inspection kind {kind!r} (snapshots|history|metadata_log"
        "|manifests|"
        "files|refs|partitions|detail)")


def write_partition_stats_iceberg(table: str) -> str:
    """PARTITION STATISTICS file (the spec's "Partition statistics"
    section): aggregate the current snapshot's data manifests into one
    parquet row per (spec_id, partition tuple) — data_record_count,
    data_file_count, total_data_file_size_in_bytes,
    last_updated_snapshot_id/last_updated_at from the newest entry's
    snapshot — and register it under the metadata's
    ``partition-statistics`` list ({snapshot-id, statistics-path,
    file-size-in-bytes}), replacing any prior entry for the same
    snapshot. Delete-file attribution per partition and the
    post-delete total_record_count are left NULL (our delete entries
    carry no partition tuples — stated honestly; the spec marks those
    fields optional). Entries without a partition tuple (plain appends
    into a partitioned table) aggregate under an all-NULL tuple, the
    spec's unified-tuple behavior. Raises on a table with no data
    entries. The file is O(partitions) metadata — the planning-side
    summary external engines read INSTEAD of walking every manifest,
    which is the point at 100 TB: partition-level pruning stats in one
    seek. Returns the statistics file's relative path."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    for _ in range(10):
        meta = _current_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"no iceberg metadata under {table}")
        sid = meta["current-snapshot-id"]
        snap = _snapshot(meta, sid)
        ts_by_sid = {s["snapshot-id"]: s["timestamp-ms"]
                     for s in meta["snapshots"]}
        mlist, _ls = read_avro(_read_file(table, snap["manifest-list"]))
        agg: dict[tuple, dict] = {}
        keys: list[str] = []
        for m in mlist:
            if m.get("content", DATA_CONTENT) != DATA_CONTENT:
                continue
            entries, _e = read_avro(_read_file(table, m["manifest_path"]))
            for e in entries:
                if e["status"] not in (ADDED, EXISTING):
                    continue
                d = e["data_file"]
                part = d.get("partition")
                part = part if isinstance(part, dict) else {}
                for k in part:
                    if k not in keys:
                        keys.append(k)
                gk = (m["partition_spec_id"],
                      json.dumps(part, sort_keys=True))
                a = agg.setdefault(gk, {
                    "partition": part, "spec_id": m["partition_spec_id"],
                    "data_record_count": 0, "data_file_count": 0,
                    "total_data_file_size_in_bytes": 0,
                    "last_updated_snapshot_id": None})
                a["data_record_count"] += int(d["record_count"])
                a["data_file_count"] += 1
                a["total_data_file_size_in_bytes"] += int(
                    d["file_size_in_bytes"])
                esid = e.get("snapshot_id")
                if esid is not None and (
                        a["last_updated_snapshot_id"] is None
                        or esid > a["last_updated_snapshot_id"]):
                    a["last_updated_snapshot_id"] = esid
        if not agg:
            raise ValueError(f"no data entries to profile in {table}")
        part_fields = []
        for k in keys:
            vals = [a["partition"].get(k) for a in agg.values()]
            t = (_pa.int64() if all(v is None or isinstance(v, int)
                                    for v in vals) else _pa.string())
            part_fields.append(_pa.field(k, t))
        rows = []
        for a in sorted(agg.values(),
                        key=lambda x: (x["spec_id"],
                                       json.dumps(x["partition"],
                                                   sort_keys=True))):
            lu = a["last_updated_snapshot_id"]
            rows.append({
                "partition": {k: a["partition"].get(k) for k in keys},
                "spec_id": a["spec_id"],
                "data_record_count": a["data_record_count"],
                "data_file_count": a["data_file_count"],
                "total_data_file_size_in_bytes":
                    a["total_data_file_size_in_bytes"],
                "position_delete_record_count": None,
                "position_delete_file_count": None,
                "equality_delete_record_count": None,
                "equality_delete_file_count": None,
                "total_record_count": None,
                "last_updated_at": ts_by_sid.get(lu),
                "last_updated_snapshot_id": lu,
            })
        schema = _pa.schema([
            _pa.field("partition", _pa.struct(part_fields)),
            _pa.field("spec_id", _pa.int32()),
            _pa.field("data_record_count", _pa.int64()),
            _pa.field("data_file_count", _pa.int32()),
            _pa.field("total_data_file_size_in_bytes", _pa.int64()),
            _pa.field("position_delete_record_count", _pa.int64()),
            _pa.field("position_delete_file_count", _pa.int32()),
            _pa.field("equality_delete_record_count", _pa.int64()),
            _pa.field("equality_delete_file_count", _pa.int32()),
            _pa.field("total_record_count", _pa.int64()),
            _pa.field("last_updated_at", _pa.int64()),
            _pa.field("last_updated_snapshot_id", _pa.int64()),
        ])
        rel = os.path.join(
            "metadata",
            f"partition-stats-{sid:08d}-{uuid.uuid4().hex[:8]}.parquet")
        _pq.write_table(_pa.Table.from_pylist(rows, schema=schema),
                        os.path.join(table, rel))
        version = meta["last-version"] + 1
        new_meta = dict(meta)
        new_meta["partition-statistics"] = [
            e for e in (meta.get("partition-statistics") or [])
            if e.get("snapshot-id") != sid
        ] + [{
            "snapshot-id": sid, "statistics-path": rel,
            "file-size-in-bytes": os.path.getsize(
                os.path.join(table, rel)),
        }]
        new_meta["last-version"] = version
        new_meta["last-updated-ms"] = int(time.time() * 1000)
        try:
            _commit_metadata(table, version, new_meta)
            return rel
        except IcebergCommitConflict:
            os.remove(os.path.join(table, rel))  # recompute vs winner
            continue
    raise IcebergCommitConflict(f"lost 10 commit races on {table}")


def read_partition_stats_iceberg(spark: SparkSession, table: str,
                                 snapshot_id: int | None = None) -> DataFrame:
    """Read the registered partition statistics file for a snapshot
    (default: the newest registered) as a DataFrame — the consumer
    side of write_partition_stats_iceberg. Raises KeyError when no
    stats are registered for the requested snapshot."""
    meta = _current_metadata(table)
    if meta is None:
        raise FileNotFoundError(f"no iceberg metadata under {table}")
    entries = meta.get("partition-statistics") or []
    if snapshot_id is not None:
        entries = [e for e in entries if e.get("snapshot-id") == snapshot_id]
    if not entries:
        raise KeyError(
            f"no partition statistics registered for "
            f"{'snapshot ' + str(snapshot_id) if snapshot_id else table}")
    return spark.read.parquet(
        os.path.join(table, entries[-1]["statistics-path"]))


def expire_snapshots_iceberg(table: str, retain_last: int = 1,
                             now_ms: int | None = None,
                             older_than_ms: int | None = None
                             ) -> tuple[int, list[str]]:
    """Snapshot expiry (the spec's expire_snapshots maintenance
    action, version-based like delta_log.vacuum_delta for test
    determinism): keep the most recent ``retain_last`` snapshots,
    commit a new metadata version without the expired ones, then
    delete files reachable ONLY from expired snapshots — their
    manifest lists always; manifests and data files only when no kept
    snapshot references them (append-only histories keep carrying
    prior manifests forward, so there expiry reclaims just the old
    snap-*.avro lists — stated honestly). Time travel to an expired
    id then raises, exactly like a cleaned Delta checkpoint prefix.

    PER-REF RETENTION POLICIES (the spec's ref fields) are honored:
    - ``max-ref-age-ms``: a tag/branch older than this (age measured
      from its referenced snapshot's timestamp-ms, the Iceberg
      RemoveSnapshots rule) is DROPPED by this run — named refs stop
      being forever-retention-promises once aged out;
    - ``min-snapshots-to-keep`` (branches, default 1: the head) and
      ``max-snapshot-age-ms`` (branches, default None: count-only):
      the branch's parent-chain ancestors within either rule are
      protected, so a branch keeps its own recent history even when
      the global retain_last would drop it.
    ``now_ms`` pins the clock for deterministic tests;
    ``older_than_ms`` adds the spec API's age cutoff (snapshots at or
    after the instant are kept regardless of retain_last — the
    expire_snapshots(older_than=) shape). Returns (new metadata
    version, deleted relative paths)."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    meta = _current_metadata(table)
    if meta is None:
        raise FileNotFoundError(f"no iceberg metadata under {table}")
    snaps = meta["snapshots"]
    now = int(time.time() * 1000) if now_ms is None else now_ms
    by_id = {sn["snapshot-id"]: sn for sn in snaps}
    refs = dict(meta.get("refs") or {})
    live_refs: dict[str, dict] = {}
    for name, r in refs.items():
        mra = r.get("max-ref-age-ms")
        sn = by_id.get(r["snapshot-id"])
        if (mra is not None and sn is not None
                and now - sn["timestamp-ms"] > int(mra)):
            continue  # the ref itself aged out
        live_refs[name] = r
    refs_changed = set(live_refs) != set(refs)
    if len(snaps) <= retain_last and not refs_changed:
        return meta["last-version"], []
    # surviving refs PROTECT their snapshots (a tag is a retention
    # promise — the spec's rule; expiring a tagged snapshot would turn
    # a named anchor into a dangling pointer)
    protected = {r["snapshot-id"] for r in live_refs.values()}
    protected.add(meta["current-snapshot-id"])
    for r in live_refs.values():
        if r.get("type") != "branch":
            continue
        keep_n = int(r.get("min-snapshots-to-keep", 1))
        max_age = r.get("max-snapshot-age-ms")
        cur, i = r["snapshot-id"], 0
        while cur is not None and cur in by_id:
            sn = by_id[cur]
            within_age = (max_age is not None
                          and now - sn["timestamp-ms"] <= int(max_age))
            if i < keep_n or within_age:
                protected.add(cur)
            else:
                break  # ancestors are older still: nothing below keeps
            cur, i = sn.get("parent-snapshot-id"), i + 1
    kept = [sn for i, sn in enumerate(snaps)
            if i >= len(snaps) - retain_last
            or sn["snapshot-id"] in protected
            or (older_than_ms is not None
                and sn["timestamp-ms"] >= older_than_ms)]
    expired = [sn for sn in snaps if sn not in kept]
    if not expired and not refs_changed:
        return meta["last-version"], []

    def _reach(snapshots: list[dict]) -> tuple[set[str], set[str], set[str]]:
        mlists, manifests, datafiles = set(), set(), set()
        for s in snapshots:
            mlists.add(s["manifest-list"])
            mlist, _ = read_avro(_read_file(table, s["manifest-list"]))
            for m in mlist:
                manifests.add(m["manifest_path"])
                entries, _ = read_avro(_read_file(table, m["manifest_path"]))
                for e in entries:
                    datafiles.add(e["data_file"]["file_path"])
        return mlists, manifests, datafiles

    k_ml, k_mf, k_df = _reach(kept)
    e_ml, e_mf, e_df = _reach(expired)
    doomed = sorted((e_ml - k_ml) | (e_mf - k_mf) | (e_df - k_df))

    version = meta["last-version"] + 1
    new_meta = dict(meta)
    new_meta["snapshots"] = kept
    new_meta["refs"] = live_refs
    # partition-statistics entries follow their snapshots out
    kept_ids = {sn["snapshot-id"] for sn in kept}
    stats_kept = [e for e in (meta.get("partition-statistics") or [])
                  if e.get("snapshot-id") in kept_ids]
    stats_dropped = [e["statistics-path"]
                     for e in (meta.get("partition-statistics") or [])
                     if e.get("snapshot-id") not in kept_ids
                     and e.get("statistics-path")]
    if meta.get("partition-statistics") is not None:
        new_meta["partition-statistics"] = stats_kept
    doomed = sorted(set(doomed) | set(stats_dropped))
    new_meta["last-version"] = version
    new_meta["last-updated-ms"] = int(time.time() * 1000)
    # put-if-absent like every commit; expiry does not retry on
    # conflict (a concurrent writer changed the snapshot set — the
    # caller should re-run against it rather than expire blind)
    _commit_metadata(table, version, new_meta)
    # commit point passed: physical deletes are safe now
    for rel in doomed:
        os.remove(os.path.join(table, rel))
    return version, doomed


def remove_orphan_files_iceberg(table: str,
                                min_age_s: float = 259_200.0) -> list[str]:
    """ORPHAN FILE SWEEP (the spec's remove_orphan_files maintenance
    action): delete files under ``data/`` and ``metadata/`` that no
    retained metadata version references — the debris of lost OCC
    races (staged data files, manifests, and manifest lists whose
    commit never happened) and crashed writers, which expire_snapshots
    deliberately never touches (it only deletes REFERENCED history).

    Reference set: every ``v*.metadata.json`` still present, each of
    its snapshots' manifest list -> manifests -> data/delete files
    (dangling references from already-expired history are skipped).
    The metadata jsons and hint file are never candidates.

    ``min_age_s`` is the in-flight-writer guard and it matters: an
    append MOVES staged files into ``data/`` BEFORE its metadata
    commit, so a sweep with a tiny age would eat a commit in
    progress. The DEFAULT is therefore 3 days — Iceberg's own
    remove_orphan_files default — and callers passing something
    smaller must know their longest write. Leftover ``_staging_*``
    scratch trees older than the threshold are removed too. Returns
    deleted table-relative paths.

    Scale: one manifest walk per retained metadata version — O(files)
    driver metadata, zero data IO, the same cost class as planning a
    scan."""
    meta_dir = _meta_dir(table)
    if not os.path.isdir(meta_dir):
        raise FileNotFoundError(f"no iceberg metadata under {table}")
    referenced: set[str] = set()
    for name in sorted(os.listdir(meta_dir)):
        if not (name.startswith("v") and name.endswith(".metadata.json")):
            continue
        try:
            with open(os.path.join(meta_dir, name)) as f:
                meta = json.load(f)
        except (OSError, ValueError) as exc:
            # ABORT, never skip: a retained version that fails to parse
            # (crash mid-write of the current metadata, disk fault) may
            # be the ONLY reference to live data files — treating its
            # references as orphans would delete the very files a
            # recovery needs. The sweep is maintenance; refusing is
            # always safe, reclaiming on partial knowledge never is.
            raise RuntimeError(
                f"orphan sweep aborted: retained metadata {name} is "
                f"unreadable ({exc}); repair or remove it explicitly "
                "before sweeping") from exc
        for st in meta.get("partition-statistics") or []:
            if st.get("statistics-path"):
                referenced.add(st["statistics-path"])
        for s in meta.get("snapshots") or []:
            ml = s.get("manifest-list")
            if not ml:
                continue
            referenced.add(ml)
            try:
                mlist, _ = read_avro(_read_file(table, ml))
            except OSError:
                continue  # expired history: reference gone with it
            for m in mlist:
                referenced.add(m["manifest_path"])
                try:
                    entries, _ = read_avro(
                        _read_file(table, m["manifest_path"]))
                except OSError:
                    continue
                for e in entries:
                    referenced.add(e["data_file"]["file_path"])
    cutoff = time.time() - min_age_s
    removed: list[str] = []

    def _old(path: str) -> bool:
        try:
            return os.path.getmtime(path) <= cutoff
        except OSError:
            return False

    data_dir = os.path.join(table, "data")
    if os.path.isdir(data_dir):
        for name in sorted(os.listdir(data_dir)):
            rel = os.path.join("data", name)
            full = os.path.join(table, rel)
            if rel in referenced or not os.path.isfile(full):
                continue
            if _old(full):
                os.remove(full)
                removed.append(rel)
    for name in sorted(os.listdir(meta_dir)):
        if not name.endswith(".avro"):
            continue  # metadata jsons + hint are never candidates
        rel = os.path.join("metadata", name)
        if rel in referenced:
            continue
        full = os.path.join(table, rel)
        if _old(full):
            os.remove(full)
            removed.append(rel)
    for name in sorted(os.listdir(table)):
        if name.startswith("_staging_"):
            full = os.path.join(table, name)
            if os.path.isdir(full) and _old(full):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(name)
    return removed
