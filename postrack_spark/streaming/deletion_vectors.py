"""Delta deletion vectors — merge-on-read for the from-scratch Delta
log (streaming/delta_log.py), the Delta-side sibling of Iceberg v2's
position deletes.

The public Delta PROTOCOL.md defines deletion vectors as per-file
bitmaps of deleted row indexes: an ``add`` action carries a
``deletionVector`` descriptor {storageType, pathOrInlineDv, offset,
sizeInBytes, cardinality}, the bitmap itself is a 64-bit roaring
bitmap-array, and readers drop marked rows at scan time — deletes cost
O(matches) with NO data-file rewrite (COW `delete_delta` remains the
right trade for rare localized deletes; the lakehouse stress lane
measures the crossover).

Bitmap layer: postrack_spark/streaming/roaring.py — the portable
32-bit roaring format cross-certified BYTE-IDENTICAL against
org.roaringbitmap from the Spark classpath (tests/test_roaring.py),
composed into the 64-bit array keyed by the row index's high 32 bits.

DV file layout implemented here (simplifications stated honestly,
like the rest of this from-scratch log): a ``dv-*.bin`` file is one
version byte (1) followed by independently addressable DVs, each
[int32 BE payload size][payload][int32 BE crc32(payload)] where the
payload is [int32 LE magic 1681511377][RoaringArray64 portable bytes];
descriptors use storageType 'p' with a table-RELATIVE path (the spec's
'p' is absolute and 'u' is a z85-coded random prefix — relative keeps
the table relocatable, which the rest of this log already assumes) or
storageType 'i' with the payload INLINED into the descriptor as Z85
text (ZeroMQ RFC 32, implemented here) when it fits
INLINE_DV_MAX_BYTES — a handful of forgotten rows costs no extra file
and no extra read IO,
and one DV FILE holds the DVs of MANY data files at different offsets
(the spec's shared-file shape) — the distributed writer emits one DV
file per shuffle partition, so only O(affected files) descriptor rows
reach the driver, never row positions (the same executor-writes/
driver-commits protocol as the Iceberg MOR writer).

Interplay rules the tests pin:

* ``read_delta`` applies DVs via an Arrow-batched mapInPandas filter —
  the bitmap ships to executors COMPRESSED and membership is tested
  per row index, so the read path never materializes positions;
* compaction (``compact_delta``) reads through the DV filter and
  rewrites clean files, retiring every DV from the live view;
* the COW writers (merge_delta / delete_delta / delete_keys_delta)
  REFUSE to rewrite a file that carries a DV (they read raw parquet,
  so a silent rewrite would RESURRECT deleted rows) — compact first;
* ``vacuum_delta`` retains DV files referenced by kept snapshots.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from postrack_spark.streaming.roaring import RoaringArray64

_Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    """Z85 (ZeroMQ RFC 32, public): 4 bytes -> 5 chars big-endian.
    Input is zero-padded to a 4-byte multiple; the caller records the
    true length (the descriptor's sizeInBytes) to truncate on decode."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 text length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            v = v * 85 + _Z85_INV[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


DV_MAGIC = 1681511377  # the Delta deletion-vector payload magic
_DV_VERSION = 1
# DVs at or under this payload size inline into the descriptor itself
# (storageType 'i', z85-coded) — no extra file, no extra read IO; the
# forget-set shape where a file loses a handful of rows
INLINE_DV_MAX_BYTES = 256


def _pack_dv(rb: RoaringArray64) -> bytes:
    payload = struct.pack("<i", DV_MAGIC) + rb.serialize()
    return (struct.pack(">I", len(payload)) + payload
            + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF))


def read_dv(table: str, descriptor: dict) -> RoaringArray64:
    """Load one deletion vector through its descriptor (CRC-checked
    for file storage; inline payloads carry no CRC — the JSON commit
    itself is the integrity boundary, as in the spec)."""
    st = descriptor.get("storageType")
    if st == "i":
        payload = z85_decode(descriptor["pathOrInlineDv"])[
            : descriptor["sizeInBytes"]]
        (magic,) = struct.unpack_from("<i", payload, 0)
        if magic != DV_MAGIC:
            raise ValueError(f"inline DV magic {magic} != {DV_MAGIC}")
        return RoaringArray64.deserialize(payload, 4)
    if st != "p":
        raise NotImplementedError(
            f"DV storageType {st!r} not written by this module")
    path = os.path.join(table, descriptor["pathOrInlineDv"])
    with open(path, "rb") as f:
        blob = f.read()
    off = descriptor["offset"]
    (size,) = struct.unpack_from(">I", blob, off)
    payload = blob[off + 4 : off + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise ValueError("DV payload CRC mismatch")
    (magic,) = struct.unpack_from("<i", payload, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"DV payload magic {magic} != {DV_MAGIC}")
    return RoaringArray64.deserialize(payload, 4)


def _local_path(fp: str) -> str:
    """Scan-reported file URI -> normalized local absolute path. DV
    state is keyed by LOG ACTION KEY (table-relative normally,
    ABSOLUTE for shallow-clone-referenced source files); matching
    through normpath(join(root, key)) == normpath(local(fp)) is
    correct for both — a relpath against the clone root is not."""
    if fp.startswith("file:"):
        fp = fp[len("file:"):]
        while fp.startswith("//"):
            fp = fp[1:]
    return os.path.normpath(fp)


def dv_filter(df: DataFrame, table: str, dv_bytes: dict[str, bytes],
              schema: StructType) -> DataFrame:
    """Apply deletion vectors to a scan that can surface _metadata:
    ship the COMPRESSED per-file DV payload bytes to executors and
    drop rows whose (file, row_index) is marked. Arrow-batched; the
    bitmap decodes once per (partition, file)."""
    cols = [f.name for f in schema.fields]
    root = os.path.abspath(table)
    # key DV payloads by normalized ABSOLUTE path so both ordinary
    # (table-relative) and shallow-clone (absolute) action keys match
    abs_bytes = {os.path.normpath(os.path.join(root, k)): v
                 for k, v in dv_bytes.items()}
    tagged = df.select(
        *cols,
        F.col("_metadata.file_path").alias("_fp"),
        F.col("_metadata.row_index").alias("_ri"),
    )

    def fn(batches):
        cache: dict[str, RoaringArray64 | None] = {}
        rels: dict[str, str] = {}
        for pdf in batches:
            keep = []
            for fp, ri in zip(pdf["_fp"], pdf["_ri"]):
                rel = rels.get(fp)
                if rel is None:
                    rel = _local_path(fp)
                    rels[fp] = rel
                bm = cache.get(rel, False)
                if bm is False:
                    raw = abs_bytes.get(rel)
                    bm = (RoaringArray64.deserialize(raw, 4)
                          if raw is not None else None)
                    cache[rel] = bm
                keep.append(bm is None or int(ri) not in bm)
            yield pdf.loc[keep, cols]

    return tagged.mapInPandas(fn, schema)


def load_dv_bytes(table: str, acts: list[tuple[str, dict]]
                  ) -> dict[str, bytes]:
    """{data-file rel path: CRC-checked DV payload bytes} for every
    live add action carrying a deletionVector. O(total DV bytes) —
    compressed bitmaps, driver-side once per read."""
    out: dict[str, bytes] = {}
    for p, add in acts:
        d = add.get("deletionVector")
        if not d:
            continue
        if d.get("storageType") == "i":
            out[p] = z85_decode(d["pathOrInlineDv"])[: d["sizeInBytes"]]
            continue
        path = os.path.join(table, d["pathOrInlineDv"])
        with open(path, "rb") as f:
            blob = f.read()
        off = d["offset"]
        (size,) = struct.unpack_from(">I", blob, off)
        payload = blob[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
        if zlib.crc32(payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV CRC mismatch for {p}")
        out[p] = payload
    return out


def _delete_dv(spark: SparkSession, table: str, matcher,
               inline_max_bytes: int | None = None) -> tuple[int, int, int]:
    """MERGE-ON-READ DELETE WHERE: rows matching ``condition`` (SQL
    DELETE semantics — NULL survives) are recorded in per-file
    deletion vectors; NO data parquet is rewritten. Returns
    (committed version, rows newly deleted, files affected).

    Distributed write: matches repartition by file_path (explicit
    count = live file count, the AQE-coalesce lesson from the Iceberg
    MOR writer) and each executor partition writes ONE shared DV file
    holding the merged bitmaps of its files; only O(affected files)
    descriptor rows reach the driver. Files that already carry a DV
    get their existing bitmap UNIONED in executor-side (the old DV
    payload ships compressed with the task), so stacked deletes
    compose and a re-matched already-deleted row adds nothing."""
    from postrack_spark.streaming.delta_log import (
        DeltaCommitConflict,
        _cdf_enabled,
        _cm_ids,
        _column_mapping,
        _physical_struct,
        _replay,
        _to_physical,
        _write_change_files,
        commit_delta,
        latest_version,
    )

    inline_cap = (INLINE_DV_MAX_BYTES if inline_max_bytes is None
                  else inline_max_bytes)
    for _ in range(10):  # snapshot-pinned OCC (the delta_log rule)
        live_map, schema_string, read_v, _t, config = _replay(table, None)
        from postrack_spark.streaming.delta_log import _guard_append_only

        _guard_append_only(config, "a deletion-vector delete")
        acts = list(live_map.items())
        adds = dict(acts)
        schema = StructType.fromJson(json.loads(schema_string))
        root = os.path.abspath(table)
        if not acts:
            return latest_version(table) or 0, 0, 0
        mapping = _column_mapping(schema_string, config)
        cm_ids = _cm_ids(schema_string, config)
        phys = _physical_struct(schema, mapping, cm_ids)
        live = spark.read.schema(phys).parquet(
            *[os.path.join(table, p) for p, _a in acts])
        # tag the scan's _metadata BEFORE the matcher runs: the
        # pseudo-column resolves only directly on the file scan, not
        # on top of a join (the semi-join matcher path). Columns are
        # projected to LOGICAL names in the same select (column
        # mapping: the matcher's condition speaks logical names).
        tagged = live.select(
            *[F.col(mapping.get(f.name, f.name) if mapping else f.name)
              .alias(f.name) for f in schema.fields],
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_ri"),
        )
        matches = matcher(tagged).select("_fp", "_ri")
        existing = load_dv_bytes(table, acts)
        # action-key map (clone-aware: keys may be absolute)
        key_by_abs = {os.path.normpath(os.path.join(root, p)): p
                      for p, _a in acts}

        def write_partition(batches):
            import pandas as pd

            per_file: dict[str, set[int]] = {}
            for pdf in batches:
                for fp, ri in zip(pdf["_fp"], pdf["_ri"]):
                    rel = key_by_abs[_local_path(fp)]
                    per_file.setdefault(rel, set()).add(int(ri))
            if not per_file:
                return
            rows = []
            blob = bytearray(bytes([_DV_VERSION]))
            for rel in sorted(per_file):
                rb = RoaringArray64(per_file[rel])
                old = existing.get(rel)
                old_card = 0
                if old is not None:
                    prev = RoaringArray64.deserialize(old, 4)
                    old_card = prev.cardinality()
                    for v in prev.values():
                        rb.add(v)
                payload = struct.pack("<i", DV_MAGIC) + rb.serialize()
                if len(payload) <= inline_cap:
                    # tiny DV: inline into the descriptor (z85), no file
                    rows.append({
                        "file_path": rel, "offset": -1,
                        "size_in_bytes": len(payload),
                        "cardinality": rb.cardinality(),
                        "old_cardinality": old_card,
                        "inline": z85_encode(payload),
                    })
                    continue
                packed = _pack_dv(rb)
                rows.append({
                    "file_path": rel,
                    "offset": len(blob),
                    "size_in_bytes": len(packed) - 8,
                    "cardinality": rb.cardinality(),
                    "old_cardinality": old_card,
                    "inline": None,
                })
                blob += packed
            dv_rel = None
            if len(blob) > 1:  # at least one file-stored DV
                dv_rel = f"dv-{uuid.uuid4().hex}.bin"
                with open(os.path.join(root, dv_rel), "wb") as f:
                    f.write(bytes(blob))
            for r in rows:
                r["dv_path"] = dv_rel
            yield pd.DataFrame(rows)

        out_schema = ("file_path string, offset long, size_in_bytes long,"
                      " cardinality long, old_cardinality long,"
                      " inline string, dv_path string")
        written = sorted(
            matches.repartition(max(1, len(acts)), "_fp")
            .mapInPandas(write_partition, out_schema).collect(),
            key=lambda r: r["file_path"])
        if not written:
            return latest_version(table) or 0, 0, 0
        import time as _time

        now_ms = int(_time.time() * 1000)
        removes, new_adds = [], []
        n_new = 0
        for r in written:
            add = dict(adds[r["file_path"]])
            n_new += r["cardinality"] - r["old_cardinality"]
            removes.append({"remove": {
                "path": r["file_path"], "deletionTimestamp": now_ms,
                "dataChange": True,
            }})
            if r["inline"] is not None:
                add["deletionVector"] = {
                    "storageType": "i",
                    "pathOrInlineDv": r["inline"],
                    "sizeInBytes": int(r["size_in_bytes"]),
                    "cardinality": int(r["cardinality"]),
                }
            else:
                add["deletionVector"] = {
                    "storageType": "p",
                    "pathOrInlineDv": r["dv_path"],
                    "offset": int(r["offset"]),
                    "sizeInBytes": int(r["size_in_bytes"]),
                    "cardinality": int(r["cardinality"]),
                }
            add["dataChange"] = True
            new_adds.append({"add": add})
        cdc_actions: list[dict] = []
        if _cdf_enabled(config):
            # CHANGE FEED rows = the NEWLY deleted rows only: apply
            # the matcher to the DV-FILTERED live view (old marks
            # applied), so re-deleting an already-marked row emits
            # nothing — matching n_new's new-minus-old accounting
            visible = dv_filter(live, table, existing, phys)
            if mapping:
                visible = visible.select(
                    *[F.col(mapping.get(f.name, f.name)).alias(f.name)
                      for f in schema.fields])
            cdc_actions = _write_change_files(
                _to_physical(
                    matcher(visible).withColumn(
                        "_change_type", F.lit("delete")),
                    mapping, cm_ids), table)
        try:
            commit_delta(table, read_v + 1,
                         removes + new_adds + cdc_actions)
            return read_v + 1, n_new, len(written)
        except DeltaCommitConflict:
            continue  # recompute matches + merged bitmaps from new snapshot
    raise DeltaCommitConflict(f"lost 10 commit races on {table}")


def delete_delta_dv(spark: SparkSession, table: str, condition: str,
                    inline_max_bytes: int | None = None
                    ) -> tuple[int, int, int]:
    """MOR DELETE WHERE (SQL semantics — NULL survives); see
    _delete_dv for the distributed-write shape. ``inline_max_bytes``
    overrides the inline-vs-file storage threshold (0 forces file
    storage — the tests' lever; None = INLINE_DV_MAX_BYTES)."""
    return _delete_dv(
        spark, table,
        lambda live: live.filter(
            F.coalesce(F.expr(condition), F.lit(False))),
        inline_max_bytes=inline_max_bytes)


def delete_keys_delta_dv(spark: SparkSession, table: str,
                         keys: DataFrame, key_col: str
                         ) -> tuple[int, int, int]:
    """MOR DELETE by key set — the GDPR forget shape: the (broadcast)
    key frame semi-joins the live scan and every matching row lands in
    its file's deletion vector. Naturally idempotent: re-deleting an
    already-marked row unions to the same bitmap and counts zero."""
    ks = keys.select(key_col).distinct()
    return _delete_dv(
        spark, table,
        lambda live: live.join(F.broadcast(ks), key_col, "left_semi"))


def foreach_batch_delta_dv_delete(table: str, key_col: str):
    """foreachBatch hook: streaming GDPR purge via DELETION VECTORS —
    the merge-on-read twin of delta_log.foreach_batch_delta_delete
    (COW). Same txn-marker idempotence for replays; the crash window
    between the DV commit and the marker is at-least-once with
    identical effect because bitmap union is idempotent."""
    from postrack_spark.streaming.delta_log import (
        _append_txn,
        last_txn_version,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        last = last_txn_version(table)
        if last is not None and batch_id <= last:
            return
        version, _n, _nf = delete_keys_delta_dv(
            batch_df.sparkSession, table, batch_df, key_col)
        _append_txn(table, version, batch_id)

    return apply_batch


def guard_no_dvs(acts, paths: list[str], op: str) -> None:
    """COW writers rewrite files by reading raw parquet — doing that to
    a file carrying a deletion vector would RESURRECT its deleted rows.
    Refuse loudly; compaction (which reads through the DV filter)
    clears the state."""
    adds = dict(acts)
    dvd = [p for p in paths if adds.get(p, {}).get("deletionVector")]
    if dvd:
        raise NotImplementedError(
            f"{op}: {len(dvd)} affected file(s) carry deletion vectors "
            f"(e.g. {dvd[0]}); run compact_delta first — a raw rewrite "
            "would resurrect DV-deleted rows")
