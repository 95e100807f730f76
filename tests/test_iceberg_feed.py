"""Iceberg incremental-append streaming source
(sources/iceberg_feed.py): snapshot-range consumption with checkpoint
resume, pacing, and the set-difference append-only guard — the
Iceberg twin of test_delta_feed.py."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from postrack_spark.sources.iceberg_feed import register
from postrack_spark.streaming.iceberg import append_iceberg


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))


def _drain(spark, table, ckpt, max_snapshots=None):
    register(spark)
    reader = spark.readStream.format("iceberg_feed").option("path", table)
    if max_snapshots:
        reader = reader.option("maxSnapshotsPerTrigger", str(max_snapshots))
    rows = []

    def sink(batch_df, _batch_id):
        rows.extend(batch_df.collect())

    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_incremental_consumption_with_checkpoint_resume(spark):
    t = tempfile.mkdtemp(prefix="icefeed_t_")
    ckpt = tempfile.mkdtemp(prefix="icefeed_ckpt_")
    append_iceberg(_df(spark, 0, 5), t)
    append_iceberg(_df(spark, 5, 8), t)
    out1 = _drain(spark, t, ckpt)
    assert sorted(r["k"] for r in out1) == list(range(8))
    append_iceberg(_df(spark, 8, 10), t)
    out2 = _drain(spark, t, ckpt)
    assert sorted(r["k"] for r in out2) == [8, 9]


def test_snapshot_pacing_bounds_each_run(spark):
    t = tempfile.mkdtemp(prefix="icefeed_p_")
    ckpt = tempfile.mkdtemp(prefix="icefeed_pc_")
    for lo in range(0, 9, 3):
        append_iceberg(_df(spark, lo, lo + 3), t)
    seen = []
    for run in range(4):
        out = _drain(spark, t, ckpt, max_snapshots=1)
        if run < 3:
            assert sorted(r["k"] for r in out) == list(range(3 * run, 3 * run + 3))
        else:
            assert out == []
        seen.extend(out)
    assert sorted(r["k"] for r in seen) == list(range(9))


def test_feed_rides_through_compaction_exactly_once(spark):
    """VERDICT r6 item 5: a 'replace' snapshot (compact_iceberg) is a
    logical no-op to the feed — data already delivered never re-emits,
    the diff base moves to the compacted file set, and appends after
    the compaction emit exactly their own rows."""
    from postrack_spark.streaming.iceberg import compact_iceberg

    t = tempfile.mkdtemp(prefix="icefeed_cp_")
    ckpt = tempfile.mkdtemp(prefix="icefeed_cpc_")
    append_iceberg(_df(spark, 0, 4).repartition(2), t, format_version=2)
    append_iceberg(_df(spark, 4, 6), t, format_version=2)
    out1 = _drain(spark, t, ckpt)
    assert sorted(r["k"] for r in out1) == list(range(6))
    compact_iceberg(spark, t, target_files=1)  # replace snapshot
    out2 = _drain(spark, t, ckpt)
    assert out2 == []  # NOTHING re-emits across the rewrite
    append_iceberg(_df(spark, 6, 9), t, format_version=2)
    out3 = _drain(spark, t, ckpt)
    assert sorted(r["k"] for r in out3) == [6, 7, 8]
    # a fresh consumer that starts mid-history still sees every row
    # exactly once (compaction contributes nothing; the appends do)
    ckpt2 = tempfile.mkdtemp(prefix="icefeed_cpc2_")
    fresh = _drain(spark, t, ckpt2)
    assert sorted(r["k"] for r in fresh) == list(range(9))


def test_guard_rejects_unlabeled_rewrites_and_mor_deletes(spark):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from postrack_spark.streaming.iceberg import delete_positions_iceberg

    # an UNLABELED rewrite (no 'replace' summary) must still raise:
    # simulate by compacting then patching the summary back to append
    import json as _json

    from postrack_spark.streaming.iceberg import compact_iceberg

    t = tempfile.mkdtemp(prefix="icefeed_g_")
    ckpt = tempfile.mkdtemp(prefix="icefeed_gc_")
    append_iceberg(_df(spark, 0, 4).repartition(2), t, format_version=2)
    sid = compact_iceberg(spark, t, target_files=1)
    md = os.path.join(t, "metadata")
    with open(os.path.join(md, "version-hint.text")) as f:
        v = int(f.read())
    mp = os.path.join(md, f"v{v}.metadata.json")
    with open(mp) as f:
        meta = _json.load(f)
    for s in meta["snapshots"]:
        if s["snapshot-id"] == sid:
            s["summary"]["operation"] = "append"
    with open(mp, "w") as f:
        _json.dump(meta, f)
    with pytest.raises(StreamingQueryException, match="append-only"):
        _drain(spark, t, ckpt)
    t2 = tempfile.mkdtemp(prefix="icefeed_g2_")
    ckpt2 = tempfile.mkdtemp(prefix="icefeed_gc2_")
    append_iceberg(_df(spark, 0, 4), t2, format_version=2)
    delete_positions_iceberg(spark, t2, "k = 1")
    with pytest.raises(StreamingQueryException, match="delete files"):
        _drain(spark, t2, ckpt2)


def test_schema_evolution_reads_null_for_old_files(spark):
    t = tempfile.mkdtemp(prefix="icefeed_e_")
    ckpt = tempfile.mkdtemp(prefix="icefeed_ec_")
    append_iceberg(_df(spark, 0, 3), t)
    append_iceberg(
        spark.range(3, 5).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            F.lit("web").alias("channel")),
        t, merge_schema=True)
    out = _drain(spark, t, ckpt)
    got = {r["k"]: r["channel"] for r in out}
    assert got[0] is None and got[3] == "web" and len(got) == 5


def test_expired_offset_snapshot_raises_not_duplicates(spark):
    """ADVICE r6: if expire_snapshots removes the checkpointed offset
    snapshot, the resumed feed has no diff base — it must RAISE, not
    re-emit every carried-forward file as freshly 'added'."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from postrack_spark.streaming.iceberg import expire_snapshots_iceberg

    t = tempfile.mkdtemp(prefix="icefeed_x_")
    ckpt = tempfile.mkdtemp(prefix="icefeed_xc_")
    append_iceberg(_df(spark, 0, 4), t)
    append_iceberg(_df(spark, 4, 6), t)
    out1 = _drain(spark, t, ckpt)
    assert sorted(r["k"] for r in out1) == list(range(6))
    append_iceberg(_df(spark, 6, 8), t)
    append_iceberg(_df(spark, 8, 9), t)
    # expire everything but the current head — includes the offset
    expire_snapshots_iceberg(t, retain_last=1)
    with pytest.raises(StreamingQueryException, match="expired"):
        _drain(spark, t, ckpt)
