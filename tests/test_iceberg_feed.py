"""Iceberg incremental-append streaming source
(sources/iceberg_feed.py): snapshot-range consumption with checkpoint
resume, pacing, and the set-difference append-only guard — the
Iceberg twin of test_delta_feed.py."""

from __future__ import annotations

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


def test_guard_rejects_compaction_and_mor_deletes(spark):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from postrack_spark.streaming.iceberg import (
        compact_iceberg,
        delete_positions_iceberg,
    )

    t = tempfile.mkdtemp(prefix="icefeed_g_")
    ckpt = tempfile.mkdtemp(prefix="icefeed_gc_")
    append_iceberg(_df(spark, 0, 4).repartition(2), t, format_version=2)
    append_iceberg(_df(spark, 4, 6), t, format_version=2)
    compact_iceberg(spark, t, target_files=1)  # REPLACE snapshot
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
