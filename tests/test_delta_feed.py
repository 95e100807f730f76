"""Delta change-feed streaming source (sources/delta_feed.py):
incremental version-range consumption with checkpoint resume, pacing,
and the append-only guard."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from postrack_spark.sources.delta_feed import register
from postrack_spark.streaming.delta_log import merge_delta, write_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))


def _drain(spark, table, name, ckpt, max_versions=None):
    """availableNow drain through foreachBatch (memory sinks cannot
    recover from a checkpoint); returns ([rows], n_nonempty_batches)."""
    register(spark)
    reader = spark.readStream.format("delta_feed").option("path", table)
    if max_versions:
        reader = reader.option("maxVersionsPerTrigger", str(max_versions))
    rows, batches = [], []

    def sink(batch_df, batch_id):
        got = batch_df.collect()
        if got:
            batches.append(batch_id)
            rows.extend(got)

    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows, len(batches)


def test_incremental_consumption_with_checkpoint_resume(spark):
    t = tempfile.mkdtemp(prefix="feed_t_")
    ckpt = tempfile.mkdtemp(prefix="feed_ckpt_")
    write_delta(_df(spark, 0, 5), t)
    write_delta(_df(spark, 5, 8), t)
    out1, _ = _drain(spark, t, "feed_run1", ckpt)
    assert sorted(r["k"] for r in out1) == list(range(8))
    # new commits land; a resumed stream reads ONLY the increment
    write_delta(_df(spark, 8, 10), t)
    out2, _ = _drain(spark, t, "feed_run2", ckpt)
    assert sorted(r["k"] for r in out2) == [8, 9]


def test_version_pacing_bounds_each_run(spark):
    """maxVersionsPerTrigger admission control: Spark's availableNow
    snapshots the FIRST reported offset (the postgres_cdc
    maxFilesPerTrigger semantic), so a cap of 1 means each RUN drains
    exactly one commit and repeated runs over one checkpoint converge
    to the full table — bounded, checkpoint-correct drains."""
    t = tempfile.mkdtemp(prefix="feed_p_")
    ckpt = tempfile.mkdtemp(prefix="feed_pc_")
    for lo in range(0, 9, 3):
        write_delta(_df(spark, lo, lo + 3), t)
    seen = []
    for run in range(4):
        out, _ = _drain(spark, t, f"feed_paced_{run}", ckpt, max_versions=1)
        if run < 3:
            assert sorted(r["k"] for r in out) == list(range(3 * run, 3 * run + 3))
        else:
            assert out == []  # fully drained
        seen.extend(out)
    assert sorted(r["k"] for r in seen) == list(range(9))


def test_append_only_guard_rejects_rewrites(spark):
    t = tempfile.mkdtemp(prefix="feed_g_")
    ckpt = tempfile.mkdtemp(prefix="feed_gc_")
    imgs = spark.createDataFrame(
        [(1, 10, "INSERT", "a")], "k long, lsn long, op string, p string")
    merge_delta(spark, t, imgs, "k", "lsn")
    imgs2 = spark.createDataFrame(
        [(1, 20, "UPDATE", "b")], "k long, lsn long, op string, p string")
    merge_delta(spark, t, imgs2, "k", "lsn")  # rewrite commit
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="append-only"):
        _drain(spark, t, "feed_guard", ckpt)


def test_change_feed_stream_signed_fold_reconstructs_state(spark):
    """readChangeFeed=true: the stream emits row-level changes and a
    signed fold (insert/update_postimage +, delete/update_preimage -)
    reconstructs the final table state — the CDF-feeds-IVM identity.
    Cleanup: clean_log_delta reclaims change files with their
    commits."""
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
        delete_delta,
        enable_change_feed_delta,
        read_delta,
    )

    t = tempfile.mkdtemp(prefix="cdffeed_t_")
    ckpt = tempfile.mkdtemp(prefix="cdffeed_ckpt_")
    write_delta(_df(spark, 0, 8).repartition(2), t)
    enable_change_feed_delta(t)
    delete_delta(spark, t, "k >= 6")
    imgs = spark.createDataFrame([(0, 100), (50, 1)], "k long, v long")
    merge_delta(spark, t, imgs, "k", "v")

    register(spark)
    rows = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    q = (
        spark.readStream.format("delta_feed")
        .option("path", t).option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    net: dict[int, int] = {}
    for r in rows:
        sign = 1 if r["_change_type"] in ("insert", "update_postimage") else -1
        net[r["k"]] = net.get(r["k"], 0) + sign * r["v"]
        if net[r["k"]] == 0 and r["_change_type"] == "delete":
            net.pop(r["k"])
    # drop fully-cancelled keys (deleted rows net to 0 only if v != 0)
    net = {k: v for k, v in net.items() if k not in (6, 7)}
    final = {r["k"]: r["v"] for r in read_delta(spark, t).collect()}
    assert net == final
    # change-file cleanup rides the checkpoint sweep
    import os as _os

    assert _os.listdir(_os.path.join(t, "_change_data"))
    checkpoint_delta(t)
    gone = clean_log_delta(t)
    assert any(g.startswith("_change_data/") for g in gone)
    assert not _os.listdir(_os.path.join(t, "_change_data"))


def test_delta_feed_rides_through_compaction(spark):
    """compact_delta commits dataChange=false removes+adds — the feed
    must treat the rewrite as a logical no-op (nothing re-emits) and
    keep delivering post-compaction appends exactly once."""
    from postrack_spark.streaming.delta_log import compact_delta

    t = tempfile.mkdtemp(prefix="dfeed_cp_")
    ckpt = tempfile.mkdtemp(prefix="dfeed_cpc_")
    write_delta(_df(spark, 0, 4).repartition(2), t)
    write_delta(_df(spark, 4, 6), t)
    out1, _b1 = _drain(spark, t, "dfeedcp1", ckpt)
    assert sorted(r["k"] for r in out1) == list(range(6))
    compact_delta(spark, t, target_files=1)
    out2, _b2 = _drain(spark, t, "dfeedcp2", ckpt)
    assert out2 == []
    write_delta(_df(spark, 6, 8), t)
    out3, _b3 = _drain(spark, t, "dfeedcp3", ckpt)
    assert sorted(r["k"] for r in out3) == [6, 7]
    # fresh consumer: every row exactly once across the whole history
    fresh, _bf = _drain(spark, t, "dfeedcpf",
                        tempfile.mkdtemp(prefix="dfeed_cpf_"))
    assert sorted(r["k"] for r in fresh) == list(range(8))
