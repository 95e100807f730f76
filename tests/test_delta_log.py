"""Delta transaction-log sink/reader (streaming/delta_log.py): snapshot
semantics, time travel, atomic overwrite, OPTIMIZE-shaped compaction,
vacuum retention, commit races, streaming idempotence, and the
crash-window property (data files written but never committed are
invisible and reclaimable) — the same fault matrix test_sink_faults.py
pins for the pointer sink, expressed in Delta's vocabulary."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from postrack_spark.streaming.delta_log import (
    DeltaCommitConflict,
    _log_path,
    compact_delta,
    foreach_batch_delta,
    last_txn_version,
    latest_version,
    read_delta,
    vacuum_delta,
    write_delta,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))


def test_append_accumulates_and_reads_back(spark):
    t = tempfile.mkdtemp(prefix="delta_t_")
    assert write_delta(_df(spark, 0, 5), t, mode="append") == 0
    assert write_delta(_df(spark, 5, 8), t, mode="append") == 1
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == list(range(8))
    # schema came from metaData, not parquet inference
    assert read_delta(spark, t).columns == ["k", "v"]


def test_overwrite_is_atomic_and_time_travel_works(spark):
    t = tempfile.mkdtemp(prefix="delta_o_")
    write_delta(_df(spark, 0, 5), t)
    write_delta(_df(spark, 100, 103), t, mode="overwrite")
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [100, 101, 102]
    # time travel to version 0: the pre-overwrite snapshot
    assert sorted(r["k"] for r in read_delta(spark, t, version=0).collect()) == [0, 1, 2, 3, 4]
    with pytest.raises(FileNotFoundError):
        read_delta(spark, t, version=99)


def test_crashed_writer_files_are_invisible_then_vacuumed(spark):
    t = tempfile.mkdtemp(prefix="delta_c_")
    write_delta(_df(spark, 0, 4), t)
    before = sorted(r["k"] for r in read_delta(spark, t).collect())
    # simulate a writer that died between data write and log commit:
    # drop an orphan parquet into the table root
    _df(spark, 50, 60).coalesce(1).write.mode("overwrite").parquet(t + "_x")
    part = next(f for f in os.listdir(t + "_x") if f.endswith(".parquet"))
    os.replace(os.path.join(t + "_x", part),
               os.path.join(t, "part-orphan.parquet"))
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == before
    deleted = vacuum_delta(t, retain_versions=2)
    assert "part-orphan.parquet" in deleted
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == before


def test_commit_race_rebases_to_next_version(spark):
    t = tempfile.mkdtemp(prefix="delta_r_")
    write_delta(_df(spark, 0, 3), t)
    # a rival writer takes version 1 before our append lands
    os.makedirs(os.path.dirname(_log_path(t, 1)), exist_ok=True)
    with open(_log_path(t, 1), "w") as f:
        f.write(json.dumps({"add": {
            "path": "missing-but-then-removed.parquet",
            "partitionValues": {}, "size": 0, "modificationTime": 0,
            "dataChange": True}}) + "\n")
        f.write(json.dumps({"remove": {
            "path": "missing-but-then-removed.parquet",
            "deletionTimestamp": 0, "dataChange": True}}) + "\n")
    v = write_delta(_df(spark, 3, 6), t, mode="append")
    assert v == 2  # rebased past the rival's commit
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(range(6))


def test_compaction_preserves_rows_and_vacuum_reclaims(spark):
    t = tempfile.mkdtemp(prefix="delta_z_")
    for lo in range(0, 20, 5):
        write_delta(_df(spark, lo, lo + 5), t)
    before = sorted(r["k"] for r in read_delta(spark, t).collect())
    files_before = sum(1 for f in os.listdir(t) if f.endswith(".parquet"))
    v = compact_delta(spark, t, target_files=1)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == before
    # pre-compaction snapshot still resolves (time travel)
    assert sorted(
        r["k"] for r in read_delta(spark, t, version=v - 1).collect()
    ) == before
    vacuum_delta(t, retain_versions=1)
    files_after = sum(1 for f in os.listdir(t) if f.endswith(".parquet"))
    assert files_after < files_before
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == before


def test_streaming_batches_are_idempotent(spark):
    t = tempfile.mkdtemp(prefix="delta_s_")
    hook = foreach_batch_delta(t, mode="append")
    hook(_df(spark, 0, 5), 0)
    hook(_df(spark, 5, 8), 1)
    hook(_df(spark, 5, 8), 1)  # at-least-once replay: must be a no-op
    hook(_df(spark, 0, 5), 0)  # stale replay after progress: no-op too
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == list(range(8))
    assert last_txn_version(t) == 1


def test_streaming_end_to_end_through_real_foreachbatch(spark, sf_dir):
    from postrack_spark.streaming.runner import events_stream

    t = tempfile.mkdtemp(prefix="delta_e2e_")
    ckpt = tempfile.mkdtemp(prefix="delta_ckpt_")
    ev = events_stream(spark, sf_dir).select("user_id", "event_type")
    q = (
        ev.writeStream.foreachBatch(foreach_batch_delta(t, mode="append"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = read_delta(spark, t).count()
    from postrack_spark.session import load_tables

    assert got == load_tables(spark, sf_dir)["events"].count()
    assert latest_version(t) is not None


def test_protocol_feature_gate(spark):
    t = tempfile.mkdtemp(prefix="delta_p_")
    write_delta(_df(spark, 0, 2), t)
    # a KNOWN reader feature (deletionVectors is implemented here)
    # passes the features gate...
    with open(_log_path(t, 1), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3,
                                         "readerFeatures": ["deletionVectors"]}}) + "\n")
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [0, 1]
    # ...a feature we don't implement must refuse (the spec's rule)
    with open(_log_path(t, 1), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3,
                                         "readerFeatures": ["typeWidening"]}}) + "\n")
    with pytest.raises(ValueError, match="reader features"):
        read_delta(spark, t)


def _images(spark, rows):
    return spark.createDataFrame(
        rows, "k long, lsn long, op string, payload string")


def test_merge_upserts_deletes_and_keeps_tombstones(spark):
    from postrack_spark.streaming.delta_log import merge_delta

    t = tempfile.mkdtemp(prefix="delta_m_")
    merge_delta(spark, t, _images(spark, [
        (1, 10, "INSERT", "a1"), (2, 11, "INSERT", "b1"),
        (3, 12, "INSERT", "c1")]), "k", "lsn")
    merge_delta(spark, t, _images(spark, [
        (2, 20, "UPDATE", "b2"),        # newer: wins
        (3, 5, "UPDATE", "c0"),         # OLDER than existing: must lose
        (4, 21, "INSERT", "d1"),
        (1, 22, "DELETE", None)]), "k", "lsn")
    rows = {r["k"]: (r["op"], r["payload"])
            for r in read_delta(spark, t).collect()}
    # tombstone retained as a row; live view filters it
    assert rows[1][0] == "DELETE"
    assert rows[2] == ("UPDATE", "b2")
    assert rows[3] == ("INSERT", "c1")  # stale update lost on lsn
    assert rows[4] == ("INSERT", "d1")


def test_merge_rewrites_only_affected_files(spark):
    from postrack_spark.streaming.delta_log import _snapshot, merge_delta

    t = tempfile.mkdtemp(prefix="delta_cow_")
    # two appends -> two disjoint-key files
    write_delta(_images(spark, [(k, 1, "INSERT", f"v{k}") for k in range(5)])
                .coalesce(1), t)
    write_delta(_images(spark, [(k, 1, "INSERT", f"v{k}") for k in range(5, 10)])
                .coalesce(1), t)
    before_paths, _, _ = _snapshot(t, None)
    assert len(before_paths) == 2
    merge_delta(spark, t, _images(spark, [(1, 2, "UPDATE", "new1")]), "k", "lsn")
    after_paths, _, _ = _snapshot(t, None)
    untouched = set(before_paths) & set(after_paths)
    assert len(untouched) == 1  # the 5-9 file survived the merge untouched
    rows = {r["k"]: r["payload"] for r in read_delta(spark, t).collect()}
    assert rows[1] == "new1" and rows[7] == "v7" and len(rows) == 10


def test_merge_batches_commute_on_order_column(spark):
    from postrack_spark.streaming.delta_log import merge_delta

    b1 = [(1, 10, "INSERT", "a1"), (2, 30, "UPDATE", "b-late")]
    b2 = [(1, 20, "UPDATE", "a2"), (2, 15, "INSERT", "b-early")]

    def run(order):
        t = tempfile.mkdtemp(prefix="delta_comm_")
        for batch in order:
            merge_delta(spark, t, _images(spark, batch), "k", "lsn")
        return sorted(
            (r["k"], r["lsn"], r["op"], r["payload"])
            for r in read_delta(spark, t).collect())

    assert run([b1, b2]) == run([b2, b1])


def test_foreach_batch_merge_is_idempotent(spark):
    from postrack_spark.streaming.delta_log import foreach_batch_delta_merge

    t = tempfile.mkdtemp(prefix="delta_fbm_")
    hook = foreach_batch_delta_merge(t, "k", "lsn")
    hook(_images(spark, [(1, 10, "INSERT", "a1")]), 0)
    hook(_images(spark, [(1, 20, "UPDATE", "a2")]), 1)
    hook(_images(spark, [(1, 20, "UPDATE", "a2")]), 1)  # replay: no-op
    hook(_images(spark, [(1, 10, "INSERT", "a1")]), 0)  # stale replay
    rows = read_delta(spark, t).collect()
    assert len(rows) == 1 and rows[0]["payload"] == "a2"


def test_stats_data_skipping_prunes_and_stays_correct(spark):
    from postrack_spark.streaming.delta_log import pruned_read_delta

    t = tempfile.mkdtemp(prefix="delta_skip_")
    # range-partitioned appends -> files with tight disjoint k extents
    big = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    for lo in range(0, 1000, 250):
        write_delta(
            big.filter((F.col("k") >= lo) & (F.col("k") < lo + 250)).coalesce(1),
            t)
    df, read, total = pruned_read_delta(spark, t, "k", 100, 180)
    assert total == 4 and read == 1  # three files provably disjoint
    got = sorted(r["k"] for r in
                 df.filter(F.col("k").between(100, 180)).collect())
    assert got == list(range(100, 181))
    # pruning never loses rows: unioned full predicate result matches
    df2, read2, _ = pruned_read_delta(spark, t, "k", 240, 260)  # spans 2 files
    assert read2 == 2
    assert df2.filter(F.col("k").between(240, 260)).count() == 21
    # files without stats are read conservatively: strip stats, re-check
    import json as _json
    import os as _os

    from postrack_spark.streaming.delta_log import _list_versions, _log_path

    for v in _list_versions(t):
        path = _log_path(t, v)
        lines = []
        with open(path) as f:
            for ln in f:
                if not ln.strip():
                    continue
                a = _json.loads(ln)
                if "add" in a:
                    a["add"].pop("stats", None)
                lines.append(_json.dumps(a))
        _os.chmod(path, 0o644)
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
    _, read3, total3 = pruned_read_delta(spark, t, "k", 100, 180)
    assert (read3, total3) == (4, 4)  # no stats -> no pruning, no loss


def test_incomparable_stats_degrade_to_conservative_read(spark):
    """A column whose footer stats serialized through the default=str
    fallback (dates/timestamps) must degrade to a conservative read
    when pruned against numeric bounds — never a TypeError."""
    import json as _json

    from postrack_spark.streaming.delta_log import (
        _list_versions,
        _log_path,
        pruned_read_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_badstats_")
    write_delta(_df(spark, 0, 10).coalesce(1), t)
    # corrupt the stats: stringify k's min/max as a str-fallback would
    for v in _list_versions(t):
        path = _log_path(t, v)
        lines = []
        with open(path) as f:
            for ln in f:
                if not ln.strip():
                    continue
                a = _json.loads(ln)
                if "add" in a and "stats" in a["add"]:
                    s = _json.loads(a["add"]["stats"])
                    s["minValues"]["k"] = str(s["minValues"]["k"])
                    s["maxValues"]["k"] = str(s["maxValues"]["k"])
                    a["add"]["stats"] = _json.dumps(s)
                lines.append(_json.dumps(a))
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
    df, read, total = pruned_read_delta(spark, t, "k", 2, 4)
    assert (read, total) == (1, 1)  # conservative: file still read
    assert df.filter(F.col("k").between(2, 4)).count() == 3


def test_merge_crash_between_commit_and_txn_marker_converges(spark):
    """foreach_batch_delta_merge stamps its txn marker in a follow-up
    commit; a crash between the two leaves the batch unmarked and a
    replay RE-MERGES it. Re-merging identical images converges by
    value (per-key max_by over the same multiset), so the crash window
    is at-least-once with an idempotent effect — pin it."""
    from postrack_spark.streaming.delta_log import (
        _append_txn,
        last_txn_version,
        merge_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_txncrash_")
    imgs = _images(spark, [(1, 10, "INSERT", "a1"), (2, 11, "INSERT", "b1")])
    # simulate the crash: merge committed, txn marker never written
    merge_delta(spark, t, imgs, "k", "lsn")
    assert last_txn_version(t) is None  # unmarked -> replay will re-run
    # replay path: same batch re-merged, then the marker lands
    v = merge_delta(spark, t, imgs, "k", "lsn")
    _append_txn(t, v, 0)
    rows = {r["k"]: (r["lsn"], r["payload"])
            for r in read_delta(spark, t).collect()}
    assert rows == {1: (10, "a1"), 2: (11, "b1")}  # converged, no dupes
    assert last_txn_version(t) == 0


def test_delete_where_rewrites_only_affected_files(spark):
    from postrack_spark.streaming.delta_log import _snapshot, delete_delta

    t = tempfile.mkdtemp(prefix="delta_del_")
    write_delta(_df(spark, 0, 5).coalesce(1), t)
    write_delta(_df(spark, 5, 10).coalesce(1), t)
    before_paths, _, _ = _snapshot(t, None)
    assert len(before_paths) == 2
    version, rewritten, total = delete_delta(spark, t, "k IN (1, 3)")
    assert (rewritten, total) == (1, 2)
    after_paths, _, _ = _snapshot(t, None)
    assert len(set(before_paths) & set(after_paths)) == 1  # 5-9 untouched
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [
        0, 2, 4, 5, 6, 7, 8, 9]
    # time travel to the pre-delete version still sees the deleted keys
    assert sorted(
        r["k"] for r in read_delta(spark, t, version=version - 1).collect()
    ) == list(range(10))


def test_delete_where_null_predicate_rows_survive(spark):
    from postrack_spark.streaming.delta_log import delete_delta

    t = tempfile.mkdtemp(prefix="delta_deln_")
    df = spark.createDataFrame(
        [(0, 10), (1, None), (2, 30)], "k long, v long")
    write_delta(df.coalesce(1), t)
    delete_delta(spark, t, "v > 15")  # NULL > 15 is NULL, not TRUE
    got = sorted((r["k"], r["v"]) for r in read_delta(spark, t).collect())
    assert got == [(0, 10), (1, None)]


def test_delete_where_no_match_is_a_no_op(spark):
    from postrack_spark.streaming.delta_log import (
        _snapshot,
        delete_delta,
        latest_version,
    )

    t = tempfile.mkdtemp(prefix="delta_del0_")
    write_delta(_df(spark, 0, 5).coalesce(1), t)
    v = latest_version(t)
    version, rewritten, total = delete_delta(spark, t, "k > 100")
    assert (version, rewritten, total) == (v, 0, 1)
    assert latest_version(t) == v  # no commit happened
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [0, 1, 2, 3, 4]


def test_delete_where_can_empty_a_file(spark):
    from postrack_spark.streaming.delta_log import delete_delta

    t = tempfile.mkdtemp(prefix="delta_delall_")
    write_delta(_df(spark, 0, 5).coalesce(1), t)
    write_delta(_df(spark, 5, 10).coalesce(1), t)
    delete_delta(spark, t, "k < 5")
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [
        5, 6, 7, 8, 9]


def test_delete_keys_and_foreach_batch_idempotence(spark):
    from postrack_spark.streaming.delta_log import (
        delete_keys_delta,
        foreach_batch_delta_delete,
        latest_version,
    )

    t = tempfile.mkdtemp(prefix="delta_delk_")
    write_delta(_df(spark, 0, 5).coalesce(1), t)
    write_delta(_df(spark, 5, 10).coalesce(1), t)
    keys = spark.createDataFrame([(2,), (7,), (999,)], "k long")
    version, rewritten, total = delete_keys_delta(spark, t, keys, "k")
    assert (rewritten, total) == (2, 2)  # both files held a key
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [
        0, 1, 3, 4, 5, 6, 8, 9]
    # foreachBatch path: batch applies once, replay is a no-op
    hook = foreach_batch_delta_delete(t, "k")
    hook(spark.createDataFrame([(4,)], "k long"), 0)
    after_first = latest_version(t)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [
        0, 1, 3, 5, 6, 8, 9]
    hook(spark.createDataFrame([(5,)], "k long"), 0)  # replayed batch id
    assert latest_version(t) == after_first  # nothing committed
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [
        0, 1, 3, 5, 6, 8, 9]


def test_checkpoint_replay_matches_json_replay(spark):
    from postrack_spark.streaming.delta_log import checkpoint_delta

    table = tempfile.mkdtemp(prefix="delta_cp_")
    write_delta(_df(spark, 0, 50), table)
    write_delta(_df(spark, 50, 80), table)
    before = sorted(r["k"] for r in read_delta(spark, table).collect())
    cp = checkpoint_delta(table)
    assert cp == 1
    after = sorted(r["k"] for r in read_delta(spark, table).collect())
    assert after == before == list(range(80))


def test_checkpoint_is_load_bearing_after_log_cleanup(spark):
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
        latest_version,
    )

    table = tempfile.mkdtemp(prefix="delta_cp_clean_")
    write_delta(_df(spark, 0, 40), table)
    write_delta(_df(spark, 40, 60), table)
    checkpoint_delta(table)
    deleted = clean_log_delta(table)
    assert sorted(deleted) == ["00000000000000000000.json",
                               "00000000000000000001.json"]
    # snapshot resolution must now come from the checkpoint alone
    assert latest_version(table) == 1
    assert sorted(r["k"] for r in read_delta(spark, table).collect()) == list(
        range(60))
    # appends continue the version chain past the checkpoint
    v = write_delta(_df(spark, 60, 70), table)
    assert v == 2
    assert read_delta(spark, table).count() == 70
    # time travel BELOW the cleaned checkpoint is the protocol's honest no
    with pytest.raises(FileNotFoundError):
        read_delta(spark, table, version=0)
    # ...but the checkpointed version itself still resolves
    assert read_delta(spark, table, version=1).count() == 60


def test_checkpoint_carries_txn_actions(spark):
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
    )

    table = tempfile.mkdtemp(prefix="delta_cp_txn_")
    hook = foreach_batch_delta(table)
    hook(_df(spark, 0, 10), 0)
    hook(_df(spark, 10, 20), 1)
    assert last_txn_version(table) == 1
    checkpoint_delta(table)
    clean_log_delta(table)
    # idempotence metadata must survive the cleanup via the checkpoint
    assert last_txn_version(table) == 1
    hook(_df(spark, 10, 20), 1)  # replay: must no-op
    assert read_delta(spark, table).count() == 20


def test_checkpoint_respects_deletes_and_vacuum(spark):
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
        delete_delta,
    )

    table = tempfile.mkdtemp(prefix="delta_cp_del_")
    write_delta(
        _df(spark, 0, 100).repartitionByRange(4, "k"), table)
    delete_delta(spark, table, "k < 25")
    checkpoint_delta(table)
    clean_log_delta(table)
    assert sorted(r["k"] for r in read_delta(spark, table).collect()) == list(
        range(25, 100))
    # vacuum keyed off the checkpoint snapshot reclaims the pre-delete file
    deleted = vacuum_delta(table, retain_versions=1)
    assert deleted, "pre-delete data files should be reclaimed"
    assert sorted(r["k"] for r in read_delta(spark, table).collect()) == list(
        range(25, 100))


def test_checkpoint_at_historic_version(spark):
    from postrack_spark.streaming.delta_log import (
        _read_last_checkpoint,
        checkpoint_delta,
    )

    table = tempfile.mkdtemp(prefix="delta_cp_hist_")
    write_delta(_df(spark, 0, 10), table)
    write_delta(_df(spark, 10, 30), table)
    assert checkpoint_delta(table, version=0) == 0
    assert _read_last_checkpoint(table) == 0
    # newer JSON commits replay ON TOP of the checkpoint seed
    assert read_delta(spark, table).count() == 30
    assert read_delta(spark, table, version=0).count() == 10


def test_concurrent_delete_during_compaction_is_not_resurrected(spark, monkeypatch):
    """Snapshot-pinned OCC: a DELETE that commits between a
    compaction's read and its commit must NOT be undone by the
    compaction (the stale-actions retry of the pre-fix code re-added
    the deleted rows). The injection lands a real delete right after
    the compaction stages its rewrite files — the conflict forces a
    full recompute from the post-delete snapshot."""
    from postrack_spark.streaming import delta_log
    from postrack_spark.streaming.delta_log import compact_delta, delete_delta

    table = tempfile.mkdtemp(prefix="delta_occ_")
    write_delta(_df(spark, 0, 100).repartitionByRange(4, "k"), table)

    orig = delta_log._write_data_files
    fired = {"done": False}

    def inject(df, tbl, **kw):
        adds = orig(df, tbl, **kw)
        if not fired["done"]:
            fired["done"] = True
            delete_delta(spark, table, "k < 25")  # concurrent writer wins
        return adds

    monkeypatch.setattr(delta_log, "_write_data_files", inject)
    v = compact_delta(spark, table, target_files=2)
    assert fired["done"]
    got = sorted(r["k"] for r in read_delta(spark, table).collect())
    assert got == list(range(25, 100)), "compaction resurrected deleted rows"
    # the delete's version precedes the recomputed compaction's
    assert v == latest_version(table)
    assert read_delta(spark, table, version=v - 1).count() == 75  # post-delete


def test_concurrent_append_during_delete_survives(spark, monkeypatch):
    """Rows appended concurrently with a DELETE must survive it — the
    recompute path re-reads the snapshot that includes them (and
    re-applies the predicate to the whole new live set)."""
    from postrack_spark.streaming import delta_log
    from postrack_spark.streaming.delta_log import delete_delta

    table = tempfile.mkdtemp(prefix="delta_occ2_")
    write_delta(_df(spark, 0, 50).repartitionByRange(4, "k"), table)

    orig = delta_log._write_data_files
    fired = {"done": False}

    def inject(df, tbl, **kw):
        adds = orig(df, tbl, **kw)
        if not fired["done"]:
            fired["done"] = True
            write_delta(_df(spark, 100, 120), table)  # concurrent append
        return adds

    monkeypatch.setattr(delta_log, "_write_data_files", inject)
    delete_delta(spark, table, "k < 10")
    got = sorted(r["k"] for r in read_delta(spark, table).collect())
    assert got == list(range(10, 50)) + list(range(100, 120))


# ------------------------------------------------- deletion vectors


def _dv_table(spark, n=40, files=4):
    t = tempfile.mkdtemp(prefix="delta_dv_")
    write_delta(_df(spark, 0, n).repartition(files), t)
    return t


def test_dv_delete_reads_time_travels_and_stacks(spark):
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = _dv_table(spark)
    data_before = sorted(
        (f, os.path.getsize(os.path.join(t, f)))
        for f in os.listdir(t) if f.endswith(".parquet"))
    v1, n1, nf1 = delete_delta_dv(spark, t, "k % 5 = 0")
    assert n1 == 8 and nf1 >= 1
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == [k for k in range(40) if k % 5 != 0]
    # merge-on-read: data files byte-identical
    data_after = sorted(
        (f, os.path.getsize(os.path.join(t, f)))
        for f in os.listdir(t) if f.endswith(".parquet"))
    assert data_after == data_before
    # time travel to the pre-delete version sees everything
    assert read_delta(spark, t, version=v1 - 1).count() == 40
    # stacked delete on the SAME files merges bitmaps; re-matching an
    # already-deleted row (k=0 matches both predicates) adds nothing
    _v2, n2, _nf2 = delete_delta_dv(spark, t, "k % 10 = 0 OR k = 7")
    assert n2 == 1  # only k=7 is new
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [
        k for k in range(40) if k % 5 != 0 and k != 7]
    # NULL predicate deletes nothing
    _v3, n3, _ = delete_delta_dv(spark, t, "NULL")
    assert n3 == 0


def test_dv_distributed_write_many_files(spark):
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = _dv_table(spark, n=400, files=8)
    _v, n, nf = delete_delta_dv(spark, t, "k % 3 = 0", inline_max_bytes=0)
    assert n == 134 and nf == 8
    dv_files = [f for f in os.listdir(t)
                if f.startswith("dv-") and f.endswith(".bin")]
    assert len(dv_files) > 1, "distributed writer should emit >1 DV file"
    assert read_delta(spark, t).count() == 400 - 134


def test_dv_cow_guard_and_compaction_retires(spark):
    from postrack_spark.streaming.delta_log import (
        _snapshot_actions,
        delete_delta,
    )
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = _dv_table(spark)
    delete_delta_dv(spark, t, "k < 10")
    # COW rewrite of a DV-carrying file would resurrect deleted rows
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        delete_delta(spark, t, "k = 20")
    v = compact_delta(spark, t)
    acts, _, _ = _snapshot_actions(t, v)
    assert not any(a.get("deletionVector") for _p, a in acts)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(
        range(10, 40))
    # after compaction COW works again
    delete_delta(spark, t, "k = 20")
    assert read_delta(spark, t).count() == 29


def test_dv_vacuum_retains_referenced_dv_files(spark):
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = _dv_table(spark)
    delete_delta_dv(spark, t, "k < 4", inline_max_bytes=0)
    dvs = {f for f in os.listdir(t) if f.startswith("dv-")}
    assert dvs
    vacuum_delta(t, retain_versions=2)  # DV version is current: retained
    assert dvs <= set(os.listdir(t))
    assert read_delta(spark, t).count() == 36
    # compaction retires the DV; a 1-version vacuum then reclaims it
    compact_delta(spark, t)
    vacuum_delta(t, retain_versions=1)
    assert not [f for f in os.listdir(t) if f.startswith("dv-")]
    assert read_delta(spark, t).count() == 36


def test_dv_survives_checkpoint_and_log_cleanup(spark):
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
    )
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = _dv_table(spark)
    delete_delta_dv(spark, t, "k >= 30")
    cp = checkpoint_delta(t)
    clean_log_delta(t)
    # snapshot now seeds from the checkpoint: the descriptor must have
    # round-tripped through the parquet add struct
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == list(range(30))
    assert cp == latest_version(t)


def test_dv_concurrent_commit_forces_recompute(spark, monkeypatch):
    from postrack_spark.streaming import delta_log, deletion_vectors
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = _dv_table(spark)
    orig = delta_log.commit_delta
    fired = {"done": False}

    def inject(table_, version, actions):
        if not fired["done"]:
            fired["done"] = True
            write_delta(_df(spark, 100, 105), t)  # concurrent append wins
        return orig(table_, version, actions)

    monkeypatch.setattr(delta_log, "commit_delta", inject)
    monkeypatch.setattr(deletion_vectors, "commit_delta", inject,
                        raising=False)
    delete_delta_dv(spark, t, "k % 2 = 0")
    assert fired["done"]
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    want = [k for k in range(40) if k % 2] + [k for k in range(100, 105)
                                              if k % 2]
    assert got == want


def test_dv_pruned_read_applies_dvs(spark):
    from postrack_spark.streaming.delta_log import pruned_read_delta
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = tempfile.mkdtemp(prefix="delta_dv_prune_")
    write_delta(
        _df(spark, 0, 100).repartitionByRange(4, "k"), t)
    delete_delta_dv(spark, t, "k % 10 = 0")
    df, nread, ntotal = pruned_read_delta(spark, t, "k", 0, 49)
    got = sorted(r["k"] for r in df.filter("k BETWEEN 0 AND 49").collect())
    assert got == [k for k in range(50) if k % 10 != 0]
    assert nread < ntotal  # pruning still prunes


def test_dv_uniform_sync_refuses(spark):
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv
    from postrack_spark.streaming.iceberg import sync_iceberg_from_delta

    t = tempfile.mkdtemp(prefix="delta_dv_sync_")
    write_delta(_df(spark, 0, 20).repartition(2), t)
    delete_delta_dv(spark, t, "k < 5")
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        sync_iceberg_from_delta(spark, t)
    compact_delta(spark, t)
    sid = sync_iceberg_from_delta(spark, t)  # clean after compaction
    from postrack_spark.streaming.iceberg import read_iceberg

    assert read_iceberg(spark, t, snapshot_id=sid).count() == 15


def test_dv_inline_storage_small_deletes(spark):
    """Tiny forget-sets inline into the descriptor (storageType 'i',
    z85): no dv-*.bin file at all, reads/stacking/checkpoints behave
    identically, and an inline DV grows into FILE storage when a
    later delete pushes the merged payload past the threshold."""
    from postrack_spark.streaming.delta_log import (
        _snapshot_actions,
        checkpoint_delta,
        clean_log_delta,
    )
    from postrack_spark.streaming.deletion_vectors import (
        delete_delta_dv,
        read_dv,
        z85_decode,
        z85_encode,
    )

    # z85 roundtrips incl. non-multiple-of-4 lengths
    for blob in (b"", b"a", b"ab", b"abc", b"abcd", bytes(range(100))):
        assert z85_decode(z85_encode(blob))[: len(blob)] == blob

    t = _dv_table(spark)
    delete_delta_dv(spark, t, "k IN (3, 17)")
    assert not [f for f in os.listdir(t) if f.startswith("dv-")]
    acts, _, _ = _snapshot_actions(t, None)
    descs = [a["deletionVector"] for _p, a in acts
             if a.get("deletionVector")]
    assert descs and all(d["storageType"] == "i" for d in descs)
    for d in descs:
        assert read_dv(t, d).cardinality() == d["cardinality"]
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == [k for k in range(40) if k not in (3, 17)]
    # stacked delete merges INTO the inline bitmap
    delete_delta_dv(spark, t, "k = 4")
    assert read_delta(spark, t).count() == 37
    # inline descriptors survive checkpoint + log cleanup
    checkpoint_delta(t)
    clean_log_delta(t)
    assert read_delta(spark, t).count() == 37
    # a big delete on the same files graduates to file storage
    delete_delta_dv(spark, t, "k >= 20", inline_max_bytes=8)
    assert [f for f in os.listdir(t) if f.startswith("dv-")]
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [
        k for k in range(20) if k not in (3, 4, 17)]


def test_dv_read_plan_shape(spark):
    """The DV read path must stay Arrow-batched: MapInPandas applies
    the bitmap filter, zero row-at-a-time Python, and a DV-FREE
    snapshot keeps the plain scan (no Python boundary at all)."""
    from postrack_spark.plans import plan_features
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = _dv_table(spark)
    clean = read_delta(spark, t)
    f0 = plan_features(clean)
    assert f0["row_python_evals"] == 0
    assert "MapInPandas" not in clean._jdf.queryExecution().executedPlan().toString()
    delete_delta_dv(spark, t, "k < 5")
    dv = read_delta(spark, t)
    plan = dv._jdf.queryExecution().executedPlan().toString()
    f1 = plan_features(dv)
    assert f1["row_python_evals"] == 0
    assert "MapInPandas" in plan
    assert dv.count() == 35


def test_restore_rolls_forward_across_cow_delete(spark):
    """RESTORE makes the current state equal an old snapshot via a NEW
    commit: the bad versions stay time-travelable (append-only log),
    and a subsequent restore can even undo the restore."""
    from postrack_spark.streaming.delta_log import restore_delta

    t = tempfile.mkdtemp(prefix="delta_rst_")
    write_delta(_df(spark, 0, 6).repartition(3), t)           # v0
    from postrack_spark.streaming.delta_log import delete_delta

    v_del, _, _ = delete_delta(spark, t, "k >= 3")            # v1 (COW)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [0, 1, 2]
    v_rst = restore_delta(t, 0)
    assert v_rst == v_del + 1  # roll-forward, not rewind
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(range(6))
    # the deleted state is still in history
    assert sorted(r["k"] for r in read_delta(spark, t, version=v_del).collect()) == [0, 1, 2]
    # restore the restore: back to the post-delete state
    restore_delta(t, v_del)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [0, 1, 2]


def test_restore_revives_and_reapplies_deletion_vectors(spark):
    """A restore across a DV delete must flip the VIEW both ways
    without touching parquet: backward re-adds the file without its
    DV (rows return); forward re-adds the target's DV-carrying action
    (rows hide again)."""
    from postrack_spark.streaming.delta_log import restore_delta
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = tempfile.mkdtemp(prefix="delta_rstdv_")
    write_delta(_df(spark, 0, 8).repartition(2), t)           # v0
    v_dv, n, _ = delete_delta_dv(spark, t, "k % 2 = 1")       # v1 (MOR)
    assert n == 4
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [0, 2, 4, 6]
    restore_delta(t, 0)                                       # v2: DVs off
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(range(8))
    restore_delta(t, v_dv)                                    # v3: DVs back
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [0, 2, 4, 6]


def test_restore_past_vacuum_horizon_raises_before_commit(spark):
    """Restoring to a snapshot whose files were vacuumed must raise
    up front — never commit a snapshot with holes."""
    from postrack_spark.streaming.delta_log import restore_delta

    t = tempfile.mkdtemp(prefix="delta_rstv_")
    write_delta(_df(spark, 0, 4), t)                          # v0
    write_delta(_df(spark, 0, 9), t, mode="overwrite")        # v1
    write_delta(_df(spark, 9, 10), t)                         # v2
    gone = vacuum_delta(t, retain_versions=2)                 # drops v0's file
    assert gone
    v_before = latest_version(t)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        restore_delta(t, 0)
    assert latest_version(t) == v_before  # nothing committed
    # restoring within the retained window still works
    restore_delta(t, 1)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(range(9))


def test_restore_to_current_state_is_a_noop(spark):
    from postrack_spark.streaming.delta_log import restore_delta

    t = tempfile.mkdtemp(prefix="delta_rstn_")
    write_delta(_df(spark, 0, 3), t)
    v = write_delta(_df(spark, 3, 5), t)
    assert restore_delta(t, v) == v
    assert latest_version(t) == v  # no empty commit


def test_shallow_clone_zero_copy_and_reads_identically(spark):
    from postrack_spark.streaming.delta_log import clone_delta

    src = tempfile.mkdtemp(prefix="delta_cl_src_")
    write_delta(_df(spark, 0, 10).repartition(3), src)
    dst = tempfile.mkdtemp(prefix="delta_cl_dst_")
    assert clone_delta(src, dst) == 0
    got = sorted(r["k"] for r in read_delta(spark, dst).collect())
    assert got == list(range(10))
    # ZERO data bytes copied: the clone dir holds only the log
    assert not [f for f in os.listdir(dst) if f.endswith(".parquet")]
    with pytest.raises(FileExistsError):
        clone_delta(src, dst)


def test_shallow_clone_evolves_independently(spark):
    """COW ops on the clone must remove-by-ACTION-KEY (absolute source
    paths) and land rewrites in the CLONE's directory; the source
    never changes. This pins the _action_keys_for rule — a
    relpath-based remove would emit '../…', never pop the live entry,
    and the deleted rows would resurrect."""
    from postrack_spark.streaming.delta_log import (
        clone_delta,
        delete_delta,
        merge_delta,
    )

    src = tempfile.mkdtemp(prefix="delta_cli_src_")
    write_delta(_df(spark, 0, 8).repartition(2), src)
    dst = tempfile.mkdtemp(prefix="delta_cli_dst_")
    clone_delta(src, dst)
    src_files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    # COW delete on the clone
    delete_delta(spark, dst, "k >= 6")
    assert sorted(r["k"] for r in read_delta(spark, dst).collect()) == list(range(6))
    # merge on the clone (absolute-key removes again)
    images = spark.createDataFrame([(0, 100), (99, 1)], "k long, v long")
    merge_delta(spark, dst, images, "k", "v")
    got = {(r["k"], r["v"]) for r in read_delta(spark, dst).collect()}
    assert (0, 100) in got and (99, 1) in got and (0, 0) not in got
    # source: same files, same rows
    assert sorted(f for f in os.listdir(src) if f.endswith(".parquet")) == src_files
    assert sorted(r["k"] for r in read_delta(spark, src).collect()) == list(range(8))
    # and writes to the source don't reach the clone's pinned snapshot
    write_delta(_df(spark, 50, 53), src)
    assert not any(50 <= r["k"] <= 52
                   for r in read_delta(spark, dst).collect())


def test_shallow_clone_carries_deletion_vectors(spark):
    from postrack_spark.streaming.delta_log import clone_delta
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    src = tempfile.mkdtemp(prefix="delta_cldv_src_")
    write_delta(_df(spark, 0, 10).repartition(2), src)
    delete_delta_dv(spark, src, "k % 2 = 0")
    dst = tempfile.mkdtemp(prefix="delta_cldv_dst_")
    clone_delta(src, dst)
    got = sorted(r["k"] for r in read_delta(spark, dst).collect())
    assert got == [1, 3, 5, 7, 9]
    assert not [f for f in os.listdir(dst) if f.endswith(".parquet")]


def test_shallow_clone_dv_delete_on_clone_only(spark):
    """MOR delete ON the clone: the DV bitmap keys the SOURCE file by
    its absolute action key, the dv-*.bin lands in the CLONE dir, and
    the source table keeps every row."""
    from postrack_spark.streaming.delta_log import clone_delta
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    src = tempfile.mkdtemp(prefix="delta_cldv2_src_")
    write_delta(_df(spark, 0, 10).repartition(2), src)
    dst = tempfile.mkdtemp(prefix="delta_cldv2_dst_")
    clone_delta(src, dst)
    _v, n, _nf = delete_delta_dv(spark, dst, "k < 4")
    assert n == 4
    assert sorted(r["k"] for r in read_delta(spark, dst).collect()) == [4, 5, 6, 7, 8, 9]
    assert sorted(r["k"] for r in read_delta(spark, src).collect()) == list(range(10))
    # any file-stored DV lives in the clone, never the source
    assert not [f for f in os.listdir(src) if f.startswith("dv-")]


def test_schema_enforcement_rejects_drift(spark):
    """Delta's write contract: schema drift fails LOUDLY by default —
    extra columns, missing columns, and type conflicts all raise
    before any commit."""
    from postrack_spark.streaming.delta_log import latest_version as _lv

    t = tempfile.mkdtemp(prefix="delta_enf_")
    write_delta(_df(spark, 0, 4), t)
    v = _lv(t)
    extra = spark.range(1).select(
        F.col("id").alias("k"), F.col("id").alias("v"),
        F.lit("x").alias("channel"))
    with pytest.raises(ValueError, match="merge_schema"):
        write_delta(extra, t)
    with pytest.raises(ValueError, match="missing table columns"):
        write_delta(spark.range(1).select(F.col("id").alias("k")), t)
    with pytest.raises(ValueError, match="type conflict"):
        write_delta(spark.range(1).select(
            F.col("id").alias("k"),
            F.col("id").cast("string").alias("v")), t)
    assert _lv(t) == v  # nothing committed


def test_schema_evolution_merge_schema_nulls_and_history(spark):
    """merge_schema appends new nullable columns in the SAME commit as
    the data: pre-evolution files read back with NULLs, time travel to
    the old version shows the OLD schema, and the evolved schema
    survives checkpoint + log cleanup."""
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_evo_")
    v0 = write_delta(_df(spark, 0, 4), t)
    evolved = spark.range(4, 6).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.lit("web").alias("channel"))
    write_delta(evolved, t, merge_schema=True)
    cur = read_delta(spark, t)
    assert cur.columns == ["k", "v", "channel"]
    rows = {r["k"]: r["channel"] for r in cur.collect()}
    assert rows[0] is None and rows[4] == "web"
    assert read_delta(spark, t, version=v0).columns == ["k", "v"]
    # evolved schema survives the checkpoint lane
    checkpoint_delta(t)
    clean_log_delta(t)
    again = read_delta(spark, t)
    assert again.columns == ["k", "v", "channel"]
    assert {r["k"]: r["channel"] for r in again.collect()} == rows
    # and further appends enforce the EVOLVED schema
    with pytest.raises(ValueError, match="missing table columns"):
        write_delta(_df(spark, 9, 10), t)


def test_check_constraints_lifecycle(spark):
    """ADD CONSTRAINT validates existing rows, writers reject
    violating batches (NULL passes — the SQL CHECK rule), the
    constraint survives checkpoint + log cleanup, and DROP re-opens
    the gate."""
    from postrack_spark.streaming.delta_log import (
        add_check_constraint_delta,
        checkpoint_delta,
        clean_log_delta,
        drop_check_constraint_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_chk_")
    write_delta(_df(spark, 0, 5), t)
    # existing data violates -> refused
    with pytest.raises(ValueError, match="existing rows violate"):
        add_check_constraint_delta(spark, t, "big_k", "k >= 3")
    add_check_constraint_delta(spark, t, "nonneg", "v >= 0")
    write_delta(_df(spark, 5, 7), t)  # clean batch passes
    bad = spark.createDataFrame([(99, -1)], "k long, v long")
    with pytest.raises(ValueError, match="CHECK constraint 'nonneg'"):
        write_delta(bad, t)
    # NULL evaluates to unknown -> passes (SQL CHECK semantics)
    write_delta(spark.createDataFrame([(100, None)], "k long, v long"), t)
    # survives the checkpoint lane (the pyarrow-drops-keys trap)
    checkpoint_delta(t)
    clean_log_delta(t)
    with pytest.raises(ValueError, match="CHECK constraint 'nonneg'"):
        write_delta(bad, t)
    drop_check_constraint_delta(t, "nonneg")
    write_delta(bad, t)  # gate open again
    with pytest.raises(KeyError, match="no CHECK constraint"):
        drop_check_constraint_delta(t, "nonneg")


def test_streaming_hook_enforces_schema_and_constraints(spark):
    from postrack_spark.streaming.delta_log import (
        add_check_constraint_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_fbchk_")
    write_delta(_df(spark, 0, 3), t)
    add_check_constraint_delta(spark, t, "nonneg", "v >= 0")
    hook = foreach_batch_delta(t, mode="append")
    hook(_df(spark, 3, 5), 0)  # clean batch commits
    with pytest.raises(ValueError, match="CHECK constraint"):
        hook(spark.createDataFrame([(9, -9)], "k long, v long"), 1)
    with pytest.raises(ValueError, match="merge_schema"):
        hook(spark.createDataFrame([(9, 9, "x")],
                                   "k long, v long, c string"), 2)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [0, 1, 2, 3, 4]


def test_change_feed_insert_synthesis_and_delete_rows(spark):
    """CDF: appends synthesize inserts from add actions (no change
    files needed); a delete with the feed enabled stages the deleted
    rows as 'delete' change rows in the SAME commit; reading across a
    pre-enable rewrite raises instead of fabricating history."""
    from postrack_spark.streaming.delta_log import (
        delete_delta,
        enable_change_feed_delta,
        read_changes_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cdf_")
    write_delta(_df(spark, 0, 6).repartition(2), t)            # v0
    v_en = enable_change_feed_delta(t)                          # v1
    v_del, _, _ = delete_delta(spark, t, "k >= 4")              # v2
    ch = read_changes_delta(spark, t, 0, v_del).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert sorted(r["k"] for r in by_type["insert"]) == list(range(6))
    assert all(r["_commit_version"] == 0 for r in by_type["insert"])
    assert sorted(r["k"] for r in by_type["delete"]) == [4, 5]
    assert all(r["_commit_version"] == v_del for r in by_type["delete"])
    # a feed-OFF rewrite is unreadable history
    t2 = tempfile.mkdtemp(prefix="delta_cdf2_")
    write_delta(_df(spark, 0, 4), t2)
    v_bad, _, _ = delete_delta(spark, t2, "k = 1")
    with pytest.raises(ValueError, match="without change files"):
        read_changes_delta(spark, t2, 0, v_bad)


def test_change_feed_merge_pre_post_insert(spark):
    from postrack_spark.streaming.delta_log import (
        enable_change_feed_delta,
        merge_delta,
        read_changes_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cdfm_")
    write_delta(_df(spark, 0, 4), t)
    enable_change_feed_delta(t)
    images = spark.createDataFrame([(1, 100), (9, 9)], "k long, v long")
    v_m = merge_delta(spark, t, images, "k", "v")
    ch = [r for r in read_changes_delta(spark, t, v_m, v_m).collect()]
    got = sorted((r["_change_type"], r["k"], r["v"]) for r in ch)
    assert got == [("insert", 9, 9),
                   ("update_postimage", 1, 100),
                   ("update_preimage", 1, 2)]


def test_change_feed_gdpr_delete_keys(spark):
    from postrack_spark.streaming.delta_log import (
        delete_keys_delta,
        enable_change_feed_delta,
        read_changes_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cdfk_")
    write_delta(_df(spark, 0, 6), t)
    enable_change_feed_delta(t)
    v_d, _, _ = delete_keys_delta(
        spark, t, spark.createDataFrame([(2,), (5,)], "k long"), "k")
    ch = read_changes_delta(spark, t, v_d, v_d).collect()
    assert sorted((r["_change_type"], r["k"]) for r in ch) == [
        ("delete", 2), ("delete", 5)]


def test_timestamp_as_of_resolution(spark):
    """TIMESTAMP AS OF: commit-file mtime is the commit's public
    timestamp (delta-spark's rule). Pinned with explicit utimes so
    the test owns the clock."""
    from postrack_spark.streaming.delta_log import (
        _log_path,
        version_at_timestamp_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_ts_")
    write_delta(_df(spark, 0, 3), t)
    write_delta(_df(spark, 3, 5), t)
    os.utime(_log_path(t, 0), (1000, 1000))      # T0 = 1_000_000 ms
    os.utime(_log_path(t, 1), (2000, 2000))      # T1 = 2_000_000 ms
    assert version_at_timestamp_delta(t, 1_000_000) == 0
    assert version_at_timestamp_delta(t, 1_500_000) == 0
    assert version_at_timestamp_delta(t, 2_000_000) == 1
    assert version_at_timestamp_delta(t, 9_999_999) == 1  # clamp
    with pytest.raises(ValueError, match="precedes"):
        version_at_timestamp_delta(t, 999_999)
    got = sorted(r["k"] for r in read_delta(
        spark, t, timestamp_ms=1_500_000).collect())
    assert got == [0, 1, 2]
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, t, version=0, timestamp_ms=1_500_000)


def test_restore_commit_documented_as_pre_cdf_history(spark):
    """RESTORE commits add/remove actions WITHOUT change files — by
    design its row-level delta is derivable from the two snapshots it
    bridges, so read_changes_delta refuses to span it (the same
    never-fabricate-history rule as pre-enable rewrites). Pinned here
    so a future CDF-for-restore feature changes this test, not silently
    the semantics."""
    from postrack_spark.streaming.delta_log import (
        enable_change_feed_delta,
        read_changes_delta,
        restore_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_rstcdf_")
    write_delta(_df(spark, 0, 4), t)                 # v0
    enable_change_feed_delta(t)                      # v1
    write_delta(_df(spark, 4, 6), t)                 # v2
    v_rst = restore_delta(t, 0)                      # v3: removes v2's files
    assert v_rst == 3
    # ranges that stop BEFORE the restore still read fine
    ch = read_changes_delta(spark, t, 0, 2).collect()
    assert sorted(r["k"] for r in ch) == list(range(6))
    with pytest.raises(ValueError, match="without change files"):
        read_changes_delta(spark, t, 0, v_rst)


def test_clone_of_cdf_table_keeps_constraints_and_feed_property(spark):
    """Shallow clone CARRIES the source's table configuration —
    constraints, the CDF flag, column-mapping keys — matching
    delta-spark's CLONE (round 6 pinned the opposite 'fork' choice;
    the column-mapping bug forced the revisit: without the config a
    mapped clone scans logical names against physical-named parquet).
    The tables still evolve independently — dropping a constraint on
    the clone never touches the source."""
    from postrack_spark.streaming.delta_log import (
        _replay,
        add_check_constraint_delta,
        clone_delta,
        drop_check_constraint_delta,
        enable_change_feed_delta,
    )

    src = tempfile.mkdtemp(prefix="delta_clcfg_src_")
    write_delta(_df(spark, 0, 4), src)
    enable_change_feed_delta(src)
    add_check_constraint_delta(spark, src, "nonneg", "v >= 0")
    dst = tempfile.mkdtemp(prefix="delta_clcfg_dst_")
    clone_delta(src, dst)
    _l, _s, _v, _t, cfg = _replay(dst, None)
    assert cfg == {"delta.enableChangeDataFeed": "true",
                   "delta.constraints.nonneg": "v >= 0"}
    # the carried constraint ENFORCES on the clone...
    with pytest.raises(ValueError, match="nonneg"):
        write_delta(spark.createDataFrame([(9, -9)], "k long, v long"), dst)
    # ...and dropping it there is clone-local
    drop_check_constraint_delta(dst, "nonneg")
    write_delta(spark.createDataFrame([(9, -9)], "k long, v long"), dst)
    _l2, _s2, _v2, _t2, src_cfg = _replay(src, None)
    assert "delta.constraints.nonneg" in src_cfg


def test_change_feed_covers_dv_deletes_and_stacking(spark):
    """MOR (deletion-vector) deletes participate in the change feed:
    the marked rows emit as 'delete' change rows in the SAME commit,
    and a STACKED delete re-matching already-marked rows emits only
    the NEWLY deleted ones (the new-minus-old rule n_deleted already
    follows). read_changes_delta then spans DV-delete commits instead
    of refusing them."""
    from postrack_spark.streaming.delta_log import (
        enable_change_feed_delta,
        read_changes_delta,
    )
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = tempfile.mkdtemp(prefix="delta_cdfdv_")
    write_delta(_df(spark, 0, 8).repartition(2), t)   # v0
    enable_change_feed_delta(t)                        # v1
    v_a, n_a, _ = delete_delta_dv(spark, t, "k >= 6")  # v2
    assert n_a == 2
    # overlapping predicate: k>=5 re-matches 6,7 (already marked)
    v_b, n_b, _ = delete_delta_dv(spark, t, "k >= 5")  # v3
    assert n_b == 1
    ch = read_changes_delta(spark, t, 0, v_b).collect()
    dels = sorted((r["_commit_version"], r["k"]) for r in ch
                  if r["_change_type"] == "delete")
    assert dels == [(v_a, 6), (v_a, 7), (v_b, 5)]
    assert sorted(r["k"] for r in ch if r["_change_type"] == "insert") == list(range(8))
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(range(5))


def test_restore_across_schema_change_keeps_configuration(spark):
    """ADVICE r6: restore across a schema evolution on a table carrying
    CHECK constraints + the CDF flag must RESTORE the target version's
    configuration, not erase it with configuration:{} — and a restore
    back re-restores the evolved state's config verbatim."""
    from postrack_spark.streaming.delta_log import (
        _replay,
        add_check_constraint_delta,
        enable_change_feed_delta,
        restore_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_rstcfg_")
    write_delta(_df(spark, 0, 4), t)                          # v0
    enable_change_feed_delta(t)                               # v1
    add_check_constraint_delta(spark, t, "k_pos", "k >= 0")   # v2
    _live, _s, v_pre, _txns, cfg_pre = _replay(t, None)
    assert cfg_pre.get("delta.enableChangeDataFeed") == "true"
    assert "delta.constraints.k_pos" in cfg_pre
    # v3: schema evolution (new nullable column)
    write_delta(
        spark.range(4, 6).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
            F.lit("x").alias("tag")),
        t, merge_schema=True)
    # restore to the pre-evolution version: schema rolls back AND the
    # constraint/CDF configuration survives (it was live at v_pre)
    restore_delta(t, v_pre)
    _live2, schema2, _v2, _tx2, cfg_post = _replay(t, None)
    assert "tag" not in schema2
    assert cfg_post == cfg_pre
    # the constraint still GATES writes after the restore
    with pytest.raises(ValueError, match="k_pos"):
        write_delta(spark.createDataFrame([(-1, 0)], "k bigint, v bigint"), t)
    # restore forward to the evolved version: its config comes back too
    _live3, _s3, _v3, _tx3, cfg_evolved = _replay(t, 3)
    restore_delta(t, 3)
    _live4, schema4, _v4, _tx4, cfg_now = _replay(t, None)
    assert "tag" in schema4 and cfg_now == cfg_evolved


def test_change_feed_merge_skips_no_op_updates(spark):
    """ADVICE r6: a batch key whose TABLE row wins (stale image) is a
    physical rewrite but NOT a logical change — the feed must emit
    nothing for it (delta-spark's changed-rows-only CDF), while real
    updates and inserts in the same commit still emit."""
    from postrack_spark.streaming.delta_log import (
        enable_change_feed_delta,
        merge_delta,
        read_changes_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cdfnop_")
    write_delta(_df(spark, 0, 4), t)  # rows (k, v=2k)
    enable_change_feed_delta(t)
    # k=2: stale (v=1 < table's 4, table wins) — must emit NOTHING;
    # k=1: winning update; k=9: brand-new insert
    images = spark.createDataFrame(
        [(2, 1), (1, 100), (9, 9)], "k long, v long")
    v_m = merge_delta(spark, t, images, "k", "v")
    ch = read_changes_delta(spark, t, v_m, v_m).collect()
    got = sorted((r["_change_type"], r["k"], r["v"]) for r in ch)
    assert got == [("insert", 9, 9),
                   ("update_postimage", 1, 100),
                   ("update_preimage", 1, 2)]
    # the stale image still lost in the table itself
    assert {r["k"]: r["v"] for r in read_delta(spark, t).collect()}[2] == 4
    # an all-stale batch emits an EMPTY feed for its commit
    v_n = merge_delta(spark, t, spark.createDataFrame(
        [(3, 0)], "k long, v long"), "k", "v")
    assert read_changes_delta(spark, t, v_n, v_n).count() == 0


# ----------------------------------------------------- COLUMN MAPPING


def test_column_mapping_rename_round_trip_zero_rewrite(spark):
    """PROTOCOL.md column mapping (name mode): RENAME is metadata-only
    — the old parquet is read through the physicalName indirection, no
    data file is rewritten, and time travel to a pre-rename version
    still shows the old name against the same bytes."""
    from postrack_spark.streaming.delta_log import (
        enable_column_mapping_delta,
        rename_column_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cm_")
    write_delta(_df(spark, 0, 6).repartition(2), t)           # v0
    files_before = sorted(f for f in os.listdir(t) if f.endswith(".parquet"))
    enable_column_mapping_delta(t)                            # v1
    v_rn = rename_column_delta(t, "v", "value")               # v2
    files_after = sorted(f for f in os.listdir(t) if f.endswith(".parquet"))
    assert files_before == files_after  # ZERO rewrite
    got = read_delta(spark, t)
    assert got.columns == ["k", "value"]
    assert sorted((r["k"], r["value"]) for r in got.collect()) == [
        (i, 2 * i) for i in range(6)]
    # time travel: the pre-rename schema against the same bytes
    old = read_delta(spark, t, version=0)
    assert old.columns == ["k", "v"]
    assert sorted(r["v"] for r in old.collect()) == [2 * i for i in range(6)]
    # appends after the rename write PHYSICAL names: a fresh read and
    # a pre-rename file read agree through the mapping
    write_delta(spark.createDataFrame([(100, 200)], "k bigint, value bigint"), t)
    assert sorted(r["value"] for r in read_delta(spark, t).collect()) == [
        0, 2, 4, 6, 8, 10, 200]
    # rename without mapping refuses; collision refuses
    t2 = tempfile.mkdtemp(prefix="delta_cm2_")
    write_delta(_df(spark, 0, 2), t2)
    with pytest.raises(ValueError, match="column mapping"):
        rename_column_delta(t2, "v", "w")
    with pytest.raises(ValueError, match="already exists"):
        enable_column_mapping_delta(t)
        rename_column_delta(t, "k", "value")
    assert v_rn == 2


def test_column_mapping_drop_column_metadata_only(spark):
    from postrack_spark.streaming.delta_log import (
        drop_column_delta,
        enable_column_mapping_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cmd_")
    write_delta(_df(spark, 0, 4), t)
    enable_column_mapping_delta(t)
    files_before = sorted(f for f in os.listdir(t) if f.endswith(".parquet"))
    drop_column_delta(t, "v")
    assert sorted(f for f in os.listdir(t)
                  if f.endswith(".parquet")) == files_before
    got = read_delta(spark, t)
    assert got.columns == ["k"]
    # time travel pre-drop still sees the column
    assert read_delta(spark, t, version=0).columns == ["k", "v"]
    with pytest.raises(ValueError, match="only column"):
        drop_column_delta(t, "k")
    with pytest.raises(KeyError):
        drop_column_delta(t, "nope")


def test_column_mapping_survives_checkpoint_and_cleanup(spark):
    """The mapping lives in schemaString field metadata + config —
    both ride the parquet checkpoint, so a log-cleaned table still
    reads renamed columns through old parquet."""
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
        enable_column_mapping_delta,
        rename_column_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cmcp_")
    write_delta(_df(spark, 0, 5), t)
    enable_column_mapping_delta(t)
    rename_column_delta(t, "v", "val")
    cp = checkpoint_delta(t)
    write_delta(spark.createDataFrame([(9, 9)], "k bigint, val bigint"), t)
    clean_log_delta(t)
    got = read_delta(spark, t)
    assert got.columns == ["k", "val"]
    assert sorted(r["val"] for r in got.collect()) == [0, 2, 4, 6, 8, 9]
    assert cp == 2


def test_column_mapping_cdf_across_rename(spark):
    """CDF interplay: change files written BEFORE a rename carry the
    stable physical names, so reading changes across the rename keeps
    resolving — and post-rename change rows use the same physical
    column."""
    from postrack_spark.streaming.delta_log import (
        delete_delta,
        enable_change_feed_delta,
        enable_column_mapping_delta,
        read_changes_delta,
        rename_column_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cmcdf_")
    write_delta(_df(spark, 0, 6), t)                       # v0
    enable_change_feed_delta(t)                            # v1
    enable_column_mapping_delta(t)                         # v2
    v_d1, _, _ = delete_delta(spark, t, "k = 1")           # v3: pre-rename
    rename_column_delta(t, "v", "val")                     # v4
    v_d2, _, _ = delete_delta(spark, t, "k = 2")           # v5: post-rename
    ch = read_changes_delta(spark, t, v_d1, v_d2).collect()
    dels = sorted((r["k"], r["val"]) for r in ch
                  if r["_change_type"] == "delete")
    assert dels == [(1, 2), (2, 4)]  # both resolve through the mapping


def test_column_mapping_dv_delete_and_read(spark):
    """DV interplay: deletion vectors key rows by (file, position) —
    orthogonal to names — and the DV read path scans physical names;
    a rename between the DV delete and the read must not disturb
    either."""
    from postrack_spark.streaming.delta_log import (
        enable_column_mapping_delta,
        rename_column_delta,
    )
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = tempfile.mkdtemp(prefix="delta_cmdv_")
    write_delta(_df(spark, 0, 8).repartition(2), t)
    enable_column_mapping_delta(t)
    rename_column_delta(t, "v", "val")
    v_dv, n, _ = delete_delta_dv(spark, t, "val % 4 = 2")  # logical name
    assert n == 4  # val = 2k, matches {2, 6, 10, 14}
    got = read_delta(spark, t)
    assert got.columns == ["k", "val"]
    assert sorted(r["val"] for r in got.collect()) == [0, 4, 8, 12]
    # rename AFTER the DV landed: bitmap still applies
    rename_column_delta(t, "val", "v2")
    assert sorted(r["v2"] for r in read_delta(spark, t).collect()) == [
        0, 4, 8, 12]


def test_column_mapping_cow_merge_and_evolution(spark):
    """COW merge reads/writes through the mapping, and add-column
    evolution on a mapped table assigns a uuid physical name + fresh
    id (no collision with any past logical name)."""
    from postrack_spark.streaming.delta_log import (
        _replay,
        enable_column_mapping_delta,
        merge_delta,
        rename_column_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cmmg_")
    write_delta(_df(spark, 0, 4), t)
    enable_column_mapping_delta(t)
    rename_column_delta(t, "v", "score")
    merge_delta(spark, t, spark.createDataFrame(
        [(1, 100), (9, 9)], "k long, score long"), "k", "score")
    got = {r["k"]: r["score"] for r in read_delta(spark, t).collect()}
    assert got == {0: 0, 1: 100, 2: 4, 3: 6, 9: 9}
    # evolution under mapping: new column gets uuid physical name
    write_delta(spark.createDataFrame(
        [(50, 50, "x")], "k long, score long, tag string"), t,
        merge_schema=True)
    _l, schema_string, _v, _t2, config = _replay(t, None)
    import json as _json

    fields = {f["name"]: f for f in _json.loads(schema_string)["fields"]}
    md = fields["tag"]["metadata"]
    assert md["delta.columnMapping.physicalName"].startswith("col-")
    assert md["delta.columnMapping.id"] == 3
    assert config["delta.columnMapping.maxColumnId"] == "3"
    got2 = {r["k"]: r["tag"] for r in read_delta(spark, t).collect()}
    assert got2[50] == "x" and got2[1] is None


def test_column_mapping_delta_feed_reads_through_rename(spark):
    """The streaming feed projects files through the physical-name
    indirection and uses the NEWEST metaData (live schema)."""
    from postrack_spark.sources.delta_feed import register
    from postrack_spark.streaming.delta_log import (
        enable_column_mapping_delta,
        rename_column_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cmfeed_")
    write_delta(_df(spark, 0, 3), t)
    enable_column_mapping_delta(t)
    rename_column_delta(t, "v", "val")
    write_delta(spark.createDataFrame([(7, 70)], "k bigint, val bigint"), t)
    register(spark)
    ckpt = tempfile.mkdtemp(prefix="delta_cmfeed_ck_")
    rows = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    q = (spark.readStream.format("delta_feed").option("path", t).load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert sorted((r["k"], r["val"]) for r in rows) == [
        (0, 0), (1, 2), (2, 4), (7, 70)]


# --------------------------------------------------- PARTITIONED TABLES


def test_partitioned_write_prunes_from_metadata(spark):
    """partitionColumns + per-add partitionValues: a partition_filter
    read prunes FILES from the log's O(files) metadata (certified via
    scan_stats) and returns exactly the rows a full scan + filter
    would; unknown filter columns fail open."""
    t = tempfile.mkdtemp(prefix="delta_part_")
    df = spark.createDataFrame(
        [(i, i % 3, i * 2) for i in range(30)], "k long, g long, v long")
    write_delta(df, t, partition_by=["g"])
    stats: dict = {}
    got = sorted(r["k"] for r in read_delta(
        spark, t, partition_filter={"g": 1}, scan_stats=stats).collect()
        if r["g"] == 1)
    assert got == [k for k in range(30) if k % 3 == 1]
    assert 0 < stats["files_scanned"] < stats["files_total"]
    # list values + string coercion (protocol partition values are strings)
    s2: dict = {}
    got2 = read_delta(spark, t, partition_filter={"g": [0, 2]},
                      scan_stats=s2)
    assert sorted({r["g"] for r in got2.collect()}) == [0, 2]
    # unknown column: fail open (everything scans)
    s3: dict = {}
    read_delta(spark, t, partition_filter={"nope": 1}, scan_stats=s3)
    assert s3["files_scanned"] == s3["files_total"]


def test_partitioned_table_inherits_and_refuses_conflicts(spark):
    t = tempfile.mkdtemp(prefix="delta_parti_")
    df = spark.createDataFrame([(1, 0, 2)], "k long, g long, v long")
    write_delta(df, t, partition_by=["g"])
    # a later write inherits the partitioning automatically
    write_delta(spark.createDataFrame([(2, 1, 4)], "k long, g long, v long"), t)
    s: dict = {}
    got = read_delta(spark, t, partition_filter={"g": 1}, scan_stats=s)
    assert [r["k"] for r in got.collect()] == [2]
    assert s["files_scanned"] < s["files_total"]
    with pytest.raises(ValueError, match="partitioned by"):
        write_delta(df, t, partition_by=["k"])
    with pytest.raises(ValueError, match="not in the batch"):
        write_delta(df.drop("g"), tempfile.mkdtemp(prefix="delta_partx_"),
                    partition_by=["g"])


def test_partitioning_survives_checkpoint_and_cleanup(spark):
    """partitionColumns ride the checkpoint metaData and
    partitionValues ride the checkpoint add structs — post-cleanup
    reads still prune and post-cleanup writes still partition."""
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_partcp_")
    df = spark.createDataFrame(
        [(i, i % 2, i) for i in range(10)], "k long, g long, v long")
    write_delta(df, t, partition_by=["g"])
    checkpoint_delta(t)
    clean_log_delta(t)
    s: dict = {}
    got = read_delta(spark, t, partition_filter={"g": 0}, scan_stats=s)
    assert sorted(r["k"] for r in got.collect()) == [0, 2, 4, 6, 8]
    assert 0 < s["files_scanned"] < s["files_total"]
    # a write after cleanup still inherits the partitioning
    write_delta(spark.createDataFrame([(99, 0, 0)],
                                      "k long, g long, v long"), t)
    s2: dict = {}
    got2 = read_delta(spark, t, partition_filter={"g": 0}, scan_stats=s2)
    assert 99 in {r["k"] for r in got2.collect()}
    assert s2["files_scanned"] < s2["files_total"]


def test_partitioned_cow_delete_keeps_partition_values(spark):
    """COW rewrites on a partitioned table restage partitioned: the
    survivor files carry fresh partitionValues, so pruning keeps
    working after the delete."""
    from postrack_spark.streaming.delta_log import delete_delta

    t = tempfile.mkdtemp(prefix="delta_partcow_")
    df = spark.createDataFrame(
        [(i, i % 2, i) for i in range(12)], "k long, g long, v long")
    write_delta(df, t, partition_by=["g"])
    delete_delta(spark, t, "k < 4")
    s: dict = {}
    got = sorted(r["k"] for r in read_delta(
        spark, t, partition_filter={"g": 0}, scan_stats=s).collect()
        if r["g"] == 0)
    assert got == [4, 6, 8, 10]
    assert 0 < s["files_scanned"] < s["files_total"]


def test_metadata_only_commits_keep_partitioning(spark):
    """Property changes, CHECK constraints, and merge_schema evolution
    are metadata-only commits that must RE-STATE partitionColumns —
    the replay takes the newest metaData verbatim, so writing [] there
    silently erased the table's partitioning (the bug this pins):
    pruning died and the next explicit partition_by write raised a
    bogus 'partitioned by []' conflict."""
    from postrack_spark.streaming.delta_log import (
        _partition_columns,
        add_check_constraint_delta,
        drop_check_constraint_delta,
        enable_change_feed_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_partmeta_")
    df = spark.createDataFrame(
        [(i, i % 2, i) for i in range(10)], "k long, g long, v long")
    write_delta(df, t, partition_by=["g"])
    enable_change_feed_delta(t)
    add_check_constraint_delta(spark, t, "k_nonneg", "k >= 0")
    drop_check_constraint_delta(t, "k_nonneg")
    write_delta(spark.createDataFrame([(50, 1, 1, 9)],
                                      "k long, g long, v long, w long"),
                t, merge_schema=True)
    assert _partition_columns(t) == ["g"]
    # pruning still works and an explicit same-partitioning write passes
    s: dict = {}
    got = read_delta(spark, t, partition_filter={"g": 1}, scan_stats=s)
    assert 50 in {r["k"] for r in got.collect()}
    assert s["files_scanned"] < s["files_total"]
    write_delta(spark.createDataFrame([(51, 0, 0, 0)],
                                      "k long, g long, v long, w long"),
                t, partition_by=["g"])


def test_clone_carries_configuration_and_partitioning(spark):
    """CLONE carries table properties + partitionColumns (delta's
    rule). Without the configuration, a clone of a column-mapped table
    scans LOGICAL names against physical-named parquet and reads
    nulls; without partitionColumns the clone forgets its pruning."""
    from postrack_spark.streaming.delta_log import (
        _partition_columns,
        clone_delta,
        enable_column_mapping_delta,
        rename_column_delta,
    )

    src = tempfile.mkdtemp(prefix="delta_clsrc_")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    write_delta(df, src)
    enable_column_mapping_delta(src)
    rename_column_delta(src, "v", "val")
    dst = os.path.join(tempfile.mkdtemp(prefix="delta_cldst_"), "t")
    clone_delta(src, dst)
    got = {(r["k"], r["val"]) for r in read_delta(spark, dst).collect()}
    assert got == {(1, 10), (2, 20)}
    # partitioned source: the clone keeps pruning metadata
    psrc = tempfile.mkdtemp(prefix="delta_clpsrc_")
    pdf = spark.createDataFrame(
        [(i, i % 2) for i in range(8)], "k long, g long")
    write_delta(pdf, psrc, partition_by=["g"])
    pdst = os.path.join(tempfile.mkdtemp(prefix="delta_clpdst_"), "t")
    clone_delta(psrc, pdst)
    assert _partition_columns(pdst) == ["g"]
    s: dict = {}
    got2 = read_delta(spark, pdst, partition_filter={"g": 0}, scan_stats=s)
    assert sorted(r["k"] for r in got2.collect()) == [0, 2, 4, 6]
    assert s["files_scanned"] < s["files_total"]


def test_column_mapping_refuses_partitioned_tables(spark):
    from postrack_spark.streaming.delta_log import (
        enable_column_mapping_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cmpart_")
    write_delta(spark.createDataFrame([(1, 0)], "k long, g long"), t,
                partition_by=["g"])
    with pytest.raises(NotImplementedError, match="PARTITIONED"):
        enable_column_mapping_delta(t)


def test_generated_columns_computed_and_validated(spark):
    """PROTOCOL.md generated columns: declared at creation via field
    metadata (delta.generationExpression); later writes COMPUTE a
    missing generated column and VALIDATE a provided one (null-safe
    equality — a mismatch is rejected like a CHECK violation)."""
    from postrack_spark.streaming.delta_log import _generated_exprs

    t = tempfile.mkdtemp(prefix="delta_gen_")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    write_delta(df, t, generated={"v2": "v * 2"})
    # the creating write computed the missing column + stored the expr
    _live, schema_string, _v = __import__(
        "postrack_spark.streaming.delta_log",
        fromlist=["_snapshot"])._snapshot(t, None)
    assert _generated_exprs(schema_string) == {"v2": "v * 2"}
    got = {(r["k"], r["v2"]) for r in read_delta(spark, t).collect()}
    assert got == {(1, 20), (2, 40)}
    # append WITHOUT the column: computed
    write_delta(spark.createDataFrame([(3, 30)], "k long, v long"), t)
    got = {(r["k"], r["v2"]) for r in read_delta(spark, t).collect()}
    assert got == {(1, 20), (2, 40), (3, 60)}
    # append WITH a matching value: passes
    write_delta(spark.createDataFrame([(4, 1, 2)], "k long, v long, v2 long"),
                t)
    # append WITH a mismatching value: rejected
    with pytest.raises(ValueError, match="generated column"):
        write_delta(
            spark.createDataFrame([(5, 1, 3)], "k long, v long, v2 long"), t)
    # re-declaring different expressions on an existing table: rejected
    with pytest.raises(ValueError, match="declared at table creation"):
        write_delta(spark.createDataFrame([(6, 1)], "k long, v long"), t,
                    generated={"v2": "v * 3"})


def test_generated_partition_column_prunes(spark):
    """The classic use: partition by a DERIVED column writers never
    supply — the generated expression computes it, partitionValues
    record it, and reads prune from metadata. The declaration also
    survives checkpoint + log cleanup (it rides schemaString)."""
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_genpart_")
    df = spark.createDataFrame([(i, i % 3) for i in range(12)],
                               "k long, g long")
    write_delta(df, t, generated={"bucket": "cast(g % 2 as bigint)"},
                partition_by=["bucket"])
    checkpoint_delta(t)
    clean_log_delta(t)
    write_delta(spark.createDataFrame([(100, 1)], "k long, g long"), t)
    s: dict = {}
    got = read_delta(spark, t, partition_filter={"bucket": 1}, scan_stats=s)
    ks = sorted(r["k"] for r in got.collect())
    assert ks == [1, 4, 7, 10, 100]  # (k % 3) % 2 == 1, plus the append
    assert 0 < s["files_scanned"] < s["files_total"]


def test_generated_columns_through_merge_and_stream(spark):
    """merge_delta batch images and foreach_batch_delta batches get
    the same compute-or-validate treatment as write_delta."""
    from postrack_spark.streaming.delta_log import merge_delta

    t = tempfile.mkdtemp(prefix="delta_genmerge_")
    df = spark.createDataFrame([(1, 10, 0), (2, 20, 0)],
                               "k long, v long, seq long")
    write_delta(df, t, generated={"v2": "v * 2"})
    merge_delta(spark,
                t,
                spark.createDataFrame([(2, 25, 1)], "k long, v long, seq long"),
                "k", "seq")
    got = {(r["k"], r["v2"]) for r in read_delta(spark, t).collect()}
    assert got == {(1, 20), (2, 50)}
    batch = spark.createDataFrame([(3, 30, 2)], "k long, v long, seq long")
    foreach_batch_delta(t)(batch, 1)
    got = {(r["k"], r["v2"]) for r in read_delta(spark, t).collect()}
    assert got == {(1, 20), (2, 50), (3, 60)}


def test_in_commit_timestamps_monotonic_and_authoritative(spark):
    """In-commit timestamps (PROTOCOL.md): once enabled, every commit
    carries a commitInfo.inCommitTimestamp that strictly increases
    (max(prev+1, clock) — same-millisecond commits still order), and
    TIMESTAMP AS OF resolves from IT, not file mtimes: backdating or
    future-dating the log files' mtimes must not move resolution."""
    import os as _os

    from postrack_spark.streaming.delta_log import (
        _commit_info_ict,
        enable_in_commit_timestamps_delta,
        read_delta,
        version_at_timestamp_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_ict_")
    write_delta(_df(spark, 0, 3), t)                       # v0: pre-feature
    ev = enable_in_commit_timestamps_delta(t)              # v1: enables
    assert ev == 1
    assert enable_in_commit_timestamps_delta(t) == 1       # idempotent
    write_delta(_df(spark, 3, 5), t)                       # v2
    write_delta(_df(spark, 5, 6), t)                       # v3
    assert _commit_info_ict(t, 0) is None
    icts = [_commit_info_ict(t, v) for v in (1, 2, 3)]
    assert all(i is not None for i in icts)
    assert icts[0] < icts[1] < icts[2]
    # mtime sabotage: push every log file's mtime into the far future —
    # ICT versions must still resolve by their own timestamps
    for v in range(4):
        _os.utime(_log_path(t, v), (2**31, 2**31))
    assert version_at_timestamp_delta(t, icts[1]) == 2
    assert version_at_timestamp_delta(t, icts[1] - 1) == 1
    assert version_at_timestamp_delta(t, icts[2] + 10_000) == 3  # clamp
    got = read_delta(spark, t, timestamp_ms=icts[1])
    assert sorted(r["k"] for r in got.collect()) == [0, 1, 2, 3, 4]


def test_in_commit_timestamps_survive_log_cleanup(spark):
    """After checkpoint + clean_log removes the predecessor JSON, the
    next commit still stamps (enablement is discovered from the
    checkpoint's configuration — the documented fallback)."""
    from postrack_spark.streaming.delta_log import (
        _commit_info_ict,
        checkpoint_delta,
        clean_log_delta,
        enable_in_commit_timestamps_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_ictcp_")
    write_delta(_df(spark, 0, 3), t)
    enable_in_commit_timestamps_delta(t)
    checkpoint_delta(t)
    clean_log_delta(t)
    v = write_delta(_df(spark, 3, 5), t)
    assert _commit_info_ict(t, v) is not None


def test_history_delta_operation_classes(spark):
    from postrack_spark.streaming.delta_log import (
        compact_delta,
        delete_delta,
        enable_change_feed_delta,
        history_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_hist_")
    write_delta(_df(spark, 0, 8).repartition(2), t)    # v0 WRITE+meta
    enable_change_feed_delta(t)                        # v1 SET_METADATA
    delete_delta(spark, t, "k < 2")                    # v2 rewrite + cdc
    compact_delta(spark, t, target_files=1)            # v3 OPTIMIZE
    h = {r["version"]: r for r in history_delta(spark, t).collect()}
    assert h[0]["operation"] == "WRITE" and h[0]["metadata_changed"]
    assert h[1]["operation"] == "SET_METADATA"
    assert h[2]["operation"] == "MERGE_OR_OVERWRITE" and h[2]["n_cdc"] > 0
    assert h[3]["operation"] == "OPTIMIZE" and not h[3]["data_change"]


def test_row_tracking_ids_dense_stable_and_checkpointed(spark):
    """ROW TRACKING (PROTOCOL.md): enablement backfills live files
    with baseRowId and records the high-water mark in the
    delta.rowTracking domainMetadata; appends extend the id space
    densely; DV deletes keep every survivor's id (files never
    rewritten); OPTIMIZE preserves ids by materializing them; the
    whole state survives checkpoint + log cleanup."""
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
        enable_row_tracking_delta,
        read_delta_with_row_ids,
    )
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = tempfile.mkdtemp(prefix="delta_rt_")
    write_delta(_df(spark, 0, 6), t)
    write_delta(_df(spark, 6, 10), t)
    v = enable_row_tracking_delta(t)
    assert enable_row_tracking_delta(t) == v  # idempotent
    got = read_delta_with_row_ids(spark, t)
    ids = sorted(r["_row_id"] for r in got.collect())
    assert ids == list(range(10))  # dense, unique, zero-based
    # fresh rows continue above the high-water mark
    write_delta(_df(spark, 10, 13), t)
    got2 = {r["k"]: r["_row_id"] for r in
            read_delta_with_row_ids(spark, t).collect()}
    assert sorted(got2.values()) == list(range(13))
    # DV delete: survivors keep their ids verbatim
    delete_delta_dv(spark, t, "k in (2, 11)")
    got3 = {r["k"]: r["_row_id"] for r in
            read_delta_with_row_ids(spark, t).collect()}
    assert set(got3) == set(range(13)) - {2, 11}
    assert all(got3[k] == got2[k] for k in got3)
    # OPTIMIZE: files rewritten, ids materialized and PRESERVED
    compact_delta(spark, t, target_files=2)
    got4 = {r["k"]: r["_row_id"] for r in
            read_delta_with_row_ids(spark, t).collect()}
    assert got4 == got3
    # checkpoint + cleanup: domain watermark and add-level ids ride
    checkpoint_delta(t)
    clean_log_delta(t)
    got5 = {r["k"]: r["_row_id"] for r in
            read_delta_with_row_ids(spark, t).collect()}
    assert got5 == got3
    write_delta(_df(spark, 13, 14), t)  # post-cleanup append still stamps
    got6 = {r["k"]: r["_row_id"] for r in
            read_delta_with_row_ids(spark, t).collect()}
    assert got6[13] > max(got3.values())  # above the preserved mark
    # plain reads are untouched by the machinery
    assert read_delta(spark, t).columns == ["k", "v"]


def test_row_tracking_refuses_cow_rewrites(spark):
    from postrack_spark.streaming.delta_log import (
        delete_delta,
        enable_row_tracking_delta,
        merge_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_rtcow_")
    df = spark.createDataFrame([(1, 10, 0), (2, 20, 0)],
                               "k long, v long, seq long")
    write_delta(df, t)
    enable_row_tracking_delta(t)
    with pytest.raises(NotImplementedError, match="row-tracking"):
        delete_delta(spark, t, "k = 1")
    with pytest.raises(NotImplementedError, match="row-tracking"):
        merge_delta(spark, t,
                    spark.createDataFrame([(2, 25, 1)],
                                          "k long, v long, seq long"),
                    "k", "seq")


def test_append_only_property_blocks_data_removal(spark):
    """delta.appendOnly=true: deletes (COW and DV), merges,
    overwrites, and restore are refused; appends and OPTIMIZE
    (dataChange=false) stay legal — the audit-table contract."""
    from postrack_spark.streaming.delta_log import (
        delete_delta,
        merge_delta,
        restore_delta,
        set_table_property_delta,
    )
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = tempfile.mkdtemp(prefix="delta_ao_")
    write_delta(_df(spark, 0, 5), t)
    set_table_property_delta(t, "delta.appendOnly", "true")
    write_delta(_df(spark, 5, 8), t)                      # appends legal
    compact_delta(spark, t, target_files=1)               # OPTIMIZE legal
    for blocked in (
        lambda: delete_delta(spark, t, "k < 2"),
        lambda: delete_delta_dv(spark, t, "k < 2"),
        lambda: merge_delta(
            spark, t,
            spark.createDataFrame([(1, 9)], "k long, v long"), "k", "v"),
        lambda: write_delta(_df(spark, 0, 1), t, mode="overwrite"),
        lambda: restore_delta(t, 0),
    ):
        with pytest.raises(ValueError, match="appendOnly"):
            blocked()
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(
        range(8))
    # unsetting the property re-enables removal
    set_table_property_delta(t, "delta.appendOnly", None)
    delete_delta(spark, t, "k = 0")
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(
        range(1, 8))


def test_clone_of_row_tracking_table_keeps_id_space(spark):
    """A shallow clone of a row-tracking table carries the
    delta.rowTracking domainMetadata: appends to the CLONE continue
    ABOVE the source's high-water mark instead of colliding with the
    cloned files' baseRowIds."""
    from postrack_spark.streaming.delta_log import (
        clone_delta,
        enable_row_tracking_delta,
        read_delta_with_row_ids,
    )

    src = tempfile.mkdtemp(prefix="delta_rtclone_src_")
    write_delta(_df(spark, 0, 6), src)
    enable_row_tracking_delta(src)
    dst = os.path.join(tempfile.mkdtemp(prefix="delta_rtclone_dst_"), "t")
    clone_delta(src, dst)
    write_delta(_df(spark, 6, 9), dst)
    ids = sorted(r["_row_id"] for r in
                 read_delta_with_row_ids(spark, dst).collect())
    assert ids == list(range(9))  # dense continuation, no collision


def test_declared_clustering_drives_optimize(spark):
    """set_clustering_delta stores the policy as delta.clustering
    domainMetadata; a plain compact_delta Z-orders on it (explicit
    zorder_by still overrides); the declaration survives checkpoint +
    cleanup and is refused for unknown columns."""
    from postrack_spark.streaming.delta_log import (
        _clustering_columns,
        checkpoint_delta,
        clean_log_delta,
        pruned_read_delta,
        set_clustering_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_clus_")
    df = spark.createDataFrame(
        [(i, (i * 7919) % 1000, i) for i in range(4000)],
        "k long, x long, v long")
    write_delta(df.repartition(8), t)
    with pytest.raises(KeyError, match="clustering columns"):
        set_clustering_delta(t, ("x", "nope"))
    set_clustering_delta(t, ("x", "k"))
    assert _clustering_columns(t) == ["x", "k"]
    checkpoint_delta(t)
    clean_log_delta(t)
    assert _clustering_columns(t) == ["x", "k"]  # rides the checkpoint
    _d0, before, _tot = pruned_read_delta(spark, t, "x", 100, 160)
    compact_delta(spark, t, target_files=8)  # policy-driven Z-order
    _d1, after, _tot1 = pruned_read_delta(spark, t, "x", 100, 160)
    assert after < before
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == list(range(4000))


def test_generated_refs_block_rename_and_drop(spark):
    """Renaming or dropping the SOURCE column of a generated column is
    refused (the stored expression would go unresolvable with no way
    to clear it — the CHECK-constraint rule applied to generation
    expressions); renaming the generated column itself is fine (its
    metadata moves with the field)."""
    from postrack_spark.streaming.delta_log import (
        drop_column_delta,
        enable_column_mapping_delta,
        rename_column_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_genref_")
    write_delta(spark.createDataFrame([(1, 10)], "k long, v long"), t,
                generated={"v2": "v * 2"})
    enable_column_mapping_delta(t)
    with pytest.raises(ValueError, match="derives from it"):
        rename_column_delta(t, "v", "w")
    with pytest.raises(ValueError, match="derives from it"):
        drop_column_delta(t, "v")
    rename_column_delta(t, "v2", "v_doubled")  # the generated col itself
    got = read_delta(spark, t).collect()[0]
    assert got["v_doubled"] == 20


def test_append_only_enablement_stops_inflight_overwrite(spark, monkeypatch):
    """The OCC re-gate honors a CONCURRENT delta.appendOnly
    enablement: an in-flight overwrite that loses its commit race to
    the property change must raise on retry, not destroy the live set
    of a now-append-only table."""
    from postrack_spark.streaming import delta_log as dl

    t = tempfile.mkdtemp(prefix="delta_aorace_")
    write_delta(_df(spark, 0, 4), t)
    real_commit = dl.commit_delta
    state = {"fired": False}

    def racing_commit(table, version, actions):
        if not state["fired"] and any("remove" in a for a in actions):
            state["fired"] = True
            dl.set_table_property_delta(t, "delta.appendOnly", "true")
            raise dl.DeltaCommitConflict("injected race")
        return real_commit(table, version, actions)

    monkeypatch.setattr(dl, "commit_delta", racing_commit)
    with pytest.raises(ValueError, match="appendOnly"):
        dl.write_delta(_df(spark, 4, 5), t, mode="overwrite")
    monkeypatch.setattr(dl, "commit_delta", real_commit)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [
        0, 1, 2, 3]  # live set untouched


def test_foreach_batch_regates_row_tracking_on_retry(spark, monkeypatch):
    """A streaming batch that loses its commit race to a concurrent
    enable_row_tracking_delta must stamp baseRowId on retry — a stale
    pre-loop rt_on would land id-less files on a row-tracking table
    and poison every read_delta_with_row_ids after."""
    from postrack_spark.streaming import delta_log as dl

    t = tempfile.mkdtemp(prefix="delta_rtrace_")
    write_delta(_df(spark, 0, 4), t)
    real_commit = dl.commit_delta
    state = {"fired": False}

    def racing_commit(table, version, actions):
        if not state["fired"] and any("txn" in a for a in actions):
            state["fired"] = True
            dl.enable_row_tracking_delta(t)
            raise dl.DeltaCommitConflict("injected race")
        return real_commit(table, version, actions)

    monkeypatch.setattr(dl, "commit_delta", racing_commit)
    dl.foreach_batch_delta(t)(_df(spark, 4, 7), 1)
    monkeypatch.setattr(dl, "commit_delta", real_commit)
    ids = sorted(r["_row_id"] for r in
                 dl.read_delta_with_row_ids(spark, t).collect())
    assert ids == list(range(7))  # batch files got ids on the retry


# ---------------------------------------- ADVICE r7 regression tests


def test_foreach_batch_creating_lost_v0_race_regates(spark, monkeypatch):
    """A streaming hook that saw NO table at gate time but lost the v0
    race to a concurrent creator must re-run the FULL gate set against
    the winner's metadata — pre-fix, the staged batch committed with
    zero schema/constraint enforcement (ADVICE r7)."""
    from postrack_spark.streaming import delta_log
    from postrack_spark.streaming.delta_log import add_check_constraint_delta

    table = tempfile.mkdtemp(prefix="delta_fb_race_")
    orig = delta_log._write_data_files
    fired = {"done": False}

    def inject(df, tbl, **kw):
        adds = orig(df, tbl, **kw)
        if not fired["done"]:
            fired["done"] = True
            write_delta(_df(spark, 100, 110), table)  # winner creates v0
            add_check_constraint_delta(spark, table, "k_floor", "k >= 50")
        return adds

    monkeypatch.setattr(delta_log, "_write_data_files", inject)
    hook = foreach_batch_delta(table)
    with pytest.raises(ValueError, match="CHECK constraint"):
        hook(_df(spark, 0, 10), 0)  # violates the winner's constraint
    assert fired["done"]
    # only the winner's commits exist; the ungated batch never landed
    assert latest_version(table) == 1
    got = sorted(r["k"] for r in read_delta(spark, table).collect())
    assert got == list(range(100, 110))


def test_write_creating_lost_v0_race_to_generated_table(spark, monkeypatch):
    """A creating write that loses the v0 race to a winner DECLARING
    generated columns must conflict (restage), never commit rows that
    were staged without validating the winner's expressions
    (ADVICE r7)."""
    from postrack_spark.streaming import delta_log

    table = tempfile.mkdtemp(prefix="delta_gen_race_")
    orig = delta_log._write_data_files
    fired = {"done": False}

    def inject(df, tbl, **kw):
        adds = orig(df, tbl, **kw)
        if not fired["done"]:
            fired["done"] = True
            write_delta(_df(spark, 0, 5), table, generated={"v": "k * 2"})
        return adds

    monkeypatch.setattr(delta_log, "_write_data_files", inject)
    bad = spark.range(10, 15).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    with pytest.raises(DeltaCommitConflict, match="generated-column"):
        write_delta(bad, table)
    # nothing non-conforming landed
    got = {r["k"]: r["v"] for r in read_delta(spark, table).collect()}
    assert got == {k: k * 2 for k in range(5)}


def test_history_classifies_domain_only_commit(spark):
    """domainMetadata-only commits (declared clustering) are real
    metadata operations — SET_METADATA, not EMPTY (ADVICE r7)."""
    from postrack_spark.streaming.delta_log import (
        history_delta,
        set_clustering_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_hist_dom_")
    write_delta(_df(spark, 0, 5), t)
    v = set_clustering_delta(t, ["k", "v"])
    ops = {r["version"]: r["operation"]
           for r in history_delta(spark, t).collect()}
    assert ops[v] == "SET_METADATA"


# ----------------------------------------- multi-part checkpoints (r8)


def test_multipart_checkpoint_roundtrip_distributed(spark):
    """parts=N writes the protocol's multi-part layout from a
    distributed frame; replay seeds from the full part set and the
    cleaned log reads back exactly."""
    import json as _json

    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_mpcp_")
    write_delta(_df(spark, 0, 30).repartition(5), t)
    write_delta(_df(spark, 30, 60).repartition(5), t)
    v = checkpoint_delta(t, parts=3, spark=spark)
    assert v == 1
    log = os.path.join(t, "_delta_log")
    parts = sorted(n for n in os.listdir(log)
                   if ".checkpoint." in n and n.endswith(".parquet"))
    assert parts == [
        f"{1:020d}.checkpoint.{i:010d}.{3:010d}.parquet"
        for i in (1, 2, 3)]
    with open(os.path.join(log, "_last_checkpoint")) as f:
        assert _json.load(f)["parts"] == 3
    clean_log_delta(t)
    assert not any(n.endswith(".json") and n[0].isdigit()
                   for n in os.listdir(log))
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == list(range(60))
    # the table keeps working past the checkpoint
    write_delta(_df(spark, 60, 70), t)
    assert read_delta(spark, t).count() == 70


def test_multipart_checkpoint_driver_fallback_and_dv(spark):
    """No session passed -> sequential part writes, same layout; DV
    descriptors and row-level deletes survive the part split."""
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
    )
    from postrack_spark.streaming.deletion_vectors import delete_delta_dv

    t = tempfile.mkdtemp(prefix="delta_mpcp_dv_")
    write_delta(_df(spark, 0, 40).repartition(4), t)
    delete_delta_dv(spark, t, "k % 5 = 0")
    checkpoint_delta(t, parts=2)
    clean_log_delta(t)
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == [k for k in range(40) if k % 5 != 0]


def test_multipart_checkpoint_incomplete_set_refused(spark):
    """Reading half a checkpoint would silently drop live files — an
    incomplete part set must raise, never partially load."""
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_mpcp_bad_")
    write_delta(_df(spark, 0, 20).repartition(4), t)
    checkpoint_delta(t, parts=4, spark=spark)
    clean_log_delta(t)
    log = os.path.join(t, "_delta_log")
    victim = next(n for n in sorted(os.listdir(log))
                  if ".checkpoint.0000000002." in n)
    os.remove(os.path.join(log, victim))
    with pytest.raises(ValueError, match="incomplete"):
        read_delta(spark, t)


def test_multipart_checkpoint_carries_table_state(spark):
    """partitionColumns, configuration (CHECK constraints), and
    domainMetadata all ride the multi-part checkpoint — the declared-
    schema drop trap, re-verified on the split layout."""
    from postrack_spark.streaming.delta_log import (
        _partition_columns,
        add_check_constraint_delta,
        checkpoint_delta,
        clean_log_delta,
        read_delta,
        set_clustering_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_mpcp_state_")
    write_delta(_df(spark, 0, 40), t, partition_by=["v"])
    add_check_constraint_delta(spark, t, "k_nonneg", "k >= 0")
    set_clustering_delta(t, ["k", "v"])
    checkpoint_delta(t, parts=3, spark=spark)
    clean_log_delta(t)
    assert _partition_columns(t) == ["v"]
    from postrack_spark.streaming.delta_log import _domain_configs, _replay

    _l, _s, _v, _t2, config = _replay(t, None)
    assert config.get("delta.constraints.k_nonneg") == "k >= 0"
    assert "delta.clustering" in _domain_configs(t)
    # the constraint still gates writes sourced from checkpoint state
    with pytest.raises(ValueError, match="CHECK constraint"):
        write_delta(_df(spark, -5, -1), t)
    stats: dict = {}
    read_delta(spark, t, partition_filter={"v": "4"}, scan_stats=stats)
    assert 0 < stats["files_scanned"] < stats["files_total"]


# --------------------------------------- column mapping mode 'id' (r8)


def test_column_mapping_id_mode_lifecycle(spark):
    """mode 'id': writes stamp parquet.field.id into the data files,
    reads resolve BY ID, rename/drop stay metadata-only, and the ids
    survive a checkpoint + clean_log."""
    import glob

    import pyarrow.parquet as pq

    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
        drop_column_delta,
        enable_column_mapping_delta,
        rename_column_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cmid_")
    empty = spark.range(0).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_delta(empty, t)
    enable_column_mapping_delta(t, mode="id")
    write_delta(_df(spark, 0, 20).repartition(2), t)
    # physical uuid names + parquet field ids present in the bytes
    data = [f for f in glob.glob(t + "/part-*.parquet")
            if pq.ParquetFile(f).metadata.num_rows > 0]
    sch = pq.ParquetFile(data[0]).schema_arrow
    assert all(n.startswith("col-") for n in sch.names)
    ids = {dict(f.metadata or {}).get(b"PARQUET:field_id") for f in sch}
    assert ids == {b"1", b"2"}
    rename_column_delta(t, "v", "val")
    got = {r["k"]: r["val"] for r in read_delta(spark, t).collect()}
    assert got == {k: 2 * k for k in range(20)}
    # post-rename writes keep stamping the SAME ids
    write_delta(spark.range(20, 25).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")), t)
    assert read_delta(spark, t).count() == 25
    # checkpoint survival: schema metadata (ids + physical names) ride
    checkpoint_delta(t, parts=2)
    clean_log_delta(t)
    got = {r["k"]: r["val"] for r in read_delta(spark, t).collect()}
    assert got == {k: 2 * k for k in range(25)}
    rename_column_delta(t, "val", "doubled")
    assert read_delta(spark, t).columns == ["k", "doubled"]
    drop_column_delta(t, "doubled")
    assert read_delta(spark, t).columns == ["k"]


def test_column_mapping_id_mode_refuses_table_with_data(spark):
    from postrack_spark.streaming.delta_log import (
        enable_column_mapping_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cmid_ref_")
    write_delta(_df(spark, 0, 5), t)
    with pytest.raises(NotImplementedError, match="id mode on new tables"):
        enable_column_mapping_delta(t, mode="id")
    # and a mode change on an already-mapped table refuses
    t2 = tempfile.mkdtemp(prefix="delta_cmid_ref2_")
    write_delta(_df(spark, 0, 5), t2)
    enable_column_mapping_delta(t2)  # name mode
    with pytest.raises(ValueError, match="already maps"):
        enable_column_mapping_delta(t2, mode="id")


def test_v2_spec_checkpoint_roundtrip(spark):
    """V2 spec checkpoints: a uuid-named top-level file (non-file
    actions + checkpointMetadata + sidecarFile pointers) with the add
    actions in _delta_log/_sidecars/ parquet — replay resolves the
    layout, the cleaned log reads back exactly, and table state
    (partitioning, constraints via config, domains) rides the top
    file."""
    from postrack_spark.streaming.delta_log import (
        _partition_columns,
        checkpoint_delta,
        clean_log_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_v2cp_")
    write_delta(_df(spark, 0, 30).repartition(3), t, partition_by=["v"])
    write_delta(_df(spark, 30, 50).repartition(2), t)
    cp = checkpoint_delta(t, v2=True, parts=2)
    log = os.path.join(t, "_delta_log")
    tops = [n for n in os.listdir(log)
            if n.startswith(f"{cp:020d}.checkpoint.")
            and n.endswith(".parquet")]
    assert len(tops) == 1 and len(tops[0].split(".")) == 4
    sidecars = os.listdir(os.path.join(log, "_sidecars"))
    assert len(sidecars) == 2
    clean_log_delta(t)
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == list(range(50))
    assert _partition_columns(t) == ["v"]
    stats: dict = {}
    read_delta(spark, t, partition_filter={"v": "4"}, scan_stats=stats)
    assert 0 < stats["files_scanned"] < stats["files_total"]
    # the table keeps working past the v2 checkpoint
    write_delta(_df(spark, 50, 60), t)
    assert read_delta(spark, t).count() == 60


def test_rechekpointing_with_different_parts_does_not_brick(spark):
    """Re-running a maintenance checkpoint with a tuned parts setting
    leaves two complete sets at one version — readers serve any
    complete set instead of raising (review r8 finding 2)."""
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta,
        clean_log_delta,
    )

    t = tempfile.mkdtemp(prefix="delta_cp_two_")
    write_delta(_df(spark, 0, 40).repartition(4), t)
    checkpoint_delta(t, parts=3, spark=spark)
    checkpoint_delta(t, parts=2, spark=spark)
    clean_log_delta(t)
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(
        range(40))


def test_creating_write_lost_v0_race_to_partitioned_creator(spark, monkeypatch):
    """A creating write that loses the v0 race to a PARTITIONED
    creator must conflict — its staged adds carry no partitionValues,
    so committing them would silently un-prune every partition-
    filtered read (review r8 finding 4)."""
    from postrack_spark.streaming import delta_log

    table = tempfile.mkdtemp(prefix="delta_pc_race_")
    orig = delta_log._write_data_files
    fired = {"done": False}

    def inject(df, tbl, **kw):
        adds = orig(df, tbl, **kw)
        if not fired["done"]:
            fired["done"] = True
            write_delta(_df(spark, 100, 120), table, partition_by=["v"])
        return adds

    monkeypatch.setattr(delta_log, "_write_data_files", inject)
    with pytest.raises(DeltaCommitConflict, match="partitioning"):
        write_delta(_df(spark, 0, 10), table)
    # the winner's partitioned table is intact and prunable
    stats: dict = {}
    read_delta(spark, table, partition_filter={"v": "200"},
               scan_stats=stats)
    assert 0 < stats["files_scanned"] < stats["files_total"]


def test_log_compaction_replay_and_reclaim(spark):
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta, clean_log_delta, compact_log_delta)

    t = tempfile.mkdtemp(prefix="delta_lc_")
    write_delta(_df(spark, 0, 5), t)                      # v0
    write_delta(_df(spark, 5, 8), t, mode="append")       # v1
    write_delta(_df(spark, 100, 103), t, mode="overwrite")  # v2 (removes)
    write_delta(_df(spark, 103, 105), t, mode="append")   # v3
    before = sorted(r["k"] for r in read_delta(spark, t).collect())

    out = compact_log_delta(t)
    assert out is not None and out.endswith(
        "00000000000000000000.00000000000000000003.compacted.json")
    # parity: replay through the compacted file == raw-JSON replay
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == before
    # time travel INSIDE the range still resolves via the raw JSONs
    assert sorted(r["k"] for r in read_delta(spark, t, version=1).collect()) \
        == list(range(8))

    # the compacted file is actually load-bearing: punch a hole in the
    # covered range and the latest snapshot must still resolve
    os.remove(_log_path(t, 1))
    os.remove(_log_path(t, 2))
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == before

    # a checkpoint at-or-above the range end retires the compacted file
    checkpoint_delta(t)
    deleted = clean_log_delta(t)
    assert os.path.basename(out) in deleted
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == before


def test_log_compaction_refuses_holes_and_degenerate_ranges(spark):
    from postrack_spark.streaming.delta_log import compact_log_delta

    t = tempfile.mkdtemp(prefix="delta_lch_")
    write_delta(_df(spark, 0, 3), t)
    assert compact_log_delta(t) is None  # single-commit range: pointless
    write_delta(_df(spark, 3, 6), t, mode="append")
    write_delta(_df(spark, 6, 9), t, mode="append")
    os.remove(_log_path(t, 1))
    with pytest.raises(FileNotFoundError):
        compact_log_delta(t, start=0, end=2)


def test_version_checksum_validates_and_detects_corruption(spark):
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta, clean_log_delta, validate_crc_delta,
        write_crc_delta)

    t = tempfile.mkdtemp(prefix="delta_crc_")
    write_delta(_df(spark, 0, 5), t)
    write_delta(_df(spark, 5, 8), t, mode="append")
    p0 = write_crc_delta(t, version=0)
    p1 = write_crc_delta(t)
    got = validate_crc_delta(t)
    assert got["numFiles"] >= 2 and got["tableSizeBytes"] > 0
    validate_crc_delta(t, version=0)
    # tamper: a digest from DIFFERENT state must be rejected
    with open(p1) as f:
        crc = json.load(f)
    crc["numFiles"] += 1
    with open(p1, "w") as f:
        json.dump(crc, f)
    with pytest.raises(ValueError, match="numFiles"):
        validate_crc_delta(t)
    # cleanup: pre-checkpoint digests go with their commits; the
    # checkpoint version's own digest stays readable
    write_crc_delta(t)  # restore the good digest
    checkpoint_delta(t)
    deleted = clean_log_delta(t)
    assert os.path.basename(p0) in deleted
    assert os.path.exists(p1)
    validate_crc_delta(t)  # replay-from-checkpoint digest still matches


def test_default_columns_fill_and_gate(spark):
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta, clean_log_delta, drop_column_delta)

    t = tempfile.mkdtemp(prefix="delta_dflt_")
    base = spark.range(0, 4).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.lit("eu").alias("region"))
    # 'score' is declared-with-default but absent from the creating
    # batch: filled at creation; 'region' present: provided wins
    write_delta(base, t, defaults={"region": "'unknown'", "score": "7"})
    got = {r["k"]: (r["region"], r["score"])
           for r in read_delta(spark, t).collect()}
    assert got[0] == ("eu", 7)
    # later write omitting BOTH defaulted columns: filled
    write_delta(
        spark.range(10, 12).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("v")),
        t, mode="append")
    got = {r["k"]: (r["region"], r["score"])
           for r in read_delta(spark, t).collect()}
    assert got[10] == ("unknown", 7)
    # provided value wins over the default
    write_delta(
        spark.range(20, 21).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("v"),
                                   F.lit("us").alias("region"),
                                   F.lit(99).cast("int").alias("score")),
        t, mode="append")
    assert {r["region"] for r in read_delta(spark, t).collect()} \
        == {"eu", "unknown", "us"}
    # re-declaration raises (creation-only, the generated-columns rule)
    with pytest.raises(ValueError, match="declared at table creation"):
        write_delta(base, t, mode="append", defaults={"region": "'x'"})
    # declarations survive the checkpoint (they ride schemaString)
    checkpoint_delta(t)
    clean_log_delta(t)
    write_delta(
        spark.range(30, 31).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("v")),
        t, mode="append")
    got = {r["k"]: (r["region"], r["score"])
           for r in read_delta(spark, t).collect()}
    assert got[30] == ("unknown", 7)
    # the streaming hook fills too (call the foreachBatch fn directly)
    fb = foreach_batch_delta(t, mode="append")
    fb(spark.range(40, 41).select(F.col("id").alias("k"),
                                  (F.col("id") * 2).alias("v")), 0)
    got = {r["k"]: (r["region"], r["score"])
           for r in read_delta(spark, t).collect()}
    assert got[40] == ("unknown", 7)


def test_default_expr_reference_blocks_drop(spark):
    from postrack_spark.streaming.delta_log import drop_column_delta

    from postrack_spark.streaming.delta_log import enable_column_mapping_delta

    t = tempfile.mkdtemp(prefix="delta_dfltref_")
    write_delta(
        spark.range(0, 3).select(F.col("id").alias("k"),
                                 (F.col("id") * 2).alias("v")),
        t, defaults={"twice": "v * 2"})
    enable_column_mapping_delta(t)
    with pytest.raises(ValueError, match="default of column"):
        drop_column_delta(t, "v")


def test_identity_columns_assign_and_advance(spark):
    from postrack_spark.streaming.delta_log import (
        checkpoint_delta, clean_log_delta)

    t = tempfile.mkdtemp(prefix="delta_idy_")
    write_delta(_df(spark, 0, 6), t, identity={"rid": {"start": 10, "step": 5}})
    rids = sorted(r["rid"] for r in read_delta(spark, t).collect())
    assert rids == [10, 15, 20, 25, 30, 35]
    # the high-water mark advances commit over commit: no collisions
    write_delta(_df(spark, 6, 9), t, mode="append")
    rids = sorted(r["rid"] for r in read_delta(spark, t).collect())
    assert len(rids) == 9 and len(set(rids)) == 9
    assert rids[:6] == [10, 15, 20, 25, 30, 35] and rids[6] == 40
    # GENERATED ALWAYS: explicit values refused
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(
            _df(spark, 100, 101).withColumn("rid", F.lit(1)), t,
            mode="append")
    # creation-only declaration
    with pytest.raises(ValueError, match="declared at table creation"):
        write_delta(_df(spark, 100, 101), t, mode="append",
                    identity={"rid": {"start": 1, "step": 1}})
    # the streaming hook refuses identity tables (hwm allocation)
    from postrack_spark.streaming.delta_log import foreach_batch_delta as _fb
    with pytest.raises(NotImplementedError, match="identity"):
        _fb(t)(_df(spark, 200, 201), 0)
    # declarations + hwm ride the checkpoint
    checkpoint_delta(t)
    clean_log_delta(t)
    write_delta(_df(spark, 9, 10), t, mode="append")
    rids = sorted(r["rid"] for r in read_delta(spark, t).collect())
    assert len(rids) == 10 and len(set(rids)) == 10
    assert max(rids) == 10 + 5 * 9


def test_table_features_protocol_roundtrip(spark):
    from postrack_spark.streaming.delta_log import (
        _current_protocol, checkpoint_delta, clean_log_delta,
        commit_delta, upgrade_protocol_delta)

    t = tempfile.mkdtemp(prefix="delta_tf_")
    write_delta(_df(spark, 0, 4), t)
    upgrade_protocol_delta(t, reader_features=("columnMapping",),
                           writer_features=("checkConstraints",))
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [0, 1, 2, 3]
    p = _current_protocol(t)
    assert p["minReaderVersion"] == 3 and "columnMapping" in p["readerFeatures"]
    assert "checkConstraints" in p["writerFeatures"]
    # upgrades merge, never drop
    upgrade_protocol_delta(t, reader_features=("deletionVectors",))
    p = _current_protocol(t)
    assert {"columnMapping", "deletionVectors"} <= set(p["readerFeatures"])
    # feature lists survive the checkpoint (the declared-schema trap)
    checkpoint_delta(t)
    clean_log_delta(t)
    p = _current_protocol(t)
    assert {"columnMapping", "deletionVectors"} <= set(p["readerFeatures"])
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [0, 1, 2, 3]
    # an unknown REQUIRED reader feature refuses the read (spec rule)
    v = write_delta(_df(spark, 4, 5), t, mode="append")
    commit_delta(t, v + 1, [{"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["futureMagic"], "writerFeatures": []}}])
    with pytest.raises(ValueError, match="futureMagic"):
        read_delta(spark, t).collect()
    # declaring features we can't honor raises
    t2 = tempfile.mkdtemp(prefix="delta_tf2_")
    write_delta(_df(spark, 0, 2), t2)
    with pytest.raises(ValueError, match="could not read"):
        upgrade_protocol_delta(t2, reader_features=("futureMagic",))


def test_describe_detail_surface(spark):
    from postrack_spark.streaming.delta_log import (
        detail_delta, upgrade_protocol_delta)

    t = tempfile.mkdtemp(prefix="delta_detail_")
    df = spark.range(0, 8).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p"))
    write_delta(df, t, partition_by=["p"])
    upgrade_protocol_delta(t, reader_features=("columnMapping",))
    d = detail_delta(spark, t).collect()[0]
    assert d["format"] == "delta" and d["id"]
    assert d["partitionColumns"] == ["p"]
    assert d["numFiles"] >= 1 and d["sizeInBytes"] > 0
    assert d["minReaderVersion"] == 3
    assert "columnMapping" in d["readerFeatures"]
    assert d["createdAt"] is not None and d["lastModified"] is not None


def test_foreach_coordinated_log_compaction(spark):
    from postrack_spark.streaming.delta_log import foreach_batch_delta

    t = tempfile.mkdtemp(prefix="delta_autolc_")
    fb = foreach_batch_delta(t, log_compaction_every=3)
    for i in range(7):
        fb(_df(spark, i * 2, i * 2 + 2), i)
    log = os.path.join(t, "_delta_log")
    comp = sorted(f for f in os.listdir(log) if f.endswith(".compacted.json"))
    # commits 0..6 -> compactions after v2 and v5: [0,2] and [3,5]
    assert comp == [
        "00000000000000000000.00000000000000000002.compacted.json",
        "00000000000000000003.00000000000000000005.compacted.json",
    ]
    # replay still correct through the compacted ranges
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == list(range(14))
    # and actually load-bearing: remove raw commits inside both ranges
    for v in (1, 4):
        os.remove(_log_path(t, v))
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == list(range(14))


def test_compacted_ranges_serve_sibling_metadata_walkers(spark):
    """Review-finding regression: deleting raw commits inside a
    compacted range must not blind the column-pruned walkers —
    partitioning, domain metadata, and the protocol all resolve
    through the compacted file, and the NEXT write still inherits the
    partitioning (a blinded walker would commit partitionValues-less
    adds and corrupt the table layout for good)."""
    from postrack_spark.streaming.delta_log import (
        _current_protocol, _domain_configs, _partition_columns,
        compact_log_delta, read_delta, set_clustering_delta,
        upgrade_protocol_delta)

    t = tempfile.mkdtemp(prefix="delta_lcwalk_")
    df = spark.range(0, 8).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p"))
    write_delta(df, t, partition_by=["p"])                       # v0
    set_clustering_delta(t, ["k", "p"])                               # v1
    upgrade_protocol_delta(t, reader_features=("columnMapping",))  # v2
    write_delta(
        spark.range(8, 10).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p")),
        t, mode="append")                                        # v3
    compact_log_delta(t)                                         # [0,3]
    for v in (0, 1, 2):
        os.remove(_log_path(t, v))
    assert _partition_columns(t) == ["p"]
    assert "delta.clustering" in _domain_configs(t)
    assert "columnMapping" in (
        _current_protocol(t).get("readerFeatures") or [])
    # a mid-range hole (raw 3 kept, 0-2 gone) resolves via the
    # covering range and the next write INHERITS partitioning
    write_delta(
        spark.range(20, 22).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p")),
        t, mode="append")
    import json as _json
    newest = max(
        int(f[:-5]) for f in os.listdir(os.path.join(t, "_delta_log"))
        if f.endswith(".json") and f[:-5].isdigit())
    with open(_log_path(t, newest)) as f:
        adds = [_json.loads(ln)["add"] for ln in f
                if ln.strip() and "add" in _json.loads(ln)]
    assert adds and all(a.get("partitionValues") for a in adds)
    got = sorted(r["k"] for r in read_delta(
        spark, t, partition_filter={"p": ["0"]}).collect())
    assert got == [0, 2, 4, 6, 8, 20]


def test_vacuum_dry_run_deletes_nothing(spark):
    t = tempfile.mkdtemp(prefix="delta_vdr_")
    write_delta(_df(spark, 0, 4), t)
    write_delta(_df(spark, 100, 103), t, mode="overwrite")
    write_delta(_df(spark, 200, 203), t, mode="overwrite")
    would = vacuum_delta(t, retain_versions=1, dry_run=True)
    assert would  # the overwritten files are reclaimable
    for name in would:
        assert os.path.exists(os.path.join(t, name))
    # time travel still works after a dry run
    assert sorted(r["k"] for r in read_delta(spark, t, version=0).collect()) \
        == [0, 1, 2, 3]
    real = vacuum_delta(t, retain_versions=1)
    assert sorted(real) == sorted(would)
    for name in real:
        assert not os.path.exists(os.path.join(t, name))
