"""Capture daemon: frame pump, self-contained file rolling, durable-ack
ordering — all without a server (injected source/ack/clock), plus a
golden end-to-end check that daemon-written files decode through the
postgres_cdc DataSource exactly like the direct decode. A live
round-trip runs only when POSTRACK_TEST_DSN points at a Postgres with
logical replication enabled."""

from __future__ import annotations

import os
import tempfile

import pytest

from postrack_spark.sources.capture import FrameFileWriter, capture_loop
from postrack_spark.sources.pgoutput import DecoderState, decode_xlogdata_stream
from postrack_spark.sources.postgres_cdc import read_frame_file
from tests.test_pgoutput import golden_frames


class _Msg:
    def __init__(self, frame: bytes):
        # split a wrapped 'w' frame back into the message attributes a
        # replication client hands the daemon
        import struct

        self.data_start, self.wal_end, self.send_time_us = struct.unpack_from(
            ">qqq", frame, 1
        )
        self.payload = frame[25:]


def _golden_messages():
    return [_Msg(f) for f in golden_frames() if f[:1] == b"w"]


def _decode_dir(d: str) -> list[dict]:
    state = DecoderState()
    rows = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".pgout"):
            rows.extend(
                decode_xlogdata_stream(read_frame_file(os.path.join(d, name)), state)
            )
    return rows


def test_daemon_files_decode_like_direct_stream():
    d = tempfile.mkdtemp(prefix="daemon_")
    writer = FrameFileWriter(d, max_frames=3)  # force several rolls
    capture_loop(iter(_golden_messages()), writer, ack=lambda lsn: None)
    got = _decode_dir(d)
    want = decode_xlogdata_stream(golden_frames(), DecoderState())
    assert [(r["op"], r["lsn"]) for r in got] == [(r["op"], r["lsn"]) for r in want]
    assert len(os.listdir(d)) > 1  # rolling actually happened


def test_rolled_files_are_self_contained():
    # contract clause 3: EVERY file must decode alone — cached Relation
    # frames are re-sent at each file head, like Postgres per-session
    d = tempfile.mkdtemp(prefix="daemon_sc_")
    writer = FrameFileWriter(d, max_frames=3)
    capture_loop(iter(_golden_messages()), writer, ack=lambda lsn: None)
    files = sorted(f for f in os.listdir(d) if f.endswith(".pgout"))
    decoded_any = False
    for name in files[1:]:  # every non-first file, fresh decoder state
        rows = decode_xlogdata_stream(
            read_frame_file(os.path.join(d, name)), DecoderState()
        )
        state = DecoderState()
        decode_xlogdata_stream(read_frame_file(os.path.join(d, name)), state)
        assert state.parse_errors == 0, f"{name} not self-contained"
        decoded_any = decoded_any or bool(rows)
    assert decoded_any


def test_rolling_defers_past_open_transaction():
    # Begin..Commit never straddles a durable-ack boundary: the roll
    # requested mid-transaction happens at the Commit frame
    d = tempfile.mkdtemp(prefix="daemon_tx_")
    writer = FrameFileWriter(d, max_frames=2)  # request roll immediately
    msgs = _golden_messages()
    capture_loop(iter(msgs), writer, ack=lambda lsn: None)
    for name in sorted(os.listdir(d)):
        kinds = [
            f[25:26]
            for f in read_frame_file(os.path.join(d, name))
            if f[:1] == b"w"
        ]
        # a file containing a Begin must contain its Commit
        if b"B" in kinds:
            assert b"C" in kinds, f"{name} splits a transaction"


def test_ack_only_after_durable_flush():
    d = tempfile.mkdtemp(prefix="daemon_ack_")
    writer = FrameFileWriter(d, max_frames=10_000)  # never roll on size
    acks: list[int] = []
    clock = {"t": 0.0}

    def fake_clock():
        clock["t"] += 3.0  # each loop step advances 3 s
        return clock["t"]

    capture_loop(
        iter(_golden_messages()),
        writer,
        ack=acks.append,
        ack_interval_s=5.0,
        clock=fake_clock,
    )
    assert acks, "no ack sent"
    # every ack must equal an LSN that was already durable on disk at
    # ack time; the final ack covers the whole stream
    assert acks[-1] == max(m.data_start for m in _golden_messages())
    assert sorted(acks) == acks
    # and the ack cadence flushed mid-stream, not only at close
    assert len(acks) > 1


def test_writer_resumes_sequence():
    d = tempfile.mkdtemp(prefix="daemon_seq_")
    w1 = FrameFileWriter(d, max_frames=3)
    capture_loop(iter(_golden_messages()), w1, ack=lambda lsn: None)
    first = sorted(os.listdir(d))
    w2 = FrameFileWriter(d, max_frames=3)
    capture_loop(iter(_golden_messages()), w2, ack=lambda lsn: None)
    after = sorted(os.listdir(d))
    assert after[: len(first)] == first  # nothing overwritten
    assert len(after) > len(first)
    assert after == sorted(after)  # still lexicographic stream order


def test_daemon_output_via_datasource(spark):
    # the real consumer: daemon-written dir -> postgres_cdc batch read
    from postrack_spark.sources.postgres_cdc import register

    d = tempfile.mkdtemp(prefix="daemon_ds_")
    writer = FrameFileWriter(d, max_frames=3)
    capture_loop(iter(_golden_messages()), writer, ack=lambda lsn: None)
    register(spark)
    df = spark.read.format("postgres_cdc").option("capture_dir", d).load()
    ops = [r["op"] for r in df.orderBy("lsn").collect()]
    assert ops == ["INSERT", "UPDATE", "UPDATE", "INSERT", "DELETE", "TRUNCATE"]


@pytest.mark.skipif(
    not os.environ.get("POSTRACK_TEST_DSN"),
    reason="live-Postgres integration: set POSTRACK_TEST_DSN to run",
)
def test_live_postgres_roundtrip(spark):  # pragma: no cover - env-gated
    """Full loop against a real server: provision slot+publication via
    PsycopgExecutor, write a row, run the daemon one ack cycle, read
    the frames back through the DataSource."""
    import threading

    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.sources.capture import PsycopgExecutor, run_daemon
    from postrack_spark.sources.postgres_cdc import register

    dsn = os.environ["POSTRACK_TEST_DSN"]
    ex = PsycopgExecutor(dsn)
    ex.command("DROP TABLE IF EXISTS public.postrack_it")
    ex.command("CREATE TABLE public.postrack_it (id int primary key, v text)")
    conn = Conn(dsn, executor=ex)
    conn.set_slot("postrack_it_slot")
    conn.set_publication(Table("public", "postrack_it"))
    ex.command("INSERT INTO public.postrack_it VALUES (1, 'a')")

    d = tempfile.mkdtemp(prefix="daemon_live_")
    stop = {"flag": False}
    t = threading.Thread(
        target=run_daemon,
        args=(dsn, "postrack_it_slot", d, create_publication_id("postrack_it_slot")),
        kwargs={"ack_interval_s": 1.0, "stop": lambda: stop["flag"]},
        daemon=True,
    )
    t.start()
    import time as _time

    _time.sleep(5)
    stop["flag"] = True
    t.join(10)

    register(spark)
    df = spark.read.format("postgres_cdc").option("capture_dir", d).load()
    assert df.filter("op = 'INSERT' and `table` = 'postrack_it'").count() >= 1


def test_daemon_then_streaming_resume_e2e(spark):
    """The full capture seam, twice over: daemon run 1 writes files ->
    Spark streams them (checkpointed); daemon run 2 RESUMES the file
    sequence (new writer, same dir — a daemon restart) -> the stream
    restart on the same checkpoint reads ONLY the new files. This is
    the deployment loop: capture restarts and stream restarts compose
    without duplicating or dropping events."""
    import struct

    from postrack_spark.sources.pgoutput import (
        encode_begin,
        encode_commit,
        encode_insert,
        encode_relation,
        wrap_xlogdata,
    )
    from tests.test_pgoutput import ORDERS_COLS, TS

    d = tempfile.mkdtemp(prefix="daemon_e2e_")
    ckpt = tempfile.mkdtemp(prefix="daemon_e2e_ckpt_")
    out = tempfile.mkdtemp(prefix="daemon_e2e_out_")

    writer = FrameFileWriter(d, max_frames=4)
    capture_loop(iter(_golden_messages()), writer, ack=lambda lsn: None)

    from postrack_spark.sources.postgres_cdc import register

    register(spark)

    def run_stream():
        stream = spark.readStream.format("postgres_cdc").option(
            "capture_dir", d
        ).load()
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    n1 = spark.read.parquet(out).count()
    assert n1 == 6  # the golden sequence's envelope rows

    # daemon restart: fresh writer resumes the file sequence
    more = [
        _Msg(wrap_xlogdata(encode_relation(101, "public", "orders", ORDERS_COLS), 50)),
        _Msg(wrap_xlogdata(encode_begin(50, TS, 901), 51)),
        _Msg(wrap_xlogdata(encode_insert(101, ["21", "O", "9.0"]), 52)),
        _Msg(wrap_xlogdata(encode_insert(101, ["22", "O", "9.5"]), 53)),
        _Msg(wrap_xlogdata(encode_commit(54, 54, TS), 54)),
    ]
    w2 = FrameFileWriter(d, max_frames=100)
    capture_loop(iter(more), w2, ack=lambda lsn: None)

    run_stream()
    final = spark.read.parquet(out)
    assert final.count() == n1 + 2  # exactly the two new inserts
    new_keys = {
        r["k"]
        for r in final.selectExpr("after['o_orderkey'] AS k").collect()
        if r["k"] in ("21", "22")
    }
    assert new_keys == {"21", "22"}
