"""Kafka-shaped capture transport: contract tests over a fake broker
(no broker/client in the container — the producer is a duck type, see
sources/kafka_transport.py). The writer shares FrameFileWriter's whole
rolling machine, so the assertions here mirror the file-transport
properties in test_capture.py: per-unit exactly-once decode across
rolls, stream-segment safety, and ack-after-durable under injected
broker failures with at-least-once retry + seq-key dedup."""

from __future__ import annotations

import pytest

from postrack_spark.sources.capture import (
    FrameFileWriter,
    capture_loop,
    make_xlogdata_frame,
)
from postrack_spark.sources.kafka_transport import (
    KafkaFrameWriter,
    decode_topic_messages,
)
from postrack_spark.sources.pgoutput import DecoderState, decode_xlogdata_stream
from tests.test_capture import _golden_messages, _stream_fixture_tools
from tests.test_pgoutput import golden_frames


class FakeBroker:
    """In-memory topic log implementing the producer duck type, with
    failure injection on flush (unacked sends are dropped, as a dead
    broker would drop them)."""

    def __init__(self):
        self.topics: dict[str, list[tuple[bytes, bytes]]] = {}
        self._unacked: list[tuple[str, bytes, bytes]] = []
        self.fail_next_flush = False
        self.flushes = 0

    def send(self, topic: str, key: bytes, value: bytes) -> None:
        self._unacked.append((topic, key, value))

    def flush(self) -> None:
        self.flushes += 1
        if self.fail_next_flush:
            self.fail_next_flush = False
            self._unacked.clear()  # in-flight batch lost with the error
            raise ConnectionError("injected broker failure")
        for topic, key, value in self._unacked:
            self.topics.setdefault(topic, []).append((key, value))
        self._unacked.clear()

    def resume_seq(self, topic: str) -> int:
        import struct

        msgs = self.topics.get(topic, [])
        if not msgs:
            return 0
        return max(struct.unpack(">Q", k)[0] for k, _ in msgs) + 1

    def resume_frames(self, topic: str) -> list[bytes]:
        """Tail message's frames — the restart-rebuild contract (the
        consumer-side re-read a real deployment would do)."""
        from postrack_spark.sources.postgres_cdc import blob_to_frames

        msgs = self.topics.get(topic, [])
        if not msgs:
            return []
        import struct

        _, value = max(msgs, key=lambda kv: struct.unpack(">Q", kv[0])[0])
        return blob_to_frames(value)


def test_topic_messages_decode_like_direct_stream():
    broker = FakeBroker()
    writer = KafkaFrameWriter(broker, "wal", max_frames=3)  # many rolls
    capture_loop(iter(_golden_messages()), writer, ack=lambda lsn: None)
    got = decode_topic_messages(broker.topics["wal"])
    want = decode_xlogdata_stream(golden_frames(), DecoderState())
    assert [(r["op"], r["lsn"]) for r in got] == [(r["op"], r["lsn"]) for r in want]
    assert len(broker.topics["wal"]) > 1  # rolling actually happened


def test_streamed_transaction_exactly_once_across_messages():
    # the v2 stream-spanning-rolls property transfers from files to
    # messages (same writer machine, different _persist)
    (_, _, enc_ins, enc_rel, enc_sc, enc_ss, enc_se,
     sx, w, COLS, TS) = _stream_fixture_tools()
    broker = FakeBroker()
    writer = KafkaFrameWriter(broker, "wal", max_frames=10_000)
    for f in [
        w(enc_rel(101, "public", "orders", COLS), 1),
        w(enc_ss(900, True), 10),
        w(sx(enc_ins(101, ["1", "O", "10.00"]), 900), 11),
        w(enc_se(), 12),
    ]:
        writer.append(f)
    writer.flush()  # roll between segments
    for f in [
        w(enc_ss(900, False), 20),
        w(sx(enc_ins(101, ["2", "O", "20.00"]), 900), 21),
        w(enc_se(), 22),
        w(enc_sc(900, 30, 30, TS), 30),
    ]:
        writer.append(f)
    writer.close()
    rows = decode_topic_messages(broker.topics["wal"])
    assert sorted(r["lsn"] for r in rows) == [11, 21]
    assert all(r["txid"] == 900 for r in rows)


def test_flush_failure_holds_ack_then_retry_dedupes():
    broker = FakeBroker()
    writer = KafkaFrameWriter(broker, "wal", max_frames=10_000)
    msgs = _golden_messages()
    half = len(msgs) // 2
    for m in msgs[:half]:
        writer.append(make_xlogdata_frame(m.payload, m.data_start,
                                          m.wal_end, m.send_time_us))
    broker.fail_next_flush = True
    with pytest.raises(ConnectionError):
        writer.flush()
    # ack-after-durable: nothing acked, nothing advanced
    assert writer.durable_lsn == 0
    assert "wal" not in broker.topics
    pre_retry_seq = writer.seq
    writer.flush()  # daemon retry: same seq, same blob
    assert writer.seq == pre_retry_seq + 1
    assert writer.durable_lsn > 0
    for m in msgs[half:]:
        writer.append(make_xlogdata_frame(m.payload, m.data_start,
                                          m.wal_end, m.send_time_us))
    writer.close()
    # duplicate-delivery hardening: replay message 0 as a broker would
    # on at-least-once redelivery; the consumer dedupes on seq
    broker.topics["wal"].append(broker.topics["wal"][0])
    rows = decode_topic_messages(broker.topics["wal"])
    want = decode_xlogdata_stream(golden_frames(), DecoderState())
    assert [(r["op"], r["lsn"]) for r in rows] == [
        (r["op"], r["lsn"]) for r in want]


def test_resume_seq_from_broker_continues_sequence():
    broker = FakeBroker()
    w1 = KafkaFrameWriter(broker, "wal", max_frames=3)
    capture_loop(iter(_golden_messages()), w1, ack=lambda lsn: None)
    n1 = len(broker.topics["wal"])
    w2 = KafkaFrameWriter(broker, "wal", max_frames=3)  # daemon restart
    assert w2.seq == n1  # resumes after the broker's last key
    capture_loop(iter(_golden_messages()), w2, ack=lambda lsn: None)
    keys = [k for k, _ in broker.topics["wal"]]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)


def test_file_and_kafka_transports_emit_identical_blobs():
    import tempfile

    from postrack_spark.sources.postgres_cdc import read_frame_file

    d = tempfile.mkdtemp(prefix="xport_cmp_")
    fw = FrameFileWriter(d, max_frames=3)
    capture_loop(iter(_golden_messages()), fw, ack=lambda lsn: None)
    broker = FakeBroker()
    kw = KafkaFrameWriter(broker, "wal", max_frames=3)
    capture_loop(iter(_golden_messages()), kw, ack=lambda lsn: None)
    import os

    from postrack_spark.sources.postgres_cdc import blob_to_frames

    file_units = [
        read_frame_file(os.path.join(d, f))
        for f in sorted(os.listdir(d)) if f.endswith(".pgout")
    ]
    topic_units = [blob_to_frames(v) for _, v in broker.topics["wal"]]
    assert file_units == topic_units  # same rolls, byte for byte


def test_kafka_restart_across_open_prepared_txn_rebuilds_cache():
    """Transport parity for the two-phase crash window: a restart
    between the flushed Prepare and its CommitPrepared must replay the
    broker tail message through the cache rebuild, or the K-only
    message's transaction rows emit nowhere."""
    from tests.test_capture import _Msg, _two_phase_frames

    frames = _two_phase_frames()
    p_idx = next(i for i, f in enumerate(frames) if f[25:26] == b"P")
    broker = FakeBroker()
    w1 = KafkaFrameWriter(broker, "wal", max_frames=10_000)
    for f in frames[:p_idx + 1]:
        w1.append(f)
    w1.flush()
    assert w1.durable_lsn >= 13
    # crash; restart pulls resume_frames from the broker tail
    w2 = KafkaFrameWriter(broker, "wal", max_frames=4)
    capture_loop(
        iter([_Msg(f) for f in frames[p_idx + 1:]]), w2,
        ack=lambda lsn: None,
    )
    rows = decode_topic_messages(broker.topics["wal"])
    g1 = [r for r in rows if r["txid"] == 800]
    assert [r["after"]["o_orderkey"] for r in g1] == ["1", "2"]
    assert all(r["after"]["o_orderkey"] != "9" for r in rows)
