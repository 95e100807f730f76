"""Unit tests for the pure-stdlib pgwire framing layer — no server.

The stalled-server timeout test covers ADVICE r4 (low): once a partial
message header was buffered, the old _recv_exact skipped the select()
wait and blocked indefinitely in sock.recv, so read_replication_message's
timeout (and therefore the daemon's SIGTERM stop() recheck) was never
honored. The fix must (a) return within the timeout even mid-message and
(b) consume nothing on timeout, so the next call resumes cleanly.
"""

from __future__ import annotations

import socket
import struct
import time

from postrack_spark.sources.pgwire import PgWireConnection


def _bare_connection(sock: socket.socket) -> PgWireConnection:
    conn = object.__new__(PgWireConnection)
    conn.sock = sock
    conn._buf = b""
    return conn


def _msg(mtype: bytes, payload: bytes) -> bytes:
    return mtype + struct.pack(">i", len(payload) + 4) + payload


def test_recv_message_timeout_with_partial_header_buffered():
    client, server = socket.socketpair()
    try:
        conn = _bare_connection(client)
        frame = _msg(b"k", b"\x01\x02\x03")
        server.sendall(frame[:3])  # partial header (3 of 5 bytes), then stall
        t0 = time.monotonic()
        mtype, payload = conn._recv_message(timeout=0.25)
        elapsed = time.monotonic() - t0
        assert (mtype, payload) == (None, None)
        assert elapsed < 2.0  # returned by the deadline, did not hang
        assert conn._buf == frame[:3]  # nothing consumed on timeout
        server.sendall(frame[3:])  # server wakes up: message completes
        assert conn._recv_message(timeout=1.0) == (b"k", b"\x01\x02\x03")
    finally:
        client.close()
        server.close()


def test_recv_message_timeout_mid_payload_then_resume():
    client, server = socket.socketpair()
    try:
        conn = _bare_connection(client)
        payload = b"\xaa" * 64
        frame = _msg(b"d", payload)
        server.sendall(frame[:20])  # header + part of the payload, stall
        t0 = time.monotonic()
        assert conn._recv_message(timeout=0.25) == (None, None)
        assert time.monotonic() - t0 < 2.0
        server.sendall(frame[20:])  # server wakes up
        mtype, got = conn._recv_message(timeout=1.0)
        assert mtype == b"d" and got == payload  # no desync, exactly once
        # and the buffer is empty afterwards
        assert conn._buf == b""
    finally:
        client.close()
        server.close()


def test_recv_message_blocking_path_unchanged():
    client, server = socket.socketpair()
    try:
        conn = _bare_connection(client)
        server.sendall(_msg(b"Z", b"I") + _msg(b"C", b"SELECT 1\x00"))
        assert conn._recv_message() == (b"Z", b"I")
        assert conn._recv_message() == (b"C", b"SELECT 1\x00")
    finally:
        client.close()
        server.close()
