"""Pure-stdlib PostgreSQL frontend: wire protocol v3 + logical
replication (CopyBoth), no psycopg.

The protocol is public (PostgreSQL documentation, "Frontend/Backend
Protocol" + "Streaming Replication Protocol"). This implements exactly
what the capture daemon needs against a trusted local server:

* startup + trust auth (password/SCRAM auth is out of scope — use the
  psycopg seam in capture.py for remote servers; this client exists so
  the in-container live round-trip runs with zero dependencies),
* simple Query ('Q') with text-format result sets — enough for catalog
  probes, DDL, DML, and walsender commands (CREATE_REPLICATION_SLOT,
  IDENTIFY_SYSTEM return plain result sets on a replication
  connection),
* START_REPLICATION ... LOGICAL -> CopyBothResponse, XLogData ('w')
  and primary-keepalive ('k') CopyData messages, StandbyStatusUpdate
  ('r') feedback — the duck-typed message surface capture.capture_loop
  consumes (payload / data_start / wal_end / send_time_us).

This mirrors the reference's two-connection split (postrack.go:93,98:
a pooled SQL connection + a ?replication=database connection):
``PgWireExecutor`` exposes the api.Executor protocol over two
PgWireConnections, so the full name-for-name api.py surface
(publications, slots, catalog probes) runs live without psycopg.
"""

from __future__ import annotations

import select
import socket
import struct
import time


class PgError(RuntimeError):
    """Server ErrorResponse, with the severity/code/message fields."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        super().__init__(
            f"{fields.get('S', 'ERROR')} {fields.get('C', '')}: "
            f"{fields.get('M', 'unknown')}"
        )


class ReplicationMessage:
    """Duck type for capture.capture_loop (see capture.py:185)."""

    __slots__ = ("payload", "data_start", "wal_end", "send_time_us")

    def __init__(self, payload: bytes, data_start: int, wal_end: int,
                 send_time_us: int) -> None:
        self.payload = payload
        self.data_start = data_start
        self.wal_end = wal_end
        self.send_time_us = send_time_us


def format_lsn(lsn: int) -> str:
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


class PgWireConnection:
    """One protocol-v3 connection (regular or walsender)."""

    def __init__(self, host: str, port: int, user: str, database: str,
                 replication: bool = False, connect_timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=connect_timeout)
        self.sock.settimeout(None)
        self._buf = b""
        self._copy_both = False
        params = {
            "user": user,
            "database": database,
            "application_name": "postrack_pgwire",
        }
        if replication:
            params["replication"] = "database"
        body = b"".join(
            k.encode() + b"\x00" + v.encode() + b"\x00" for k, v in params.items()
        ) + b"\x00"
        pkt = struct.pack(">iI", len(body) + 8, 196608) + body  # protocol 3.0
        self.sock.sendall(pkt)
        # consume until ReadyForQuery
        while True:
            mtype, payload = self._recv_message()
            if mtype == b"R":
                (code,) = struct.unpack_from(">i", payload)
                if code != 0:
                    raise PgError(
                        {"S": "FATAL", "M": f"auth method {code} unsupported "
                         "(pgwire client handles trust only; use the psycopg "
                         "seam for password/SCRAM servers)"}
                    )
            elif mtype == b"E":
                raise PgError(self._error_fields(payload))
            elif mtype == b"Z":
                break
            # 'S' ParameterStatus / 'K' BackendKeyData / 'N' Notice: ignore

    # -- low-level framing -------------------------------------------

    def _fill(self, n: int, deadline: float | None) -> bool:
        """Grow the receive buffer to >= n bytes WITHOUT consuming.
        Returns False when the deadline passes first — the partial
        bytes stay buffered so a later call resumes mid-message.
        ADVICE r4 (low): the old code only applied the select() wait
        while the buffer was EMPTY; once a partial header was buffered,
        sock.recv blocked indefinitely on a stalled server and the
        daemon's stop() flag (SIGTERM) was never rechecked."""
        while len(self._buf) < n:
            if deadline is not None:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                r, _, _ = select.select([self.sock], [], [], remaining)
                if not r:
                    return False
            chunk = self.sock.recv(65536)
            if not chunk:
                raise PgError({"S": "FATAL", "M": "server closed connection"})
            self._buf += chunk
        return True

    def _recv_exact(self, n: int, timeout: float | None = None) -> bytes | None:
        """Read exactly n bytes; with a timeout, return None (consuming
        nothing) when they don't all arrive before it elapses."""
        deadline = time.monotonic() + timeout if timeout is not None else None
        if not self._fill(n, deadline):
            return None
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _recv_message(self, timeout: float | None = None) -> tuple[bytes, bytes] | tuple[None, None]:
        # One deadline spans header + payload, and NOTHING is consumed
        # until the whole message is buffered — a timeout mid-message
        # leaves the stream positioned for a clean retry.
        deadline = time.monotonic() + timeout if timeout is not None else None
        if not self._fill(5, deadline):
            return None, None
        (length,) = struct.unpack(">i", self._buf[1:5])
        total = 5 + (length - 4 if length > 4 else 0)
        if not self._fill(total, deadline):
            return None, None
        head, self._buf = self._buf[:total], self._buf[total:]
        return head[:1], head[5:]

    def _send_message(self, mtype: bytes, payload: bytes) -> None:
        self.sock.sendall(mtype + struct.pack(">i", len(payload) + 4) + payload)

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        pos = 0
        while pos < len(payload) and payload[pos:pos + 1] != b"\x00":
            code = payload[pos:pos + 1].decode()
            end = payload.index(b"\x00", pos + 1)
            fields[code] = payload[pos + 1:end].decode("utf-8", "replace")
            pos = end + 1
        return fields

    # -- simple query ------------------------------------------------

    def query(self, sql: str) -> list[tuple]:
        """Simple-protocol query; rows come back as text (None = NULL)."""
        self._send_message(b"Q", sql.encode() + b"\x00")
        rows: list[tuple] = []
        error: PgError | None = None
        while True:
            mtype, payload = self._recv_message()
            if mtype == b"D":
                (ncols,) = struct.unpack_from(">h", payload)
                pos = 2
                vals = []
                for _ in range(ncols):
                    (vlen,) = struct.unpack_from(">i", payload, pos)
                    pos += 4
                    if vlen == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[pos:pos + vlen].decode("utf-8", "replace"))
                        pos += vlen
                rows.append(tuple(vals))
            elif mtype == b"E":
                error = PgError(self._error_fields(payload))
            elif mtype == b"W":  # CopyBothResponse: replication started
                self._copy_both = True
                return rows
            elif mtype == b"Z":
                if error is not None:
                    raise error
                return rows
            # 'T' RowDescription / 'C' CommandComplete / 'N' / 'S' / 'I': skip

    # -- logical replication (CopyBoth) ------------------------------

    def start_replication(self, slot: str, start_lsn: int,
                          options: dict[str, str]) -> None:
        opts = ", ".join(f"{k} '{v}'" for k, v in options.items())
        self.query(
            f'START_REPLICATION SLOT "{slot}" LOGICAL '
            f"{format_lsn(start_lsn)} ({opts})"
        )
        if not self._copy_both:
            raise PgError({"S": "FATAL", "M": "expected CopyBothResponse"})

    def read_replication_message(self, timeout: float = 1.0) -> ReplicationMessage | None:
        """Next XLogData as a duck-typed message; None on timeout.
        Keepalives are answered transparently when a reply is requested
        (with flush 0 = 'no news', like pglogrepl's default)."""
        while True:
            mtype, payload = self._recv_message(timeout=timeout)
            if mtype is None:
                return None
            if mtype == b"d":  # CopyData
                kind = payload[:1]
                if kind == b"w":
                    start, end, clock = struct.unpack_from(">qqq", payload, 1)
                    return ReplicationMessage(payload[25:], start, end, clock)
                if kind == b"k":
                    _end, _clock, reply = struct.unpack_from(">qqb", payload, 1)
                    if reply:
                        self.send_standby_status(0)
                    continue
                continue
            if mtype == b"E":
                raise PgError(self._error_fields(payload))
            if mtype in (b"c", b"C", b"Z"):  # CopyDone / complete: stream over
                raise StopIteration
            # notices etc: ignore

    def send_standby_status(self, flush_lsn: int, reply: int = 0) -> None:
        # microseconds since the Postgres epoch (2000-01-01)
        clock = int((time.time() - 946_684_800) * 1_000_000)
        body = b"r" + struct.pack(">qqqqb", flush_lsn, flush_lsn, flush_lsn,
                                  clock, reply)
        self._send_message(b"d", body)

    def close(self) -> None:
        try:
            self._send_message(b"X", b"")
        except OSError:
            pass
        self.sock.close()


def _quote_literal(v) -> str:
    if v is None:
        return "NULL"
    return "'" + str(v).replace("'", "''") + "'"


class PgWireExecutor:
    """api.Executor over two PgWireConnections (the reference's pooled
    SQL conn + replication conn split, postrack.go:93,98). ``%s``
    placeholders are substituted client-side with quoted literals —
    the api.py catalog probes only ever pass names."""

    def __init__(self, host: str, port: int, user: str, database: str):
        self._conn = PgWireConnection(host, port, user, database)
        self._repl = PgWireConnection(host, port, user, database, replication=True)

    def query(self, sql: str, params: tuple = ()) -> list[tuple]:
        for p in params or ():
            sql = sql.replace("%s", _quote_literal(p), 1)
        return self._conn.query(sql)

    def command(self, sql: str) -> None:
        self._conn.query(sql)

    def replication_command(self, cmd: str) -> None:
        self._repl.query(cmd)

    def close(self) -> None:
        self._conn.close()
        self._repl.close()


def run_daemon_pgwire(host: str, port: int, user: str, database: str,
                      slot: str, out_dir: str, publication: str,
                      start_lsn: int = 0, proto_version: int = 1,
                      streaming: bool = False, two_phase: bool = False,
                      messages: bool = False, binary: bool = False,
                      ack_interval_s: float = 5.0, max_frames: int = 4096,
                      max_bytes: int = 16 << 20, stop=lambda: False,
                      writer=None) -> None:
    """capture.run_daemon with the pure-stdlib transport: connect +
    StartReplication + pump (postrack.go:86-105, 287-310), resuming at
    ``start_lsn + 1`` like the reference (postrack.go:297). Pass
    ``writer`` to re-target the sink (e.g. kafka_transport.
    KafkaFrameWriter); default is the ``.pgout`` file contract."""
    from postrack_spark.sources.capture import FrameFileWriter, capture_loop

    repl = PgWireConnection(host, port, user, database, replication=True)
    options = {
        "proto_version": str(proto_version),
        "publication_names": publication,
    }
    if streaming:
        options["streaming"] = "on"
    if two_phase:
        options["two_phase"] = "on"  # needs proto_version >= 3 + a
        # TWO_PHASE slot (api.Conn.add_slot(two_phase=True))
    if messages:
        options["messages"] = "on"  # pg_logical_emit_message 'M' frames
    if binary:
        # pgoutput's binary mode (PG14+): types with binary send
        # functions arrive as 'b' TupleData columns; the decoder
        # surfaces them in bytea text form ("\\x<hex>"), lossless
        options["binary"] = "on"
    repl.start_replication(slot, start_lsn + 1, options)
    if writer is None:
        writer = FrameFileWriter(out_dir, max_frames=max_frames,
                                 max_bytes=max_bytes)

    def source():
        while not stop():
            try:
                yield repl.read_replication_message(timeout=1.0)
            except StopIteration:
                return

    def ack(lsn: int) -> None:
        repl.send_standby_status(lsn)

    try:
        capture_loop(source(), writer, ack, ack_interval_s=ack_interval_s,
                     stop=stop)
    finally:
        repl.close()
