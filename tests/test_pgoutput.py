"""Golden pgoutput byte-fixture tests (FIXTURES.md §B.5): the decoder
must reproduce the reference handler's semantics (postrack.go:340-413)
with the documented fixes (q2 truncate naming, q4 NULL/TOAST, q5
txid/commit_ts).
"""

from __future__ import annotations

from datetime import datetime, timezone

from postrack_spark.sources.pgoutput import (
    UNCHANGED,
    DecoderState,
    decode_xlogdata_stream,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_truncate,
    encode_update,
    keepalive_frame,
    wrap_xlogdata,
)

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
ORDERS_COLS = ["o_orderkey", "o_orderstatus", "o_totalprice"]


def golden_frames() -> list[bytes]:
    """Relation(orders) → Begin → Insert → Update(with old) →
    Update(no old) → Delete → Commit → Relation(scratch) → Truncate,
    with a keepalive interleaved (must be skipped, postrack.go:355)."""
    return [
        wrap_xlogdata(encode_relation(101, "public", "orders", ORDERS_COLS), 10),
        wrap_xlogdata(encode_begin(100, TS, 777), 11),
        wrap_xlogdata(encode_insert(101, ["1", "O", "100.5"]), 12),
        keepalive_frame(wal_end=12, reply_requested=True),
        wrap_xlogdata(
            encode_update(101, ["1", "F", "110.0"], old_values=["1", "O", "100.5"]), 13
        ),
        wrap_xlogdata(encode_update(101, ["1", "F", None]), 14),
        wrap_xlogdata(encode_insert(101, ["2", "O", UNCHANGED]), 15),
        wrap_xlogdata(encode_delete(101, ["1", "F", None]), 16),
        wrap_xlogdata(encode_commit(17, 17, TS), 17),
        wrap_xlogdata(encode_relation(102, "public", "scratch", ["x"]), 18),
        wrap_xlogdata(encode_truncate([102]), 19),
    ]


def test_golden_sequence():
    rows = decode_xlogdata_stream(golden_frames())
    assert [r["op"] for r in rows] == [
        "INSERT", "UPDATE", "UPDATE", "INSERT", "DELETE", "TRUNCATE",
    ]
    assert [r["lsn"] for r in rows] == [12, 13, 14, 15, 16, 19]

    ins = rows[0]
    assert ins["after"] == {"o_orderkey": "1", "o_orderstatus": "O", "o_totalprice": "100.5"}
    assert ins["before"] is None
    # q5 fix: transaction context flows onto events
    assert ins["txid"] == 777 and ins["commit_ts"] == TS

    upd_full = rows[1]
    assert upd_full["before"]["o_orderstatus"] == "O"

    upd_defid = rows[2]  # no old tuple -> EMPTY map (postrack.go:388-392)
    assert upd_defid["before"] == {}
    # q4 fix: SQL NULL decodes to None, not ""
    assert upd_defid["after"]["o_totalprice"] is None

    toast = rows[3]  # unchanged TOAST column distinguished from NULL/""
    assert toast["after"]["o_totalprice"] == UNCHANGED

    dele = rows[4]
    assert dele["after"] is None and dele["before"]["o_orderkey"] == "1"

    trunc = rows[5]  # q2 fix: the real table name, not ""
    assert trunc["table"] == "scratch"
    assert trunc["after"] is None and trunc["before"] is None
    # events outside a Begin/Commit have no tx context
    assert trunc["txid"] is None


def test_relation_cache_survives_across_messages():
    state = DecoderState()
    frames = golden_frames()
    decode_xlogdata_stream(frames[:1], state)
    assert state.relations[101].columns == ORDERS_COLS
    rows = decode_xlogdata_stream(frames[1:3], state)
    assert rows[0]["table"] == "orders"


def test_empty_and_non_xlog_frames_skipped():
    assert decode_xlogdata_stream([b"", keepalive_frame()]) == []


def test_schema_evolution_mid_stream():
    """ALTER TABLE mid-stream: Postgres re-sends RelationMessage with
    the new column set; subsequent tuple data must be labeled with the
    NEW names (the reference rebuilds its cache the same way,
    postrack.go:369-376 — but per-connection only; ours updates on
    every RelationMessage)."""
    frames = [
        wrap_xlogdata(encode_relation(101, "public", "orders", ["a", "b"]), 10),
        wrap_xlogdata(encode_insert(101, ["1", "x"]), 11),
        # ALTER TABLE ADD COLUMN c — relation re-sent with 3 columns
        wrap_xlogdata(encode_relation(101, "public", "orders", ["a", "b", "c"]), 12),
        wrap_xlogdata(encode_insert(101, ["2", "y", "z"]), 13),
        # ALTER TABLE DROP COLUMN b
        wrap_xlogdata(encode_relation(101, "public", "orders", ["a", "c"]), 14),
        wrap_xlogdata(encode_insert(101, ["3", "w"]), 15),
    ]
    rows = decode_xlogdata_stream(frames)
    assert [r["after"] for r in rows] == [
        {"a": "1", "b": "x"},
        {"a": "2", "b": "y", "c": "z"},
        {"a": "3", "c": "w"},
    ]


def test_malformed_frames_skipped_and_counted():
    """Parse failures skip the frame and count it (the reference
    silently continues, postrack.go:359-365; we continue visibly).
    Stream keeps decoding after the bad frame."""
    good_rel = wrap_xlogdata(encode_relation(101, "public", "orders", ["a"]), 10)
    bad_truncated = b"w" + b"\x00" * 10  # header too short for >qqq
    bad_unknown_rel = wrap_xlogdata(encode_insert(999, ["1"]), 11)  # oid not in cache
    good_insert = wrap_xlogdata(encode_insert(101, ["7"]), 12)
    state = DecoderState()
    rows = decode_xlogdata_stream(
        [good_rel, bad_truncated, bad_unknown_rel, good_insert], state
    )
    assert [r["after"] for r in rows] == [{"a": "7"}]
    assert state.parse_errors == 2


def test_unchanged_toast_decodes_and_resolves(spark):
    """End-to-end quirk-q4 path: a pgoutput UPDATE with an unchanged
    ('u') TOAST column decodes to the UNCHANGED sentinel, and
    resolve_unchanged fills it from the key's earlier full image."""
    from pyspark.sql import functions as F

    from postrack_spark.cdc.envelope import CHANGE_SCHEMA
    from postrack_spark.cdc.materialize import resolve_unchanged

    frames = [
        wrap_xlogdata(encode_relation(7, "public", "docs", ["id", "body"]), 0),
        wrap_xlogdata(encode_insert(7, ["1", "big-toast-value"]), 10),
        wrap_xlogdata(encode_update(7, ["1", UNCHANGED]), 20),
    ]
    rows = decode_xlogdata_stream(frames)
    assert rows[1]["after"]["body"] == UNCHANGED
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in CHANGE_SCHEMA.fields) for r in rows], CHANGE_SCHEMA
    )
    resolved = resolve_unchanged(df, F.element_at("after", "id").cast("long"))
    out = resolved.collect()[0]
    assert out["after"] == {"id": "1", "body": "big-toast-value"}
    assert out["lsn"] == 20


def test_streamed_transaction_v2_interleaved_commit_and_abort():
    """Protocol v2 streaming (beyond the reference, which hardcodes
    proto v1 — postrack.go:300): segments of a large in-progress
    transaction interleave with ordinary transactions; streamed rows
    buffer until StreamCommit (then carry the toplevel txid and commit
    ts) and an aborted SUBtransaction's rows are dropped while sibling
    rows survive."""
    from postrack_spark.sources.pgoutput import (
        encode_stream_abort,
        encode_stream_commit,
        encode_stream_start,
        encode_stream_stop,
        with_stream_xid,
    )

    w = wrap_xlogdata
    frames = [
        w(encode_relation(1, "public", "orders", ORDERS_COLS), 0),
        # segment 1 of streamed txn 900 (row in toplevel xid)
        w(encode_stream_start(900, True), 10),
        w(with_stream_xid(encode_insert(1, ["1", "O", "10.00"]), 900), 11),
        w(encode_stream_stop(), 12),
        # an ORDINARY small transaction interleaves between segments
        w(encode_begin(20, TS, 555), 20),
        w(encode_insert(1, ["7", "F", "70.00"]), 21),
        w(encode_commit(22, 23, TS), 22),
        # segment 2: a subtransaction (xid 901) writes a row...
        w(encode_stream_start(900, False), 30),
        w(with_stream_xid(encode_insert(1, ["2", "O", "20.00"]), 901), 31),
        w(encode_stream_stop(), 32),
        # ...and is rolled back
        w(encode_stream_abort(900, 901), 33),
        # segment 3: another toplevel row, then commit
        w(encode_stream_start(900, False), 40),
        w(with_stream_xid(encode_insert(1, ["3", "O", "30.00"]), 900), 41),
        w(encode_stream_stop(), 42),
        w(encode_stream_commit(900, 43, 44, TS), 43),
    ]
    rows = decode_xlogdata_stream(frames)
    # the interleaved small txn emits immediately; streamed rows emit at
    # StreamCommit, so delivery order is: key 7, then keys 1 and 3
    assert [r["after"]["o_orderkey"] for r in rows] == ["7", "1", "3"]
    streamed = [r for r in rows if r["txid"] == 900]
    assert len(streamed) == 2  # subtxn 901's row was dropped
    assert all(r["commit_ts"] is not None for r in streamed)
    assert {r["after"]["o_orderkey"] for r in streamed} == {"1", "3"}
    assert rows[0]["txid"] == 555


def test_streamed_transaction_full_abort_drops_everything():
    from postrack_spark.sources.pgoutput import (
        encode_stream_abort,
        encode_stream_start,
        encode_stream_stop,
        with_stream_xid,
    )

    w = wrap_xlogdata
    frames = [
        w(encode_relation(1, "public", "orders", ORDERS_COLS), 0),
        w(encode_stream_start(77, True), 10),
        w(with_stream_xid(encode_insert(1, ["1", "O", "10.00"]), 77), 11),
        w(with_stream_xid(encode_insert(1, ["2", "O", "20.00"]), 77), 12),
        w(encode_stream_stop(), 13),
        w(encode_stream_abort(77, 77), 14),  # toplevel abort
    ]
    state = DecoderState()
    rows = decode_xlogdata_stream(frames, state)
    assert rows == []
    assert state.pending == {}  # buffer reclaimed


def test_binary_tuple_kind_decodes_as_bytea_text():
    """Round 3: TupleData kind 'b' (binary-format column, sent when the
    subscription negotiates binary=on) decodes to Postgres's text-mode
    bytea form "\\x<hex>" — a binary-negotiated stream yields the SAME
    envelope values a text stream yields for bytea, so downstream typed
    projection is protocol-agnostic."""
    frames = [
        wrap_xlogdata(encode_relation(300, "public", "blobs", ["id", "data"]), 1),
        wrap_xlogdata(encode_begin(10, TS, 42), 2),
        # bytes value -> encoder emits kind 'b'
        wrap_xlogdata(encode_insert(300, ["7", b"\x01\xff\x00A"]), 3),
        wrap_xlogdata(encode_commit(10, 10, TS), 4),
    ]
    state = DecoderState()
    rows = decode_xlogdata_stream(frames, state)
    assert state.parse_errors == 0
    assert rows[0]["after"] == {"id": "7", "data": "\\x01ff0041"}


def test_origin_frame_tracked_no_rows():
    """'O' (Origin) frames carry the upstream node name in cascaded
    setups: tracked on the decoder state, no envelope rows (matching
    the reference, which ignores them entirely, postrack.go:368+)."""
    from postrack_spark.sources.pgoutput import encode_origin

    frames = [
        wrap_xlogdata(encode_relation(101, "public", "orders", ORDERS_COLS), 1),
        wrap_xlogdata(encode_begin(10, TS, 42), 2),
        wrap_xlogdata(encode_origin(9, "upstream_node_a"), 3),
        wrap_xlogdata(encode_insert(101, ["1", "O", "5.0"]), 4),
        wrap_xlogdata(encode_commit(10, 10, TS), 5),
    ]
    state = DecoderState()
    rows = decode_xlogdata_stream(frames, state)
    assert state.parse_errors == 0
    assert [r["op"] for r in rows] == ["INSERT"]
    assert state.origin == "upstream_node_a"


def test_logical_message_frame_drained_out_of_band():
    """'M' (pg_logical_emit_message) frames surface on the decoder's
    message side channel with prefix/content/txid — no envelope rows
    (they have no table), but not silently dropped either."""
    from postrack_spark.sources.pgoutput import encode_logical_message

    frames = [
        wrap_xlogdata(encode_relation(101, "public", "orders", ORDERS_COLS), 1),
        wrap_xlogdata(encode_begin(10, TS, 42), 2),
        wrap_xlogdata(encode_logical_message("app.ckpt", b"v7", lsn=11), 3),
        wrap_xlogdata(encode_insert(101, ["1", "O", "5.0"]), 4),
        wrap_xlogdata(encode_commit(10, 10, TS), 5),
        # non-transactional message outside any tx
        wrap_xlogdata(
            encode_logical_message("app.beacon", b"\x00\x01", lsn=12,
                                   transactional=False), 6
        ),
    ]
    state = DecoderState()
    rows = decode_xlogdata_stream(frames, state)
    assert state.parse_errors == 0
    assert [r["op"] for r in rows] == ["INSERT"]
    assert state.messages == [
        {"lsn": 11, "prefix": "app.ckpt", "content": "\\x7637",
         "transactional": True, "txid": 42},
        {"lsn": 12, "prefix": "app.beacon", "content": "\\x0001",
         "transactional": False, "txid": None},
    ]


def test_streamed_logical_message_v2():
    """'M' inside a v2 stream segment carries the subxid prefix like
    every other streamed message; it must still land on the side
    channel (not crash, not pollute the row buffer)."""
    from postrack_spark.sources.pgoutput import (
        encode_logical_message,
        encode_stream_commit,
        encode_stream_start,
        encode_stream_stop,
        with_stream_xid,
    )

    frames = [
        wrap_xlogdata(encode_relation(101, "public", "orders", ORDERS_COLS), 1),
        wrap_xlogdata(encode_stream_start(900), 2),
        wrap_xlogdata(
            with_stream_xid(encode_logical_message("s.mark", b"z", lsn=21), 900), 3
        ),
        wrap_xlogdata(with_stream_xid(encode_insert(101, ["3", "O", "1.0"]), 900), 4),
        wrap_xlogdata(encode_stream_stop(), 5),
        wrap_xlogdata(encode_stream_commit(900, 30, 30, TS), 6),
    ]
    state = DecoderState()
    rows = decode_xlogdata_stream(frames, state)
    assert state.parse_errors == 0
    assert [(r["op"], r["txid"]) for r in rows] == [("INSERT", 900)]
    assert [(m["prefix"], m["content"]) for m in state.messages] == [("s.mark", "\\x7a")]


def test_type_message_populates_type_cache():
    """'Y' (Type) frames name non-builtin column types; the decoder
    caches oid -> qualified name (absence = builtin) — the capture
    writer already re-sends them per file for self-containment."""
    from postrack_spark.sources.pgoutput import encode_type

    frames = [
        wrap_xlogdata(encode_type(16385, "public", "order_status_enum"), 1),
        wrap_xlogdata(encode_relation(101, "public", "orders", ORDERS_COLS), 2),
        wrap_xlogdata(encode_begin(10, TS, 42), 3),
        wrap_xlogdata(encode_insert(101, ["1", "O", "5.0"]), 4),
        wrap_xlogdata(encode_commit(10, 10, TS), 5),
    ]
    state = DecoderState()
    rows = decode_xlogdata_stream(frames, state)
    assert state.parse_errors == 0
    assert [r["op"] for r in rows] == ["INSERT"]
    assert state.types == {16385: "public.order_status_enum"}


def test_schema_evolution_relation_resend():
    """ALTER TABLE ADD COLUMN mid-stream: Postgres re-sends the Relation
    message with the new column list before the next DML touching the
    table (logicalrep protocol — relations are re-described whenever
    their cached description is stale). The decoder must swap its
    relation-cache entry in place so later tuples zip against the NEW
    columns; the map<string,string> envelope absorbs the wider rows
    with no Spark-side schema change (the reference rebuilds its cache
    the same way, postrack.go:371-377, modulo its q2 keying bug)."""
    frames = [
        wrap_xlogdata(encode_relation(201, "public", "t", ["id", "v"]), 10),
        wrap_xlogdata(encode_begin(100, TS, 1), 11),
        wrap_xlogdata(encode_insert(201, ["1", "a"]), 12),
        wrap_xlogdata(encode_commit(13, 13, TS), 13),
        # ALTER TABLE t ADD COLUMN extra; next txn re-describes t
        wrap_xlogdata(encode_relation(201, "public", "t", ["id", "v", "extra"]), 14),
        wrap_xlogdata(encode_begin(200, TS, 2), 15),
        wrap_xlogdata(encode_insert(201, ["2", "b", "x"]), 16),
        wrap_xlogdata(
            encode_update(201, ["1", "a", "y"], old_values=["1", "a", None]), 17
        ),
        wrap_xlogdata(encode_commit(18, 18, TS), 18),
    ]
    rows = decode_xlogdata_stream(frames)
    ops = [(r["op"], r["after"]) for r in rows]
    assert ops[0] == ("INSERT", {"id": "1", "v": "a"})
    assert ops[1] == ("INSERT", {"id": "2", "v": "b", "extra": "x"})
    assert ops[2] == ("UPDATE", {"id": "1", "v": "a", "extra": "y"})
    # old image decoded against the evolved column list too
    assert rows[2]["before"] == {"id": "1", "v": "a", "extra": None}


def test_two_phase_prepared_commit_and_rollback():
    """Protocol v3 two-phase commit (PG15+, beyond the reference's
    hardcoded v1): data between BeginPrepare and Prepare buffers under
    the gid, survives the PREPARE..COMMIT PREPARED gap (which can span
    hours and any number of other transactions), and emits at
    CommitPrepared with the final commit timestamp; RollbackPrepared
    drops the buffer."""
    from datetime import timedelta

    from postrack_spark.sources.pgoutput import (
        encode_begin_prepare,
        encode_commit_prepared,
        encode_prepare,
        encode_rollback_prepared,
    )

    CTS = TS + timedelta(hours=3)  # commit long after prepare
    w = wrap_xlogdata
    frames = [
        w(encode_relation(1, "public", "orders", ORDERS_COLS), 0),
        # prepared txn 800 / gid 'gtx1'
        w(encode_begin_prepare(10, 11, TS, 800, "gtx1"), 10),
        w(encode_insert(1, ["1", "O", "10.00"]), 11),
        w(encode_insert(1, ["2", "O", "20.00"]), 12),
        w(encode_prepare(10, 11, TS, 800, "gtx1"), 13),
        # an ordinary transaction commits while gtx1 sits prepared
        w(encode_begin(20, TS, 555), 20),
        w(encode_insert(1, ["7", "F", "70.00"]), 21),
        w(encode_commit(22, 23, TS), 22),
        # a second prepared txn rolls back
        w(encode_begin_prepare(30, 31, TS, 801, "gtx2"), 30),
        w(encode_insert(1, ["9", "O", "90.00"]), 31),
        w(encode_prepare(30, 31, TS, 801, "gtx2"), 32),
        w(encode_rollback_prepared(33, 34, TS, CTS, 801, "gtx2"), 33),
        # gtx1 finally commits
        w(encode_commit_prepared(40, 41, CTS, 800, "gtx1"), 40),
    ]
    rows = decode_xlogdata_stream(frames)
    assert [r["after"]["o_orderkey"] for r in rows] == ["7", "1", "2"]
    prepared = [r for r in rows if r["txid"] == 800]
    assert len(prepared) == 2
    assert all(r["commit_ts"] == CTS for r in prepared)  # commit ts, not prepare
    assert rows[0]["txid"] == 555
    assert all(r["after"]["o_orderkey"] != "9" for r in rows)  # rolled back


def test_two_phase_streamed_prepare():
    """A LARGE prepared transaction streams its data (protocol v2
    segments), then StreamPrepare moves the buffer under the gid and
    CommitPrepared emits it — the v2+v3 composition."""
    from datetime import timedelta

    from postrack_spark.sources.pgoutput import (
        encode_commit_prepared,
        encode_stream_prepare,
        encode_stream_start,
        encode_stream_stop,
        with_stream_xid,
    )

    CTS = TS + timedelta(minutes=90)
    w = wrap_xlogdata
    frames = [
        w(encode_relation(1, "public", "orders", ORDERS_COLS), 0),
        w(encode_stream_start(900, True), 10),
        w(with_stream_xid(encode_insert(1, ["1", "O", "10.00"]), 900), 11),
        w(encode_stream_stop(), 12),
        w(encode_stream_start(900, False), 20),
        w(with_stream_xid(encode_insert(1, ["2", "O", "20.00"]), 900), 21),
        w(encode_stream_stop(), 22),
        w(encode_stream_prepare(23, 24, TS, 900, "big1"), 23),
        w(encode_commit_prepared(30, 31, CTS, 900, "big1"), 30),
    ]
    rows = decode_xlogdata_stream(frames)
    assert [r["after"]["o_orderkey"] for r in rows] == ["1", "2"]
    assert all(r["txid"] == 900 and r["commit_ts"] == CTS for r in rows)
