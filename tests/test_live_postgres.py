"""LIVE Postgres end-to-end: the one reference behavior that had never
run against a real server in this environment (VERDICT r3, missing #1).

This module provisions a REAL PostgreSQL server (the container ships
the server binaries; it has no psycopg, so the wire transport is the
pure-stdlib protocol-v3 client in sources/pgwire.py), then exercises
the reference's full flow name-for-name:

  connect (two-connection split) -> catalog probes -> set_slot
  (CREATE_REPLICATION_SLOT over the walsender protocol) ->
  set_publication -> START_REPLICATION -> receive loop ->
  ack-after-durable -> frame files -> Spark DataSource decode ->
  latest-per-key materialization == live table state,

plus the restart/resume path (new daemon from the slot's
confirmed_flush_lsn, the production resume signal) and a protocol-v2
STREAMED in-progress transaction forced by a tiny
logical_decoding_work_mem.

Skips (not fails) when the server binaries are missing or the server
cannot start (e.g. no non-root user to run it as).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import threading
import time

import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("initdb") is None or shutil.which("pg_ctl") is None,
    reason="PostgreSQL server binaries not installed",
)


def _sh_as_pg(cmd: str) -> subprocess.CompletedProcess:
    """Run a shell command as a non-root user (postgres refuses root)."""
    if os.geteuid() == 0:
        return subprocess.run(
            ["su", "nobody", "-s", "/bin/sh", "-c", f"cd /tmp && {cmd}"],
            capture_output=True, text=True,
        )
    return subprocess.run(
        ["/bin/sh", "-c", cmd], capture_output=True, text=True, cwd="/tmp"
    )


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def live_pg():
    base = tempfile.mkdtemp(prefix="pglive_")
    os.chmod(base, 0o777)
    data = os.path.join(base, "data")
    port = _free_port()
    r = _sh_as_pg(f"{shutil.which('initdb')} -D {data} -A trust -U postgres")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    opts = (
        f"-c port={port} -c listen_addresses=127.0.0.1 -c wal_level=logical "
        f"-c max_replication_slots=4 -c max_wal_senders=4 -c fsync=off "
        f"-c logical_decoding_work_mem=64kB "
        f"-c max_prepared_transactions=10 "
        f"-c unix_socket_directories={base}"
    )
    r = _sh_as_pg(
        f"{shutil.which('pg_ctl')} -D {data} -o '{opts}' -w "
        f"-l {base}/pg.log start"
    )
    if r.returncode != 0:
        pytest.skip(f"postgres failed to start: {r.stdout[-300:]} {r.stderr[-300:]}")
    try:
        yield {"host": "127.0.0.1", "port": port, "user": "postgres",
               "database": "postgres"}
    finally:
        _sh_as_pg(f"{shutil.which('pg_ctl')} -D {data} -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


def _executor(live_pg):
    from postrack_spark.sources.pgwire import PgWireExecutor

    return PgWireExecutor(**live_pg)


def _parse_lsn(text: str) -> int:
    hi, lo = text.split("/")
    return (int(hi, 16) << 32) | int(lo, 16)


def _wait_confirmed_flush(ex, slot: str, target: int, timeout_s: float = 30.0) -> None:
    """Wait until the daemon's ack (confirmed_flush_lsn) covers target —
    the ack-after-durable signal, observed server-side."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        rows = ex.query(
            "SELECT confirmed_flush_lsn FROM pg_replication_slots "
            "WHERE slot_name = %s", (slot,),
        )
        if rows and rows[0][0] and _parse_lsn(rows[0][0]) >= target:
            return
        time.sleep(0.3)
    raise AssertionError("daemon never acked up to the target LSN")


def _run_capture(live_pg, slot: str, pub: str, out_dir: str, start_lsn: int,
                 until_lsn: int, proto_version: int = 1,
                 streaming: bool = False, two_phase: bool = False,
                 messages: bool = False, binary: bool = False) -> None:
    """Run the pgwire daemon in a thread until the slot's confirmed
    flush covers until_lsn, then stop it."""
    from postrack_spark.sources.pgwire import run_daemon_pgwire

    stop = {"flag": False}
    t = threading.Thread(
        target=run_daemon_pgwire,
        kwargs=dict(
            **live_pg, slot=slot, out_dir=out_dir, publication=pub,
            start_lsn=start_lsn, proto_version=proto_version,
            streaming=streaming, two_phase=two_phase, messages=messages,
            binary=binary,
            ack_interval_s=0.5,
            stop=lambda: stop["flag"],
        ),
        daemon=True,
    )
    t.start()
    ex = _executor(live_pg)
    try:
        _wait_confirmed_flush(ex, slot, until_lsn)
    finally:
        ex.close()
        stop["flag"] = True
        t.join(15)
    assert not t.is_alive(), "capture daemon failed to stop"


def test_wire_catalog_and_api_flow(live_pg):
    """The reference's provisioning surface, live: two-connection
    executor, catalog probes, slot DDL over the walsender protocol,
    publication upsert — postrack.go:86-285 name-for-name."""
    from postrack_spark.api import Conn, Table, create_publication_id

    ex = _executor(live_pg)
    try:
        assert ex.query("SELECT 1")[0][0] == "1"
        ex.command("DROP TABLE IF EXISTS public.live_api_t")
        ex.command("CREATE TABLE public.live_api_t (id int primary key, v text)")
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot("live_api_slot")
        assert conn.slot_exists("live_api_slot")
        conn.set_publication(Table("public", "live_api_t"))
        pub = create_publication_id("live_api_slot")
        assert conn.publication_exists(pub)
        assert conn.publication_table_exists(pub, Table("public", "live_api_t"))
        # idempotent upsert (quirk q7 path: publish= re-applied on alter)
        conn.set_publication(Table("public", "live_api_t"))
        rows = ex.query(
            "SELECT puballtables, pubinsert, pubupdate, pubdelete, pubtruncate "
            "FROM pg_publication WHERE pubname = %s", (pub,),
        )
        assert rows == [("f", "t", "t", "t", "t")]
        conn.drop_publication()
        conn.drop_slot("live_api_slot")
        assert not conn.slot_exists("live_api_slot")
    finally:
        ex.close()


def test_live_capture_roundtrip_and_resume(live_pg, spark):
    """Full CDC loop against the live server, then a daemon RESTART
    resuming from the slot's confirmed_flush_lsn: decoded + materialized
    state must equal the live table after each leg, with no duplicate
    or lost commits across the restart boundary."""
    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.cdc.materialize import latest_per_key
    from postrack_spark.sources.postgres_cdc import register

    ex = _executor(live_pg)
    slot, out_dir = "live_rt_slot", tempfile.mkdtemp(prefix="pglive_frames_")
    try:
        ex.command("DROP TABLE IF EXISTS public.live_rt")
        ex.command(
            "CREATE TABLE public.live_rt "
            "(id int primary key, v text, amount numeric(10,2))"
        )
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_publication(Table("public", "live_rt"))
        pub = create_publication_id(slot)

        # leg 1: inserts, updates, deletes across several transactions
        ex.command(
            "INSERT INTO public.live_rt "
            "SELECT i, 'v' || i, i * 1.25 FROM generate_series(1, 20) g(i)"
        )
        ex.command("UPDATE public.live_rt SET v = v || '!' WHERE id % 3 = 0")
        ex.command("DELETE FROM public.live_rt WHERE id % 7 = 0")
        target = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _run_capture(live_pg, slot, pub, out_dir, start_lsn=0, until_lsn=target)

        register(spark)
        env = (
            spark.read.format("postgres_cdc")
            .option("capture_dir", out_dir)
            .load()
            .filter("`table` = 'live_rt'")
        )
        assert env.filter("op = 'INSERT'").count() == 20
        assert env.filter("op = 'UPDATE'").count() == 6
        assert env.filter("op = 'DELETE'").count() == 2
        # materialize by primary key from the text envelope
        from pyspark.sql import functions as F

        keyed = env.withColumn(
            "pk", F.coalesce(F.col("after")["id"], F.col("before")["id"])
        )
        state = (
            latest_per_key(keyed, ["pk"])
            .filter("op <> 'DELETE'")
            .select(
                F.col("pk").cast("int").alias("id"),
                F.col("after")["v"].alias("v"),
                F.col("after")["amount"].alias("amount"),
            )
        )
        got = {(r["id"], r["v"], r["amount"]) for r in state.collect()}
        want = {
            (int(i), v, a)
            for i, v, a in ex.query(
                "SELECT id, v, amount::text FROM public.live_rt"
            )
        }
        assert got == want and len(want) == 18

        # leg 2: daemon restart resuming at the acked LSN
        resume_lsn = _parse_lsn(
            ex.query(
                "SELECT confirmed_flush_lsn FROM pg_replication_slots "
                "WHERE slot_name = %s", (slot,),
            )[0][0]
        )
        ex.command("UPDATE public.live_rt SET amount = amount * 2 WHERE id <= 5")
        ex.command("INSERT INTO public.live_rt VALUES (100, 'new', 9.99)")
        ex.command("DELETE FROM public.live_rt WHERE id = 100")
        ex.command("INSERT INTO public.live_rt VALUES (101, 'kept', 1.00)")
        target2 = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _run_capture(
            live_pg, slot, pub, out_dir, start_lsn=resume_lsn, until_lsn=target2
        )

        env2 = (
            spark.read.format("postgres_cdc")
            .option("capture_dir", out_dir)
            .load()
            .filter("`table` = 'live_rt'")
        )
        # no event lost or duplicated across the restart: every LSN once
        assert env2.count() == env2.select("lsn").distinct().count()
        keyed2 = env2.withColumn(
            "pk", F.coalesce(F.col("after")["id"], F.col("before")["id"])
        )
        state2 = (
            latest_per_key(keyed2, ["pk"])
            .filter("op <> 'DELETE'")
            .select(
                F.col("pk").cast("int").alias("id"),
                F.col("after")["v"].alias("v"),
                F.col("after")["amount"].alias("amount"),
            )
        )
        got2 = {(r["id"], r["v"], r["amount"]) for r in state2.collect()}
        want2 = {
            (int(i), v, a)
            for i, v, a in ex.query(
                "SELECT id, v, amount::text FROM public.live_rt"
            )
        }
        assert got2 == want2
        conn.drop_publication()
        conn.drop_slot(slot)
    finally:
        ex.close()


def test_live_capture_daemon_cli(live_pg, spark):
    """The production entrypoint itself: scripts/capture_daemon.py run
    as a subprocess with --transport pgwire --create (slot +
    publication provisioning included), SIGTERMed after the ack covers
    the workload — decoded envelopes must match the committed rows."""
    import signal as _signal

    from postrack_spark.api import create_publication_id
    from postrack_spark.sources.postgres_cdc import register

    ex = _executor(live_pg)
    out_dir = tempfile.mkdtemp(prefix="pglive_cli_")
    slot = "live_cli_slot"
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "capture_daemon.py",
    )
    dsn = (
        f"postgres://{live_pg['user']}@{live_pg['host']}:{live_pg['port']}"
        f"/{live_pg['database']}"
    )
    proc = None
    try:
        ex.command("DROP TABLE IF EXISTS public.live_cli")
        ex.command("CREATE TABLE public.live_cli (id int primary key, v int)")
        proc = subprocess.Popen(
            [
                "python", script, "--dsn", dsn, "--slot", slot,
                "--out", out_dir, "--table", "public.live_cli",
                "--create", "--transport", "pgwire",
                "--ack-interval", "0.3", "--max-frames", "8",
            ],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        # Wait until the daemon is fully up BEFORE committing the
        # workload: the publication must exist (pgoutput decodes with a
        # historic catalog, so rows committed before CREATE PUBLICATION
        # are never published) and the walsender must hold the slot
        # (active = streaming started). Waiting for the slot alone is a
        # race the suite run caught.
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            active = ex.query(
                "SELECT active FROM pg_replication_slots WHERE slot_name = %s",
                (slot,),
            )
            pub_ok = ex.query(
                "SELECT 1 FROM pg_publication WHERE pubname = %s",
                (create_publication_id(slot),),
            )
            if active and active[0][0] == "t" and pub_ok:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    f"daemon exited early: {proc.stderr.read()[-400:]}"
                )
            time.sleep(0.2)
        else:
            raise AssertionError("daemon never became active")
        ex.command(
            "INSERT INTO public.live_cli "
            "SELECT i, i * i FROM generate_series(1, 12) g(i)"
        )
        ex.command("UPDATE public.live_cli SET v = 0 WHERE id = 1")
        target = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _wait_confirmed_flush(ex, slot, target)
        proc.send_signal(_signal.SIGTERM)
        proc.wait(20)

        register(spark)
        env = (
            spark.read.format("postgres_cdc")
            .option("capture_dir", out_dir)
            .load()
            .filter("`table` = 'live_cli'")
        )
        assert env.filter("op = 'INSERT'").count() == 12
        assert env.filter("op = 'UPDATE'").count() == 1
    finally:
        if proc is not None and proc.poll() is None:
            proc.kill()
        try:
            from postrack_spark.api import Conn

            Conn(dsn, executor=ex).drop_slot(slot)
        except Exception:
            pass
        ex.close()
        shutil.rmtree(out_dir, ignore_errors=True)


def test_live_streaming_pipeline(live_pg, spark):
    """The production deployment shape, live: the capture daemon runs
    CONTINUOUSLY against the server while Structured Streaming drains
    the frame directory in incremental passes. Two transaction waves
    land while the daemon stays up; each availableNow pass picks up
    exactly the new envelopes (checkpointed offsets, no replays), and
    the materialized latest-per-key state equals the live table."""
    from pyspark.sql import functions as F

    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.cdc.materialize import latest_per_key
    from postrack_spark.sources.pgwire import run_daemon_pgwire
    from postrack_spark.sources.postgres_cdc import register

    ex = _executor(live_pg)
    slot = "live_stream_slot"
    frames = tempfile.mkdtemp(prefix="pglive_sfr_")
    ckpt = tempfile.mkdtemp(prefix="pglive_sck_")
    sink = tempfile.mkdtemp(prefix="pglive_ssk_")
    stop = {"flag": False}
    t = None
    try:
        ex.command("DROP TABLE IF EXISTS public.live_stream")
        ex.command(
            "CREATE TABLE public.live_stream (id int primary key, qty int)"
        )
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_publication(Table("public", "live_stream"))
        pub = create_publication_id(slot)

        t = threading.Thread(
            target=run_daemon_pgwire,
            kwargs=dict(
                **live_pg, slot=slot, out_dir=frames, publication=pub,
                start_lsn=0, ack_interval_s=0.3, max_frames=8,
                stop=lambda: stop["flag"],
            ),
            daemon=True,
        )
        t.start()

        def drain() -> int:
            """One incremental streaming pass over the frame dir."""
            register(spark)
            q = (
                spark.readStream.format("postgres_cdc")
                .option("capture_dir", frames)
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return (
                spark.read.parquet(sink).filter("`table` = 'live_stream'").count()
            )

        # wave 1: the daemon is live while these commit
        ex.command(
            "INSERT INTO public.live_stream "
            "SELECT i, i * 10 FROM generate_series(1, 30) g(i)"
        )
        ex.command("DELETE FROM public.live_stream WHERE id > 25")
        t1 = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _wait_confirmed_flush(ex, slot, t1)
        n1 = drain()
        assert n1 == 35  # 30 inserts + 5 deletes

        # wave 2: daemon never restarted; stream resumes from checkpoint
        ex.command("UPDATE public.live_stream SET qty = qty + 1 WHERE id <= 10")
        ex.command("INSERT INTO public.live_stream VALUES (200, 0)")
        t2 = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _wait_confirmed_flush(ex, slot, t2)
        n2 = drain()
        assert n2 == n1 + 11  # exactly the new envelopes, no replays

        env = spark.read.parquet(sink).filter("`table` = 'live_stream'")
        keyed = env.withColumn(
            "pk", F.coalesce(F.col("after")["id"], F.col("before")["id"])
        )
        state = (
            latest_per_key(keyed, ["pk"])
            .filter("op <> 'DELETE'")
            .select(
                F.col("pk").cast("int").alias("id"),
                F.col("after")["qty"].cast("int").alias("qty"),
            )
        )
        got = {(r["id"], r["qty"]) for r in state.collect()}
        want = {
            (int(i), int(q))
            for i, q in ex.query("SELECT id, qty FROM public.live_stream")
        }
        assert got == want and len(want) == 26
        conn.drop_publication()
    finally:
        stop["flag"] = True
        if t is not None:
            t.join(15)
        # slot drop needs the walsender gone
        try:
            Conn("pgwire://local", executor=ex).drop_slot(slot)
        except Exception:
            pass
        ex.close()
        for d in (frames, ckpt, sink):
            shutil.rmtree(d, ignore_errors=True)


def test_live_ivm_view_maintenance(live_pg, spark):
    """The reference's reason to exist, live end-to-end: a real
    PostgreSQL table -> capture daemon -> Structured Streaming ->
    INCREMENTALLY maintained aggregate view (signed-delta IVM fold,
    never recomputing from history). REPLICA IDENTITY FULL gives the
    full before-images that make the fold a commutative monoid; two
    transaction waves drain through two checkpointed passes into ONE
    versioned view, which must equal the live GROUP BY at the end."""
    from pyspark.sql import functions as F

    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.sources.pgwire import run_daemon_pgwire
    from postrack_spark.sources.postgres_cdc import register
    from postrack_spark.streaming import foreach_batch_incremental_agg
    from postrack_spark.streaming.sinks import read_view

    ex = _executor(live_pg)
    slot = "live_ivm_slot"
    frames = tempfile.mkdtemp(prefix="pglive_ivmf_")
    view_dir = tempfile.mkdtemp(prefix="pglive_ivmv_")
    ckpt = tempfile.mkdtemp(prefix="pglive_ivmc_")
    stop = {"flag": False}
    t = None
    try:
        ex.command("DROP TABLE IF EXISTS public.live_ivm")
        ex.command(
            "CREATE TABLE public.live_ivm "
            "(id int primary key, status text, cents bigint)"
        )
        ex.command("ALTER TABLE public.live_ivm REPLICA IDENTITY FULL")
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_publication(Table("public", "live_ivm"))
        pub = create_publication_id(slot)
        t = threading.Thread(
            target=run_daemon_pgwire,
            kwargs=dict(
                **live_pg, slot=slot, out_dir=frames, publication=pub,
                start_lsn=0, ack_interval_s=0.3, max_frames=8,
                stop=lambda: stop["flag"],
            ),
            daemon=True,
        )
        t.start()

        def drain() -> None:
            register(spark)
            stream = (
                spark.readStream.format("postgres_cdc")
                .option("capture_dir", frames)
                .load()
                .filter("`table` = 'live_ivm'")
            )
            _, q = foreach_batch_incremental_agg(
                stream,
                dims={"status": F.element_at(F.col("img"), "status")},
                measures={
                    "cents": F.element_at(F.col("img"), "cents").cast("long")
                },
                target_dir=view_dir,
                checkpoint_dir=ckpt,
            )
            q.awaitTermination()

        # wave 1: inserts + an update + a delete
        ex.command(
            "INSERT INTO public.live_ivm "
            "SELECT i, CASE WHEN i % 3 = 0 THEN 'open' ELSE 'done' END, "
            "i * 100 FROM generate_series(1, 40) g(i)"
        )
        ex.command(
            "UPDATE public.live_ivm SET status = 'open', cents = cents + 5 "
            "WHERE id % 10 = 1"
        )
        ex.command("DELETE FROM public.live_ivm WHERE id % 20 = 0")
        t1 = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _wait_confirmed_flush(ex, slot, t1)
        drain()

        # wave 2 on the SAME maintained view (no recompute, same ckpt)
        ex.command("UPDATE public.live_ivm SET status = 'done' WHERE id <= 5")
        ex.command("INSERT INTO public.live_ivm VALUES (500, 'open', 7)")
        ex.command("DELETE FROM public.live_ivm WHERE id = 3")
        t2 = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _wait_confirmed_flush(ex, slot, t2)
        drain()

        got = {
            (r["status"], r["n_rows"], r["cents"])
            for r in read_view(spark, view_dir)
            .filter("n_rows > 0")
            .select("status", "n_rows", "cents")
            .collect()
        }
        want = {
            (s, int(n), int(c))
            for s, n, c in ex.query(
                "SELECT status, count(*), sum(cents) FROM public.live_ivm "
                "GROUP BY status"
            )
        }
        assert got == want and len(want) == 2
        conn.drop_publication()
    finally:
        stop["flag"] = True
        if t is not None:
            t.join(15)
        try:
            Conn("pgwire://local", executor=ex).drop_slot(slot)
        except Exception:
            pass
        ex.close()
        for d in (frames, view_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_live_v2_streamed_transaction(live_pg, spark):
    """Protocol v2 with streaming: logical_decoding_work_mem=64kB makes
    the server stream a large in-progress transaction (StreamStart /
    StreamStop / StreamCommit frames) — the real-server version of the
    recorded-session fixture, exercising the writer's stream re-seeding
    across rolled files and the decoder's commit-time buffering."""
    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.sources.capture import FrameFileWriter
    from postrack_spark.sources.postgres_cdc import (
        read_frame_file,
        register,
    )

    ex = _executor(live_pg)
    slot, out_dir = "live_v2_slot", tempfile.mkdtemp(prefix="pglive_v2_")
    try:
        ex.command("DROP TABLE IF EXISTS public.live_v2")
        ex.command("CREATE TABLE public.live_v2 (id int primary key, pad text)")
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_publication(Table("public", "live_v2"))
        pub = create_publication_id(slot)

        # one big transaction (>> 64kB decoded) => server streams it
        ex.command(
            "INSERT INTO public.live_v2 "
            "SELECT i, repeat('x', 200) FROM generate_series(1, 2000) g(i)"
        )
        target = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _run_capture(
            live_pg, slot, pub, out_dir, start_lsn=0, until_lsn=target,
            proto_version=2, streaming=True,
        )

        # the server really streamed: StreamStart frames on disk
        kinds = set()
        for name in sorted(os.listdir(out_dir)):
            for fr in read_frame_file(os.path.join(out_dir, name)):
                kinds.add(FrameFileWriter._payload_kind(fr))
        assert b"S" in kinds and b"c" in kinds, f"no v2 stream frames: {kinds}"

        register(spark)
        env = (
            spark.read.format("postgres_cdc")
            .option("capture_dir", out_dir)
            .load()
            .filter("`table` = 'live_v2'")
        )
        assert env.filter("op = 'INSERT'").count() == 2000
        assert env.select("txid").distinct().count() == 1
        conn.drop_publication()
        conn.drop_slot(slot)
    finally:
        ex.close()


def test_live_two_phase_prepared_transactions(live_pg, spark):
    """Protocol v3 two-phase decoding against the real server: a slot
    created WITH TWO_PHASE, one transaction PREPAREd then COMMIT
    PREPARED (its rows must arrive exactly once, stamped with the
    commit), one PREPAREd then ROLLBACK PREPARED (its rows must never
    surface) — the live proof for the b/P/K/r decoder lanes and the
    writer's prepared-block re-seeding."""
    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.sources.postgres_cdc import register

    ex = _executor(live_pg)
    slot, out_dir = "live_2pc_slot", tempfile.mkdtemp(prefix="pglive_2pc_")
    try:
        ex.command("DROP TABLE IF EXISTS public.live_2pc")
        ex.command("CREATE TABLE public.live_2pc (id int primary key, v text)")
        conn = Conn("pgwire://local", executor=ex)
        conn.add_slot(slot, two_phase=True)
        conn.slot = slot
        conn.set_publication(Table("public", "live_2pc"))
        pub = create_publication_id(slot)

        # prepared + committed
        ex.command(
            "BEGIN; INSERT INTO public.live_2pc VALUES (1, 'a'), (2, 'b');"
            " PREPARE TRANSACTION 'live_g1';"
        )
        # prepared + rolled back
        ex.command(
            "BEGIN; INSERT INTO public.live_2pc VALUES (9, 'x');"
            " PREPARE TRANSACTION 'live_g2';"
        )
        ex.command("COMMIT PREPARED 'live_g1'")
        ex.command("ROLLBACK PREPARED 'live_g2'")
        # an ordinary transaction after, proving the session continues
        ex.command("INSERT INTO public.live_2pc VALUES (3, 'c')")
        target = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _run_capture(
            live_pg, slot, pub, out_dir, start_lsn=0, until_lsn=target,
            proto_version=3, two_phase=True,
        )

        # the server really sent two-phase frames
        from postrack_spark.sources.capture import FrameFileWriter
        from postrack_spark.sources.postgres_cdc import read_frame_file

        kinds = set()
        for name in sorted(os.listdir(out_dir)):
            for fr in read_frame_file(os.path.join(out_dir, name)):
                kinds.add(FrameFileWriter._payload_kind(fr))
        assert b"b" in kinds and b"P" in kinds and b"K" in kinds, kinds
        assert b"r" in kinds, kinds

        register(spark)
        env = (
            spark.read.format("postgres_cdc")
            .option("capture_dir", out_dir)
            .load()
            .filter("`table` = 'live_2pc'")
        )
        rows = {
            r["after"]["id"]: r["txid"]
            for r in env.filter("op = 'INSERT'").collect()
        }
        assert set(rows) == {"1", "2", "3"}  # 9 rolled back, never emitted
        assert rows["1"] == rows["2"] != rows["3"]
        conn.drop_publication()
        conn.drop_slot(slot)
    finally:
        ex.close()


def test_live_publication_row_filter_and_column_list(live_pg, spark):
    """WithSelector/WithCondition against the real server (PG15
    publication column lists + row filters): the SERVER must publish
    only the listed columns and only rows passing the filter — the
    reference's source-side projection/predicate (postrack.go:45-55),
    proven end to end rather than by DDL text."""
    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.sources.postgres_cdc import register

    ex = _executor(live_pg)
    slot, out_dir = "live_filt_slot", tempfile.mkdtemp(prefix="pglive_filt_")
    try:
        ex.command("DROP TABLE IF EXISTS public.live_filt")
        ex.command(
            "CREATE TABLE public.live_filt "
            "(id int primary key, keep int NOT NULL, secret text, v text)"
        )
        # UPDATE/DELETE through a row filter require the filter columns
        # in the replica identity (PG15 rule) — use a unique index
        ex.command(
            "CREATE UNIQUE INDEX live_filt_rid ON public.live_filt (id, keep)"
        )
        ex.command(
            "ALTER TABLE public.live_filt REPLICA IDENTITY "
            "USING INDEX live_filt_rid"
        )
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_publication(
            Table("public", "live_filt",
                  selector=["id", "keep", "v"], condition="keep = 1")
        )
        pub = create_publication_id(slot)
        ex.command(
            "INSERT INTO public.live_filt VALUES "
            "(1, 1, 's1', 'a'), (2, 0, 's2', 'b'), (3, 1, 's3', 'c')"
        )
        # the filtered-out update goes FIRST: nothing it produces is
        # published, so the ack target must be set by a published op
        ex.command("UPDATE public.live_filt SET v = 'b2' WHERE id = 2")
        ex.command("UPDATE public.live_filt SET v = 'c2' WHERE id = 3")
        target = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _run_capture(live_pg, slot, pub, out_dir, start_lsn=0,
                     until_lsn=target)
        register(spark)
        env = (
            spark.read.format("postgres_cdc")
            .option("capture_dir", out_dir)
            .load()
            .filter("`table` = 'live_filt'")
        )
        rows = env.collect()
        # row filter: id=2 (keep=0) never published, in any op
        ids = sorted(r["after"]["id"] for r in rows if r["after"])
        assert ids == ["1", "3", "3"]  # 2 inserts + 1 update
        # column list: 'secret' never crosses the wire
        for r in rows:
            for img in (r["after"], r["before"]):
                if img:
                    assert "secret" not in img, img
                    assert set(img) <= {"id", "keep", "v"}
        conn.drop_publication()
        conn.drop_slot(slot)
    finally:
        ex.close()


def test_live_logical_messages(live_pg, spark):
    """NINTH live leg: pg_logical_emit_message through a real
    walsender with the pgoutput 'messages' option — the server sends
    'M' frames (transactional ones inside their transaction,
    non-transactional ones immediately) and the decoder surfaces them
    in DecoderState.messages with prefix/content/txid intact, while
    ordinary row traffic in the same capture decodes unchanged. The
    golden 'M'-frame tests pinned the byte layout; this pins the
    SERVER's."""
    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.sources.pgoutput import (
        DecoderState,
        decode_xlogdata_stream,
    )
    from postrack_spark.sources.postgres_cdc import read_frame_file

    ex = _executor(live_pg)
    slot, out_dir = "live_msg_slot", tempfile.mkdtemp(prefix="pglive_msg_")
    try:
        ex.command("DROP TABLE IF EXISTS public.live_msg")
        ex.command("CREATE TABLE public.live_msg (id int primary key, v text)")
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_publication(Table("public", "live_msg"))
        pub = create_publication_id(slot)

        # transactional message riding a real transaction's commit
        ex.command(
            "BEGIN;"
            " INSERT INTO public.live_msg VALUES (1, 'a');"
            " SELECT pg_logical_emit_message(true, 'postrack', 'tx-hello');"
            " COMMIT;"
        )
        # non-transactional: delivered on its own, no commit needed
        ex.command(
            "SELECT pg_logical_emit_message(false, 'postrack', 'raw-ping')")
        ex.command("INSERT INTO public.live_msg VALUES (2, 'b')")
        target = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _run_capture(live_pg, slot, pub, out_dir, start_lsn=0,
                     until_lsn=target, messages=True)

        state = DecoderState()
        rows = []
        for name in sorted(os.listdir(out_dir)):
            rows += decode_xlogdata_stream(
                read_frame_file(os.path.join(out_dir, name)), state)
        by_content = {bytes.fromhex(m["content"][2:]).decode(): m
                      for m in state.messages if m["prefix"] == "postrack"}
        assert set(by_content) == {"tx-hello", "raw-ping"}
        assert by_content["tx-hello"]["transactional"] is True
        assert by_content["raw-ping"]["transactional"] is False
        # the transactional message carries its transaction's xid; row
        # traffic in the same capture decoded unchanged
        ids = {r["after"]["id"] for r in rows
               if r["table"] == "live_msg" and r["op"] == "INSERT"}
        assert ids == {"1", "2"}
        tx_xids = {r["txid"] for r in rows if r["after"]["id"] == "1"}
        assert by_content["tx-hello"]["txid"] in tx_xids
        conn.drop_publication()
        conn.drop_slot(slot)
    finally:
        ex.close()

def test_live_truncate_and_mid_stream_schema_change(live_pg, spark):
    """TENTH live leg: TRUNCATE decode and mid-stream schema evolution
    through a real walsender. Publications publish truncate by default
    (PG11+), so a TRUNCATE arrives as a 'T' frame and surfaces as a
    TRUNCATE envelope for each relation; an ALTER TABLE ADD COLUMN
    makes the server send a FRESH Relation message before the next
    row, and the decoder picks up the widened schema mid-capture — the
    golden mid-stream-evolution test pinned the bytes, this pins the
    SERVER's."""
    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.sources.pgoutput import (
        DecoderState,
        decode_xlogdata_stream,
    )
    from postrack_spark.sources.postgres_cdc import read_frame_file

    ex = _executor(live_pg)
    slot, out_dir = "live_trunc_slot", tempfile.mkdtemp(prefix="pglive_tr_")
    try:
        ex.command("DROP TABLE IF EXISTS public.live_tr")
        ex.command("CREATE TABLE public.live_tr (id int primary key, v text)")
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_publication(Table("public", "live_tr"))
        pub = create_publication_id(slot)
        assert ex.query(
            "SELECT pubtruncate FROM pg_publication"
            f" WHERE pubname = '{pub}'")[0][0] in (True, "t")

        ex.command("INSERT INTO public.live_tr VALUES (1, 'a'), (2, 'b')")
        ex.command("TRUNCATE public.live_tr")
        ex.command("INSERT INTO public.live_tr VALUES (3, 'c')")
        # mid-stream evolution: widen the relation, then write through it
        ex.command("ALTER TABLE public.live_tr ADD COLUMN w int")
        ex.command("INSERT INTO public.live_tr VALUES (4, 'd', 44)")
        target = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _run_capture(live_pg, slot, pub, out_dir, start_lsn=0,
                     until_lsn=target)

        state = DecoderState()
        rows = []
        for name in sorted(os.listdir(out_dir)):
            rows += decode_xlogdata_stream(
                read_frame_file(os.path.join(out_dir, name)), state)
        tr = [r for r in rows if r["table"] == "live_tr"]
        ops = [(r["op"], (r["after"] or {}).get("id")) for r in tr]
        assert ops == [("INSERT", "1"), ("INSERT", "2"),
                       ("TRUNCATE", None),
                       ("INSERT", "3"), ("INSERT", "4")]
        # truncate envelope carries no images
        t_env = tr[2]
        assert t_env["after"] is None and t_env["before"] is None
        # pre-evolution rows have the narrow schema, post-evolution the
        # widened one with the value decoded
        assert set(tr[1]["after"]) == {"id", "v"}
        assert tr[4]["after"] == {"id": "4", "v": "d", "w": "44"}
        conn.drop_publication()
        conn.drop_slot(slot)
    finally:
        ex.close()


def test_live_cdc_to_delta_lakehouse_capstone(live_pg, spark):
    """ELEVENTH live leg (round 8) — Postgres to the LAKEHOUSE in one
    pipeline with zero glue code: real walsender -> capture daemon ->
    postgres_cdc stream source -> ``writeStream.format("pydelta")``
    (the round-8 DataSource streaming sink; txn-action exactly-once)
    -> Delta transaction log. The materialized latest-per-key fold
    over read_delta equals the live table after two transaction waves
    and a RESUMED drain, which can only hold if the sink committed
    each micro-batch exactly once into the log."""
    from pyspark.sql import functions as F

    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.cdc.materialize import latest_per_key
    from postrack_spark.sources.lakehouse_ds import (
        register_lakehouse_sources,
    )
    from postrack_spark.sources.pgwire import run_daemon_pgwire
    from postrack_spark.sources.postgres_cdc import register
    from postrack_spark.streaming.delta_log import (
        last_txn_version,
        read_delta,
    )

    ex = _executor(live_pg)
    slot = "live_lake_slot"
    frames = tempfile.mkdtemp(prefix="pglive_lkf_")
    ckpt = tempfile.mkdtemp(prefix="pglive_lkc_")
    table = tempfile.mkdtemp(prefix="pglive_lkd_")
    stop = {"flag": False}
    t = None
    try:
        ex.command("DROP TABLE IF EXISTS public.live_lake")
        ex.command(
            "CREATE TABLE public.live_lake (id int primary key, qty int)")
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_publication(Table("public", "live_lake"))
        pub = create_publication_id(slot)
        t = threading.Thread(
            target=run_daemon_pgwire,
            kwargs=dict(
                **live_pg, slot=slot, out_dir=frames, publication=pub,
                start_lsn=0, ack_interval_s=0.3, max_frames=8,
                stop=lambda: stop["flag"],
            ),
            daemon=True,
        )
        t.start()

        def drain() -> None:
            register(spark)
            register_lakehouse_sources(spark)
            q = (
                spark.readStream.format("postgres_cdc")
                .option("capture_dir", frames)
                .load()
                .writeStream.format("pydelta")
                .option("path", table)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        ex.command(
            "INSERT INTO public.live_lake "
            "SELECT i, i * 10 FROM generate_series(1, 30) g(i)")
        ex.command("DELETE FROM public.live_lake WHERE id > 25")
        t1 = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _wait_confirmed_flush(ex, slot, t1)
        drain()
        env1 = read_delta(spark, table).filter("`table` = 'live_lake'")
        assert env1.count() == 35  # 30 inserts + 5 deletes
        assert last_txn_version(table) is not None

        ex.command(
            "UPDATE public.live_lake SET qty = qty + 1 WHERE id <= 10")
        ex.command("INSERT INTO public.live_lake VALUES (200, 0)")
        t2 = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _wait_confirmed_flush(ex, slot, t2)
        drain()  # resumed drain: checkpoint + txn actions, no replays
        env = read_delta(spark, table).filter("`table` = 'live_lake'")
        assert env.count() == 46  # exactly the 11 new envelopes

        keyed = env.withColumn(
            "pk", F.coalesce(F.col("after")["id"], F.col("before")["id"]))
        state = (
            latest_per_key(keyed, ["pk"])
            .filter("op <> 'DELETE'")
            .select(
                F.col("pk").cast("int").alias("id"),
                F.col("after")["qty"].cast("int").alias("qty"),
            )
        )
        got = {(r["id"], r["qty"]) for r in state.collect()}
        want = {
            (int(i), int(q))
            for i, q in ex.query("SELECT id, qty FROM public.live_lake")
        }
        assert got == want and len(want) == 26
        conn.drop_publication()
    finally:
        stop["flag"] = True
        if t is not None:
            t.join(15)
        try:
            Conn("pgwire://local", executor=ex).drop_slot(slot)
        except Exception:
            pass
        ex.close()
        for d in (frames, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_live_schema_level_publication(live_pg, spark):
    """TWELFTH live leg: PG15 ``FOR TABLES IN SCHEMA`` publications.
    The schema-scope property a table list cannot give you: a table
    created AFTER the publication exists is published automatically —
    its rows must stream with zero DDL reconciliation. Two pre-existing
    tables and one post-publication table all flow through one
    capture; the pg_publication_namespaces catalog probe
    (publication_schema_exists) and the set_schema_publication upsert
    path (ALTER ... ADD TABLES IN SCHEMA) are exercised against the
    real server."""
    from postrack_spark.api import Conn, create_publication_id
    from postrack_spark.sources.postgres_cdc import register

    ex = _executor(live_pg)
    slot, out_dir = "live_schpub_slot", tempfile.mkdtemp(prefix="pglive_sch_")
    try:
        ex.command("DROP SCHEMA IF EXISTS app CASCADE")
        ex.command("CREATE SCHEMA app")
        ex.command("CREATE TABLE app.t1 (id int primary key, v text)")
        ex.command("CREATE TABLE app.t2 (id int primary key, n int)")
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_schema_publication("app")
        pub = create_publication_id(slot)
        assert conn.publication_schema_exists(pub, "app")
        assert not conn.publication_schema_exists(pub, "public")
        # upsert path: second call must take the ALTER branch, not
        # fail on CREATE of an existing publication
        conn.set_schema_publication("app")

        ex.command("INSERT INTO app.t1 VALUES (1, 'a'), (2, 'b')")
        ex.command("INSERT INTO app.t2 VALUES (10, 100)")
        # the schema-publication property: a table born AFTER the
        # publication still publishes
        ex.command("CREATE TABLE app.t3 (id int primary key, w text)")
        ex.command("INSERT INTO app.t3 VALUES (7, 'late')")
        ex.command("UPDATE app.t1 SET v = 'a2' WHERE id = 1")
        target = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _run_capture(live_pg, slot, pub, out_dir, start_lsn=0,
                     until_lsn=target)
        register(spark)
        env = (
            spark.read.format("postgres_cdc")
            .option("capture_dir", out_dir)
            .load()
            .filter("`schema` = 'app'")
        )
        rows = env.collect()
        by_table = {}
        for r in rows:
            by_table.setdefault(r["table"], []).append(r)
        assert sorted(by_table) == ["t1", "t2", "t3"]
        assert sorted(r["after"]["id"] for r in by_table["t1"]
                      if r["op"] == "INSERT") == ["1", "2"]
        assert [r["after"]["w"] for r in by_table["t3"]] == ["late"]
        assert [r["after"]["v"] for r in by_table["t1"]
                if r["op"] == "UPDATE"] == ["a2"]
        conn.drop_publication()
        conn.drop_slot(slot)
    finally:
        ex.close()


def test_live_binary_mode_tuples(live_pg, spark):
    """THIRTEENTH live leg: pgoutput ``binary 'on'`` (PG14+). The
    server sends 'b' TupleData columns (network-order binary send
    format) for every type with a binary send function; the decoder
    surfaces them losslessly in bytea text form. The leg pins the
    exact wire representations: int4 as 4-byte big-endian, text as its
    UTF-8 bytes, bytea identical to what text mode would hex-encode —
    proving the 'b' column lane against a real walsender, not a
    synthetic frame."""
    from postrack_spark.api import Conn, Table, create_publication_id
    from postrack_spark.sources.postgres_cdc import register

    ex = _executor(live_pg)
    slot, out_dir = "live_bin_slot", tempfile.mkdtemp(prefix="pglive_bin_")
    try:
        ex.command("DROP TABLE IF EXISTS public.live_bin")
        ex.command(
            "CREATE TABLE public.live_bin "
            "(id int primary key, label text, payload bytea)")
        conn = Conn("pgwire://local", executor=ex)
        conn.set_slot(slot)
        conn.set_publication(Table("public", "live_bin"))
        pub = create_publication_id(slot)
        ex.command(
            "INSERT INTO public.live_bin VALUES "
            "(7, 'abc', '\\x0102ff'::bytea)")
        target = _parse_lsn(ex.query("SELECT pg_current_wal_lsn()")[0][0])
        _run_capture(live_pg, slot, pub, out_dir, start_lsn=0,
                     until_lsn=target, binary=True)
        register(spark)
        rows = (
            spark.read.format("postgres_cdc")
            .option("capture_dir", out_dir)
            .load()
            .filter("`table` = 'live_bin'")
            .collect()
        )
        assert len(rows) == 1
        after = rows[0]["after"]
        assert after["id"] == "\\x00000007"      # int4 binary send: BE
        assert after["label"] == "\\x616263"     # text binary send: UTF-8
        assert after["payload"] == "\\x0102ff"   # bytea: raw bytes
        conn.drop_publication()
        conn.drop_slot(slot)
    finally:
        ex.close()
