"""API parity layer tests against a fake Postgres executor: publication
/ slot lifecycle DDL must mirror the reference's behavior
(postrack.go:119-338) with the documented fixes (q1 honest naming,
q6 quoting, q7 publish= re-applied on alter).
"""

from __future__ import annotations

import pytest

from postrack_spark.api import Conn, Table, create_publication_id


class FakePostgres:
    """Records DDL; answers catalog probes from recorded state."""

    def __init__(self) -> None:
        self.commands: list[str] = []
        self.repl_commands: list[str] = []
        self.publications: set[str] = set()
        self.pub_tables: set[tuple[str, str, str]] = set()
        self.slots: set[str] = set()

    def query(self, sql: str, params: tuple = ()):
        if "pg_publication_tables" in sql:
            return [(True,)] if (params[0], params[1], params[2]) in self.pub_tables else []
        if "pg_publication" in sql:
            return [(True,)] if params[0] in self.publications else []
        if "pg_replication_slots" in sql:
            return [(True,)] if params[0] in self.slots else []
        raise AssertionError(f"unexpected query: {sql}")

    def command(self, sql: str) -> None:
        self.commands.append(sql)
        if sql.startswith("CREATE PUBLICATION"):
            pub = sql.split('"')[1]
            self.publications.add(pub)
        # table bookkeeping for ADD/DROP omitted: tests set pub_tables directly

    def replication_command(self, cmd: str) -> None:
        self.repl_commands.append(cmd)
        if cmd.startswith("CREATE_REPLICATION_SLOT"):
            self.slots.add(cmd.split('"')[1])


def test_create_publication_id():
    assert create_publication_id("myslot") == "publication_myslot"  # postrack.go:63-65


def test_table_clause_selector_condition():
    t = Table("public", "orders", selector=["a", "b"], condition="o_totalprice > 10")
    assert t.clause() == '"public"."orders" ("a", "b") WHERE (o_totalprice > 10)'
    # a caller-provided WHERE prefix is normalized (postrack.go:53 keeps it raw)
    t2 = Table("public", "orders", condition="WHERE x = 1")
    assert t2.clause().endswith("WHERE (x = 1)")


def test_bootstrap_setup_sequence():
    """Bootstrap ordering (postrack.go:320-338): events, lsn, slot,
    publications."""
    pg = FakePostgres()
    conn = Conn("postgres://x", executor=pg)
    conn.set_events(["INSERT", "UPDATE"])
    conn.set_lsn(42)
    conn.set_slot("s1")
    conn.set_publication(Table("public", "orders"))
    assert conn.slot == "s1"
    assert any(c.startswith("CREATE_REPLICATION_SLOT") for c in pg.repl_commands)
    assert pg.commands[0].startswith('CREATE PUBLICATION "publication_s1"')
    # event filter reaches the server via publish= (postrack.go:202-206)
    assert "publish = 'insert, update'" in pg.commands[0]


def test_set_slot_adopts_existing():
    pg = FakePostgres()
    pg.slots.add("s1")
    conn = Conn("dsn", executor=pg)
    conn.set_slot("s1")
    assert pg.repl_commands == []  # adopted, not recreated (postrack.go:258-268)


def test_alter_publication_keep_existing():
    """q1: Go's WithOverride actually means keep-existing; honest name."""
    pg = FakePostgres()
    conn = Conn("dsn", executor=pg)
    conn.slot = "s1"
    pg.publications.add("publication_s1")
    pg.pub_tables.add(("publication_s1", "public", "orders"))
    conn.set_publication(Table("public", "orders", keep_existing=True))
    assert pg.commands == []  # untouched


def test_alter_publication_replaces_and_reapplies_publish():
    """Existing table without keep_existing: DROP + ADD (postrack.go:
    222-236) and — fix q7 — publish= re-applied."""
    pg = FakePostgres()
    conn = Conn("dsn", executor=pg, events=["INSERT", "DELETE"])
    conn.slot = "s1"
    pg.publications.add("publication_s1")
    pg.pub_tables.add(("publication_s1", "public", "orders"))
    conn.set_publication(Table("public", "orders", condition="x > 1"))
    assert pg.commands[0].startswith('ALTER PUBLICATION "publication_s1" DROP TABLE')
    assert "ADD TABLE" in pg.commands[1] and "WHERE (x > 1)" in pg.commands[1]
    assert "SET (publish = 'insert, delete')" in pg.commands[2]


def test_drop_and_replace_publication():
    pg = FakePostgres()
    conn = Conn("dsn", executor=pg)
    conn.slot = "s1"
    conn.replace_publication(Table("public", "orders"))
    assert pg.commands[0].startswith("DROP PUBLICATION IF EXISTS")
    assert pg.commands[1].startswith("CREATE PUBLICATION")


def test_set_events_validates():
    conn = Conn("dsn")
    with pytest.raises(ValueError):
        conn.set_events(["UPSERT"])


def test_identifier_quoting_blocks_injection():
    """The reference string-interpolates DDL (postrack.go:206)."""
    t = Table("public", 'orders"; DROP TABLE x; --')
    assert 'DROP TABLE x' in t.qualified()
    assert t.qualified().count('"') >= 4  # embedded quote doubled
    assert '""' in t.qualified()
