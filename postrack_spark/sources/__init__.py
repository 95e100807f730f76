"""Sources: pgoutput decoding + the postgres_cdc PySpark DataSource.

Capture (live WAL streaming from Postgres) is external to Spark per the
north star (BASELINE.json): a capture process appends raw pgoutput
frames (or decoded envelope JSONL) to a directory/topic; Spark reads,
decodes, and processes. The decoder here is unit-tested against golden
pgoutput byte fixtures (FIXTURES.md §B.5) — no live Postgres needed.
"""
