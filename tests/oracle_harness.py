"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the documented gate: row-count + schema + order-insensitive
value hash, with columns sorted by name before hashing. Used by
tests/test_oracle.py at sf0.001 (fast) and scripts at sf0.01.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_value(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _rows_to_multiset(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_norm_value(r[i]) for i in order) for r in rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(name, spark_df, con, oracle) -> CompareResult:
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle)
    oracle_cols = [d[0].lower() for d in res.description]
    oracle_rows = res.fetchall()

    if sorted(spark_cols) != sorted(oracle_cols):
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}",
        )
    if len(spark_rows) != len(oracle_rows):
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"row count mismatch: {len(spark_rows)} vs {len(oracle_rows)}",
        )
    s = _rows_to_multiset(spark_cols, spark_rows)
    o = _rows_to_multiset(oracle_cols, oracle_rows)
    if s != o:
        diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows), f"value mismatch, first diffs: {diff}"
        )
    return CompareResult(name, True, len(spark_rows), len(oracle_rows))
