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
        # DTYPE-FAITHFUL (round-5 fix, VERDICT r4): floats must stay
        # visibly float.  The driver fetches the DuckDB side via pandas,
        # where HUGEINT/DECIMAL widenings surface as float64 — so an
        # integral float collapsed to "256" here would hide a "256.0 !=
        # 256" driver mismatch.  We still round to 6 significant digits
        # first (cross-engine double-association tolerance), then tag
        # integral results with a trailing ".0".
        if math.isnan(v):
            return "nan"
        r = float(f"{v:.6g}")
        if r == int(r) and abs(r) < 1e15:
            return f"{int(r)}.0"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


# Dtype-class audit (round-5, VERDICT r4 item 2): the driver's value hash
# is dtype-sensitive because it reads the oracle through pandas.  DuckDB
# silently widens sum(INTEGER/BIGINT) to HUGEINT, which pandas renders as
# float64 while the Spark side stays int64 — values identical, hash red.
# We therefore classify every output column on both sides and fail the
# compare when the classes differ.  HUGEINT gets its OWN class so it can
# never match anything — the only legal fix is CAST(... AS BIGINT) in the
# oracle text.

_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date", "binary": "binary",
    "timestamp": "ts", "timestamp_ntz": "ts",
}

_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "hugeint", "UHUGEINT": "hugeint",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date", "BLOB": "binary",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts", "TIMESTAMP_MS": "ts", "TIMESTAMP_S": "ts",
}


def _spark_type_class(dt: str) -> str:
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("array"):
        return "list"
    return _SPARK_CLASS.get(dt, dt)


def _duck_type_class(dt: str) -> str:
    if dt.startswith("DECIMAL"):
        return "decimal"
    if dt.endswith("[]") or dt.startswith("STRUCT") or dt.startswith("LIST"):
        return "list"
    return _DUCK_CLASS.get(dt, dt)


def dtype_mismatches(spark_df, oracle_cols, oracle_types) -> list[str]:
    """Per-column class mismatches between a Spark DF and a DuckDB relation."""
    spark_types = {c.lower(): dt for c, dt in spark_df.dtypes}
    bad = []
    for col, dt in zip(oracle_cols, oracle_types):
        sdt = spark_types.get(col)
        if sdt is None:
            continue  # column-set mismatch is reported separately
        sc, oc = _spark_type_class(sdt), _duck_type_class(str(dt))
        if sc != oc:
            bad.append(f"{col}: spark {sdt} ({sc}) vs duckdb {dt} ({oc})")
    return bad


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
    rel = con.sql(oracle)
    oracle_cols = [c.lower() for c in rel.columns]
    oracle_types = [str(t) for t in rel.types]
    oracle_rows = rel.fetchall()

    bad_types = dtype_mismatches(spark_df, oracle_cols, oracle_types)
    if bad_types:
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows),
            "dtype mismatch (driver hash is dtype-sensitive): " + "; ".join(bad_types),
        )
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
