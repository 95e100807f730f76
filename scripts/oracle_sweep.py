#!/usr/bin/env python
"""Run every oracle-gated query against DuckDB at an arbitrary SF dir.

Usage: python scripts/oracle_sweep.py [/root/testdata/sf0.1] [--streaming]

The driver's correctness gate runs at sf0.01; this sweep exists to
catch scale-dependent divergences before the driver would (it found a
cross-engine round-half boundary at sf0.1 that sf0.01 never hits).
Streaming queries are skipped by default (per-query checkpoint setup
dominates); pass --streaming to include them.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from postrack_spark.session import get_spark
from tests.oracle_harness import duckdb_connection, compare


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    include_streaming = "--streaming" in sys.argv
    spark = get_spark("oracle-sweep")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb_connection(sf_dir)
    bad, n = [], 0
    t0 = time.time()
    for name in sorted(qs):
        if name not in oracles:
            continue
        if name.startswith("streaming_") and not include_streaming:
            continue
        n += 1
        try:
            r = compare(name, qs[name](spark, sf_dir), con, oracles[name])
            if not r.ok:
                bad.append((name, r.detail[:120]))
        except Exception as ex:  # noqa: BLE001 — a sweep reports, never aborts
            bad.append((name, f"EXCEPTION {ex}"[:120]))
    print(f"{n - len(bad)}/{n} ok at {sf_dir} in {round(time.time() - t0)}s")
    for name, detail in bad:
        print("FAIL", name, detail)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
