"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 — a fast local replica of the driver's t2 correctness gate.
Queries without an oracle must at least run and return a stable schema.
"""

from __future__ import annotations

import pytest

from postrack_spark.queries import load_all
from tests.oracle_harness import compare

SPECS = load_all()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(name, spark, duck, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    result = compare(name, df, duck, spec.oracle)
    assert result.ok, f"{name}: {result.detail}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
