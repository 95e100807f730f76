"""Z-order layout: bit-plan model checks, write-path/oracle-text
cross-pinning, and rewrite invariants.

Two implementations of the same Morton plan exist on purpose —
sources/layout.py's Column algebra (the write path) and
layout_queries.py's dialect text (the engine-parity oracle). These
tests pin BOTH to one Python reference and to each other, so they
cannot drift apart.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from postrack_spark.queries.layout_queries import interleave_expr, scaled_expr
from postrack_spark.sources.layout import zorder_repartition, zorder_value


def _morton_py(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 4095)),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_interleave_matches_python_model_both_dialects(pairs):
    """The generated oracle expression IS the Morton code, in both
    dialects."""
    import duckdb

    duck_expr = interleave_expr("x", "y", 12, "duck")
    vals = ", ".join(f"({x}, {y})" for x, y in pairs)
    got = duckdb.sql(
        f"SELECT {duck_expr} FROM (VALUES {vals}) t(x, y)"
    ).fetchall()
    assert [g[0] for g in got] == [_morton_py(x, y, 12) for x, y in pairs]


def test_spark_text_and_column_plans_agree(spark):
    """Cross-pin: the spark-dialect oracle text equals both the Python
    model and sources/layout.py's zorder_value Column plan."""
    from pyspark.sql import functions as F

    rows = [(0, 0), (1, 0), (0, 1), (4095, 4095), (2730, 1365), (7, 4000)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    got = df.select(
        F.expr(interleave_expr("x", "y", 12, "spark")).alias("z_text"),
        zorder_value(F.col("x"), F.col("y"), 12).alias("z_col"),
    ).collect()
    for (x, y), r in zip(rows, got):
        assert r["z_text"] == r["z_col"] == _morton_py(x, y, 12)


def test_scaled_expr_endpoints_and_degenerate_span(spark):
    """min -> 0, max -> 2**bits - 1; a constant column scales to 0
    (GREATEST guard) instead of dividing by zero."""
    df = spark.createDataFrame(
        [(10, 7), (55, 7), (100, 7)], "v INT, c INT"
    )
    b = df.selectExpr(
        "min(v) AS min_v", "max(v) AS max_v", "min(c) AS min_c",
        "max(c) AS max_c",
    )
    out = df.crossJoin(b).selectExpr(
        scaled_expr("v", "min_v", "max_v", 8, "spark") + " AS sv",
        scaled_expr("c", "min_c", "max_c", 8, "spark") + " AS sc",
    ).collect()
    svs = sorted(r["sv"] for r in out)
    assert svs[0] == 0 and svs[-1] == 255 and 0 < svs[1] < 255
    assert {r["sc"] for r in out} == {0}


def test_zorder_repartition_preserves_rows_and_clusters(spark):
    """Layout rewrite is a pure reshuffle: same row multiset, __z added;
    range partitions hold contiguous z-ranges (each file's footer is a
    z-interval, i.e. a bounded rectangle in both source dims)."""
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(1, 5000), rng.randrange(0, 2400)) for _ in range(2000)]
    df = spark.createDataFrame(rows, "custkey INT, day INT")
    out = zorder_repartition(df, "custkey", "day", bits=12, num_partitions=8)
    assert set(out.columns) == {"custkey", "day", "__z"}
    got = sorted((r["custkey"], r["day"]) for r in out.collect())
    assert got == sorted(rows)

    from pyspark.sql import functions as F

    spans = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in spans)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # disjoint contiguous z-ranges
