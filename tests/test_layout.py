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


def _hilbert_py(n: int, x: int, y: int) -> int:
    """Reference xy2d (public algorithm)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


@given(
    st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 4095)),
        min_size=1, max_size=12,
    )
)
@settings(max_examples=10, deadline=None)
def test_hilbert_ctes_match_python_model(pairs):
    """The unrolled CTE chain IS the Hilbert index (DuckDB side; the
    Spark side runs the identical text and is covered by the
    layout_hilbert_vs_zorder_seams oracle gate)."""
    import duckdb

    from postrack_spark.queries.layout_queries import hilbert_ctes

    vals = ", ".join(f"({x}, {y})" for x, y in pairs)
    sql = (
        f"WITH src AS (SELECT * FROM (VALUES {vals}) t(x, y)),\n"
        + hilbert_ctes("x", "y", "src", ["x", "y"], 12)
        + "\nSELECT x, y, hd FROM hfin"
    )
    got = duckdb.sql(sql).fetchall()
    assert all(hd == _hilbert_py(4096, x, y) for x, y, hd in got)


def test_hilbert_is_continuous_zorder_jumps():
    """The structural claim behind the seam query: consecutive Hilbert
    indexes are ALWAYS adjacent cells (unit Manhattan step), while the
    Z-curve takes long jumps at quadrant seams."""
    bits = 5  # 32x32 grid: exhaustive
    n = 1 << bits
    _inv = {}
    for x in range(n):
        for y in range(n):
            _inv[_hilbert_py(n, x, y)] = (x, y)
    assert len(_inv) == n * n  # bijection
    max_step = 0
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = _inv[d], _inv[d + 1]
        max_step = max(max_step, abs(x1 - x2) + abs(y1 - y2))
    assert max_step == 1  # Hilbert: never jumps

    zinv = {_morton_py(x, y, bits): (x, y) for x in range(n) for y in range(n)}
    zjump = max(
        abs(zinv[d][0] - zinv[d + 1][0]) + abs(zinv[d][1] - zinv[d + 1][1])
        for d in range(n * n - 1)
    )
    assert zjump >= n  # Z-order: the main seam jump spans the grid side


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


def test_hilbert_value_column_plan_matches_model(spark):
    """The write-path Column chain equals the Python xy2d reference
    (and therefore the oracle text, which the hypothesis test pins to
    the same model)."""
    import random

    from postrack_spark.sources.layout import hilbert_value

    rng = random.Random(3)
    rows = [(rng.randrange(0, 4096), rng.randrange(0, 4096)) for _ in range(64)]
    rows += [(0, 0), (4095, 4095), (0, 4095), (4095, 0)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    got = hilbert_value(df, "x", "y", 12).collect()
    assert all(r["__h"] == _hilbert_py(4096, r["x"], r["y"]) for r in got)


def test_hilbert_repartition_preserves_rows_and_clusters(spark):
    import random

    from postrack_spark.sources.layout import hilbert_repartition

    rng = random.Random(11)
    rows = [(rng.randrange(1, 5000), rng.randrange(0, 2400)) for _ in range(1500)]
    df = spark.createDataFrame(rows, "custkey INT, day INT")
    out = hilbert_repartition(df, "custkey", "day", bits=12, num_partitions=8)
    assert set(out.columns) == {"custkey", "day", "__h"}
    got = sorted((r["custkey"], r["day"]) for r in out.collect())
    assert got == sorted(rows)

    from pyspark.sql import functions as F

    spans = sorted(
        (r["lo"], r["hi"])
        for r in out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("__h").alias("lo"), F.max("__h").alias("hi"))
        .collect()
    )
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next


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
