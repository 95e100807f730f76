"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the dominant cost of a selective multi-predicate scan is the
files it CANNOT skip. Sorting the write layout by one key makes that
key's parquet min/max footers tight but leaves every other dimension's
ranges as wide as the whole domain — a `WHERE custkey BETWEEN …
AND orderdate BETWEEN …` query prunes on one dimension and reads
everything else. Interleaving the bits of both dimensions (the
Z-order / Morton curve, a public technique used by every lakehouse
layout optimizer) makes a RANGE partition of the code a small axis-
aligned rectangle in BOTH dimensions at once, so every file's footer
is tight on every participating column.

Everything here is pure integer arithmetic (scale to a fixed bit
budget with floor division, interleave with shift/and/add), so the
code is whole-stage-codegen'd scan-side work — no shuffle beyond the
single repartitionByRange that any layout rewrite needs, no Python,
and the identical formula runs in any ANSI engine (the oracle SQL is
generated from the same bit plan; Spark text uses shiftleft/right
functions, portable text uses << / >>).

Reference N/A (postrack.go is a CDC client with no storage layout);
this exists for the 100 TB north star. Skipping quality is certified
by the registry query `layout_zorder_extent_skipping`, which measures
per-bucket extents of each dimension under z-order vs single-key
layouts — deterministic integers, hash-gated against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scaled_expr(col: str, min_col: str, max_col: str, bits: int,
                dialect: str) -> str:
    """``col`` min-max scaled onto [0, 2**bits) as an integer.

    Floor division on non-negative operands only — Spark's truncating
    DIV and DuckDB's flooring // agree there (the Theil-Sen trap).
    """
    top = (1 << bits) - 1
    span = f"(CAST({max_col} AS BIGINT) - CAST({min_col} AS BIGINT))"
    off = f"(CAST({col} AS BIGINT) - CAST({min_col} AS BIGINT))"
    div = "DIV" if dialect == "spark" else "//"
    return f"(({off} * {top}) {div} GREATEST({span}, 1))"


def interleave_expr(x: str, y: str, bits: int, dialect: str) -> str:
    """Morton interleave of two `bits`-bit non-negative ints.

    Disjoint bit positions, so the parts combine with + (portable;
    avoids needing a bitwise-OR spelling per engine).
    """
    parts = []
    for i in range(bits):
        if dialect == "spark":
            xbit = f"(shiftright({x}, {i}) & 1)"
            ybit = f"(shiftright({y}, {i}) & 1)"
            parts.append(f"shiftleft({xbit}, {2 * i})")
            parts.append(f"shiftleft({ybit}, {2 * i + 1})")
        else:
            parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
            parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(parts) + ")"


def z_value(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Z-order code column for two non-negative pre-scaled ints."""
    x_sql = x if isinstance(x, str) else x._jc.toString()  # noqa: SLF001
    y_sql = y if isinstance(y, str) else y._jc.toString()  # noqa: SLF001
    return F.expr(interleave_expr(f"CAST({x_sql} AS BIGINT)",
                                  f"CAST({y_sql} AS BIGINT)", bits, "spark"))


def zorder_repartition(df: DataFrame, x: str, y: str, bits: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    """Rewrite ``df``'s layout clustered on the Z-curve of (x, y).

    Scales both columns onto [0, 2**bits) with a broadcast 1-row
    bounds combine (the only extra pass a layout rewrite needs), adds
    the Morton code, and range-partitions on it, so each output file's
    (x, y) footer ranges are tight rectangles. Write the result with
    your sink of choice; downstream scans with predicates on EITHER
    column prune files.
    """
    bounds = df.agg(
        F.min(x).alias("__min_x"), F.max(x).alias("__max_x"),
        F.min(y).alias("__min_y"), F.max(y).alias("__max_y"),
    )
    scaled = df.crossJoin(F.broadcast(bounds)).selectExpr(
        "*",
        f"{scaled_expr(x, '__min_x', '__max_x', bits, 'spark')} AS __zx",
        f"{scaled_expr(y, '__min_y', '__max_y', bits, 'spark')} AS __zy",
    ).withColumn("__z", z_value("__zx", "__zy", bits))
    out = scaled.drop("__min_x", "__max_x", "__min_y", "__max_y",
                      "__zx", "__zy")
    if num_partitions:
        return out.repartitionByRange(num_partitions, "__z")
    return out.repartitionByRange("__z")
