"""Storage layout helpers: hive-partitioned writes and clustered files.

Partition pruning is the cheapest query accelerator at 100 TB: a scan
filtered on the partition column reads only matching directories — the
other partitions never become tasks at all. These helpers standardize
the two layout decisions a big-table write makes:

  write_partitioned — directory partitioning on low-cardinality columns
      (event date, table name, region). Rule of thumb: a partition
      should hold >= hundreds of MB; never partition on high-cardinality
      keys (millions of tiny dirs kill the file index).
  write_clustered  — within-file ordering on high-cardinality columns
      via repartition(range)+sortWithinPartitions before the write, so
      parquet row-group min/max stats become selective and point/range
      filters skip row groups (the poor man's Z-order, exact for one
      ordering column).

tests/test_scale_ops.py asserts the pruned-scan plan shape
(PartitionFilters reaching the FileScan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style partitioned parquet write (dir per partition value)."""
    writer = df.write.mode("overwrite").partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Range-partition + sort on `cluster_cols` before writing, so each
    output file covers a narrow key range and row-group min/max stats
    prune point/range predicates on those columns."""
    out = df.repartitionByRange(*cluster_cols) if n_files is None else df.repartitionByRange(
        n_files, *cluster_cols
    )
    out.sortWithinPartitions(*cluster_cols).write.mode("overwrite").parquet(path)


def zorder_value(col_a, col_b, bits: int = 16):
    """Interleave the low `bits` bits of two non-negative integral
    columns into a Z-order (Morton) value — pure JVM bit arithmetic
    (shiftleft/and/or via bitwise expressions), no UDF.

    Sorting by this value clusters rows so that BOTH columns' ranges
    are locally narrow in every file: multi-dimensional row-group
    skipping where single-column clustering (write_clustered) can only
    serve one predicate column. bits=16 keeps the result in a long and
    is plenty once values are first bucketed/quantized to 2^16."""
    from pyspark.sql import functions as F

    a = col_a.cast("long")
    b = col_b.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return out


def _with_scaled(df: DataFrame, x: str, y: str, bits: int):
    """df + __sx/__sy: both columns min-max scaled onto [0, 2**bits)
    via a broadcast 1-row bounds combine — the only extra pass a
    layout rewrite needs. Exact integer floor division (DIV) on
    non-negative operands, so the identical formula is portable to any
    ANSI engine (layout_queries generates the matching oracle text)."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        F.min(x).alias("__min_x"), F.max(x).alias("__max_x"),
        F.min(y).alias("__min_y"), F.max(y).alias("__max_y"),
    )
    top = (1 << bits) - 1

    def scaled(col: str, lo: str, hi: str):
        return F.expr(
            f"((CAST({col} AS BIGINT) - CAST({lo} AS BIGINT)) * {top}) DIV "
            f"GREATEST(CAST({hi} AS BIGINT) - CAST({lo} AS BIGINT), 1)"
        )

    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumns({
            "__sx": scaled(x, "__min_x", "__max_x"),
            "__sy": scaled(y, "__min_y", "__max_y"),
        })
        .drop("__min_x", "__max_x", "__min_y", "__max_y")
    )


def zorder_repartition(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 12,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rewrite ``df``'s layout clustered on the Z-curve of (x, y).
    Returns the frame range-partitioned on a ``__z`` column so each
    output file's (x, y) footer ranges are tight rectangles; write
    with any sink, or use `write_zordered` for pre-quantized columns.
    Clustering quality is hash-certified by the registry queries
    `layout_zorder_extent_skipping` / `layout_zone_map_workload_sim`.
    """
    from pyspark.sql import functions as F

    with_z = (
        _with_scaled(df, x, y, bits)
        .withColumn("__z", zorder_value(F.col("__sx"), F.col("__sy"), bits))
        .drop("__sx", "__sy")
    )
    if num_partitions:
        return with_z.repartitionByRange(num_partitions, "__z")
    return with_z.repartitionByRange("__z")


def hilbert_value(df: DataFrame, x_col: str, y_col: str, bits: int,
                  out_col: str = "__h") -> DataFrame:
    """Add the Hilbert index of two pre-scaled `bits`-bit columns —
    the public xy2d algorithm, one simultaneous projection per level
    (quadrant digit from the top bits, then reflect+swap the frame).
    Unlike the Morton code this cannot be a single expression (the
    frame transform mutates per level), but each level is still pure
    codegen'd CASE arithmetic: no Python, no shuffle. The identical
    unrolled plan generates the layout_queries oracle text
    (hilbert_ctes), model-pinned in tests/test_layout.py; Hilbert
    beats Z-order on worst-case footer width under unaligned range
    buckets (`layout_hilbert_vs_zorder_seams`) because consecutive
    indexes are always adjacent cells."""
    from pyspark.sql import functions as F

    n = 1 << bits
    out = df.withColumns({
        "__hx": F.col(x_col).cast("long"),
        "__hy": F.col(y_col).cast("long"),
        out_col: F.lit(0).cast("long"),
    })
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = f"(CASE WHEN (__hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (__hy & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END)"
        )
        # simultaneous projection: every expression reads the PREVIOUS
        # level's __hx/__hy (withColumns is one Project node)
        out = out.withColumns({
            out_col: F.expr(f"{out_col} + {s * s} * {quad}"),
            "__hx": F.expr(
                f"(CASE WHEN {ry} = 1 THEN __hx "
                f"WHEN {rx} = 1 THEN {n - 1} - __hy ELSE __hy END)"
            ),
            "__hy": F.expr(
                f"(CASE WHEN {ry} = 1 THEN __hy "
                f"WHEN {rx} = 1 THEN {n - 1} - __hx ELSE __hx END)"
            ),
        })
    return out.drop("__hx", "__hy")


def hilbert_repartition(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 12,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rewrite ``df``'s layout clustered on the Hilbert curve of
    (x, y) — like `zorder_repartition` but with no quadrant seams, so
    equal-frequency range partitions (which never align with quadrant
    boundaries on real data) keep compact, balanced footers in BOTH
    dimensions (measured: `layout_hilbert_vs_zorder_seams`)."""
    with_h = hilbert_value(
        _with_scaled(df, x, y, bits), "__sx", "__sy", bits
    ).drop("__sx", "__sy")
    if num_partitions:
        return with_h.repartitionByRange(num_partitions, "__h")
    return with_h.repartitionByRange("__h")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Two-dimensional clustered write: range-partition + sort on the
    Morton interleave of (col_a, col_b), then drop the helper column.
    Point/range filters on EITHER column skip most files via parquet
    min/max stats — the standard lakehouse Z-ORDER, expressed with
    built-in bitwise expressions."""
    from pyspark.sql import functions as F

    z = df.withColumn("__z", zorder_value(F.col(col_a), F.col(col_b), bits))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
