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


def zorder_repartition(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 12,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rewrite ``df``'s layout clustered on the Z-curve of (x, y),
    scaling both columns onto [0, 2**bits) first (broadcast 1-row
    bounds combine — the only extra pass a layout rewrite needs).
    Returns the frame range-partitioned on a ``__z`` column so each
    output file's (x, y) footer ranges are tight rectangles; write
    with any sink, or use `write_zordered` for pre-quantized columns.
    Clustering quality is hash-certified by the registry queries
    `layout_zorder_extent_skipping` / `layout_zone_map_workload_sim`.
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        F.min(x).alias("__min_x"), F.max(x).alias("__max_x"),
        F.min(y).alias("__min_y"), F.max(y).alias("__max_y"),
    )
    top = (1 << bits) - 1

    def scaled(col: str, lo: str, hi: str):
        # exact integer floor division (DIV) — non-negative operands,
        # so the identical formula is portable to any ANSI engine
        # (layout_queries generates the matching oracle text)
        return F.expr(
            f"((CAST({col} AS BIGINT) - CAST({lo} AS BIGINT)) * {top}) DIV "
            f"GREATEST(CAST({hi} AS BIGINT) - CAST({lo} AS BIGINT), 1)"
        )

    with_z = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__z",
            zorder_value(
                scaled(x, "__min_x", "__max_x"),
                scaled(y, "__min_y", "__max_y"),
                bits,
            ),
        )
        .drop("__min_x", "__max_x", "__min_y", "__max_y")
    )
    if num_partitions:
        return with_z.repartitionByRange(num_partitions, "__z")
    return with_z.repartitionByRange("__z")


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
