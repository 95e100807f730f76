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
