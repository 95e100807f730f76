"""Bucketed-table layout: pre-shuffled storage for co-located joins.

At 100 TB the same fact⋈fact join (lineitem⋈orders on orderkey, events
⋈ entity history on user_id) runs every day; paying its shuffle every
run is the single biggest avoidable cost in a recurring pipeline.
Bucketing moves that shuffle to write time: both tables are written
hash-partitioned into the same number of buckets on the join key, so
every subsequent join plans with ZERO Exchange on either side — each
task reads bucket i of both tables. With `sortBy` on the key the
per-task sort disappears too (sort-merge join over pre-sorted buckets).

Spark only honors bucketing through the session catalog
(`saveAsTable`; a plain `parquet(path)` write discards bucket
metadata), so these helpers manage named catalog tables.

tests/test_plans.py asserts the no-Exchange plan shape.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Write `df` as a bucketed (optionally bucket-sorted) catalog table.

    `n_buckets` sizes the write-side parallelism floor AND the read-side
    task count for bucket scans — at cluster scale pick it so one bucket
    of the biggest co-bucketed table fits an executor's memory
    comfortably (bucket ≈ table_size / n_buckets).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # A fresh session's metastore doesn't know about managed-table dirs
    # a previous session left in the warehouse; an orphaned location
    # fails the write (LOCATION_ALREADY_EXISTS), so clear it.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    orphan = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(orphan):
        shutil.rmtree(orphan)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    Catalyst sees both sides' outputPartitioning already satisfies the
    join's distribution requirement and plans no Exchange; if both were
    written `sortBy` the ordering requirement is satisfied from storage
    too. Falls back gracefully (plain shuffled join) if the tables are
    not bucketed or bucket counts differ — semantics never change, only
    the plan.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
