"""Streaming sinks: foreachBatch CDC apply — the engine's equivalent of
the reference's HandleFunc (postrack.go:35), with stronger semantics:
offsets commit AFTER the batch is durably applied (checkpoint), fixing
the reference's ack-before-process race (conn.lsn advanced at :367,
read by keepAlive at :110 with no ordering w.r.t. the callback).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postrack_spark.cdc.envelope import DELETE, TRUNCATE
from postrack_spark.cdc.materialize import latest_per_key, truncate_watermarks


def foreach_batch_apply_changes(
    changes_stream: DataFrame,
    key_expr,
    target_dir: str | None = None,
    key_name: str = "__key",
    checkpoint_dir: str | None = None,
) -> tuple[str, object]:
    """Incrementally materialize a CDC stream into a parquet table.

    Per micro-batch (the compact-then-merge pattern, SURVEY.md §4.3):
      1. compact the batch: latest event per key within the batch,
         KEEPING delete tombstones (they must out-compete base rows)
      2. apply the batch's TRUNCATE watermarks to the base (epoch cut)
      3. merge base ∪ compacted via latest-per-key, then drop deletes
      4. atomically replace the base table

    At warehouse scale steps 2-4 become MERGE INTO (Delta/Iceberg); the
    union+window emulation has identical semantics on parquet.
    Returns (target_dir, streaming_query).
    """
    target = target_dir or tempfile.mkdtemp(prefix="cdc_materialized_")
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_apply_")
    spark = changes_stream.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        trunc = truncate_watermarks(batch_df)
        keyed = (
            batch_df.filter(F.col("op") != TRUNCATE)
            .withColumn(key_name, key_expr)
            .join(F.broadcast(trunc), ["schema", "table"], "left")
            .filter(F.col("__trunc_lsn").isNull() | (F.col("lsn") > F.col("__trunc_lsn")))
            .drop("__trunc_lsn")
        )
        compacted = latest_per_key(keyed, ["schema", "table", key_name])

        try:
            base = spark.read.parquet(target)
            has_base = "lsn" in base.columns
        except Exception:
            has_base = False

        if has_base:
            base = (
                base.join(F.broadcast(trunc), ["schema", "table"], "left")
                .filter(F.col("__trunc_lsn").isNull() | (F.col("lsn") > F.col("__trunc_lsn")))
                .drop("__trunc_lsn")
            )
            merged = latest_per_key(
                base.unionByName(compacted), ["schema", "table", key_name]
            )
        else:
            merged = compacted
        merged = merged.filter(F.col("op") != DELETE)
        # materialize before overwriting the directory we just read
        merged.cache()
        merged.count()
        merged.write.mode("overwrite").parquet(target)
        merged.unpersist()

    query = (
        changes_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return target, query


def foreach_batch_incremental_agg(
    changes_stream: DataFrame,
    dims: dict,
    measures: dict,
    target_dir: str | None = None,
    checkpoint_dir: str | None = None,
    count_name: str = "n_rows",
) -> tuple[str, object]:
    """Maintain a grouped aggregate view incrementally across
    micro-batches (streaming IVM; see cdc/ivm.py for the batch form).

    Per micro-batch: derive signed delta rows, partially aggregate them
    to per-group (count, sums), and fold into the running view by
    union + re-sum — a MERGE INTO on (dims) at warehouse scale. With
    full before-images the signed-delta aggregate is a commutative
    monoid: ANY partitioning of the stream into batches yields the same
    view, so no cross-batch ordering is required. (Missing-before
    repair — recover_before — is the one order-sensitive step; it
    belongs capture-side or pre-stream, mirroring how real connectors
    resolve REPLICA IDENTITY.) Groups whose running count is zero are
    KEPT in the stored partials (a negative partial may precede its
    positive under arbitrary batch splits); readers filter count > 0.

    Shuffle cost per batch: O(groups), never O(events) — map-side
    partial aggregation compacts the signed rows before the exchange.
    Returns (target_dir, streaming_query).
    """
    from postrack_spark.cdc.ivm import delta_rows

    target = target_dir or tempfile.mkdtemp(prefix="ivm_agg_")
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_ivm_")
    spark = changes_stream.sparkSession
    dim_names = list(dims)
    sum_names = [count_name, *measures]

    def upd(batch_df: DataFrame, batch_id: int) -> None:
        d = delta_rows(batch_df)
        part = (
            d.select(
                *[expr.alias(n) for n, expr in dims.items()],
                "sign",
                F.col("img").alias("img"),
            )
            .groupBy(*[F.col(n) for n in dim_names])
            .agg(
                F.sum("sign").cast("bigint").alias(count_name),
                *[
                    F.sum(F.col("sign") * expr).cast("bigint").alias(n)
                    for n, expr in measures.items()
                ],
            )
        )
        try:
            base = spark.read.parquet(target)
            has_base = set(base.columns) == set(part.columns)
        except Exception:
            has_base = False
        if has_base:
            merged = (
                base.unionByName(part)
                .groupBy(*[F.col(n) for n in dim_names])
                .agg(*[F.sum(n).cast("bigint").alias(n) for n in sum_names])
            )
        else:
            merged = part
        merged.cache()
        merged.count()  # materialize before overwriting the dir we read
        merged.write.mode("overwrite").parquet(target)
        merged.unpersist()

    query = (
        changes_stream.writeStream.foreachBatch(upd)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return target, query
