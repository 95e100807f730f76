"""Stream construction + synchronous drain helpers.

File-based streams + Trigger.availableNow + memory sink let a batch of
parquet drive a real streaming query to completion synchronously — the
local test harness for every streaming operator (the production path is
identical code against a live directory/Kafka/CDC source).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postrack_spark.session import configure_session


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file-source stream, with `ts` normalized
    the same way session.load_tables does for batch: a nanos-encoded
    long (TIMESTAMP(NANOS) layout) is rebuilt at micro precision;
    already-timestamp layouts pass through (the driver has shipped both
    across rounds)."""
    from pyspark.sql import types as T

    configure_session(spark)
    batch_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(batch_schema["ts"].dataType, T.LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    return stream


def envelope_stream(
    spark: SparkSession,
    changes: DataFrame,
    name: str | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Materialize a (batch) change-envelope DataFrame to scratch
    parquet and re-open it as a stream — the harness stand-in for a live
    CDC feed (FIXTURES.md §B; capture is external to Spark per
    BASELINE.json's north star). `options` pass through to the file
    source (e.g. maxFilesPerTrigger=N to force multi-batch admission)."""
    scratch = tempfile.mkdtemp(prefix=f"cdc_stream_{name or uuid.uuid4().hex[:8]}_")
    changes.write.mode("overwrite").parquet(scratch)
    schema = spark.read.parquet(scratch).schema
    reader = spark.readStream.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.parquet(scratch)


def run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink; return the sink table. Synchronous."""
    spark = stream_df.sparkSession
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{query_name}_")
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
