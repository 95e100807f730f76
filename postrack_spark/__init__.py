"""postrack_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Vedadiyan/postrack (a Go Postgres
logical-replication / CDC client, reference at /root/reference/postrack.go),
rebuilt Spark-first rather than ported.

Layout:
  session     — SparkSession factory + table loading (the driver's parquet)
  cdc         — change-event envelope schema, synthetic change-stream
                generation, materialization (latest-per-key, apply-changes),
                pgoutput v1 decoder (reference: postrack.go:340-413)
  api         — name-for-name parity layer (Conn/Table/bootstrap,
                reference: postrack.go:17-338)
  operators   — relational + LLM-pipeline operators (dedup, similarity,
                text analysis, multimodal) as DataFrame compositions
  functions   — reusable column expressions (vector math, text metrics)
  sources     — batch/stream source helpers + the postgres_cdc DataSource
  streaming   — watermarked windows, stateful ops, foreachBatch sinks
  queries     — the named query registry backing __spark_entry__
"""

__version__ = "0.1.0"

# Lazy top-level exports of the reference-parity surface (postrack.go's
# package-level names): `from postrack_spark import Conn, Table, ...`
# works without importing pyspark until first use.
_API = {
    "Conn": "postrack_spark.api",
    "Table": "postrack_spark.api",
    "Executor": "postrack_spark.api",
    "create_publication_id": "postrack_spark.api",
    "as_row_sink": "postrack_spark.api",
    "CHANGE_SCHEMA": "postrack_spark.cdc.envelope",
    "INSERT": "postrack_spark.cdc.envelope",
    "UPDATE": "postrack_spark.cdc.envelope",
    "DELETE": "postrack_spark.cdc.envelope",
    "TRUNCATE": "postrack_spark.cdc.envelope",
}


def __getattr__(name: str):
    mod = _API.get(name)
    if mod is None:
        raise AttributeError(f"module 'postrack_spark' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(list(globals()) + list(_API))
