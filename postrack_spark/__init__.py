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
