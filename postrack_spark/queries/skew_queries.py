"""Skew-mitigation queries: salted aggregation and salted join over the
events table (low-cardinality event_type ⇒ every group is a hot key).

Salting is semantically invisible — the oracle is the PLAIN SQL form of
each query, so the hash-match proves output equivalence while the Spark
plan spreads each hot key over n_salts reducers (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postrack_spark.operators.skew import salted_agg, salted_join
from postrack_spark.queries.registry import query
from postrack_spark.session import load_tables


@query(
    "agg_salted_hot_keys",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           round(max(value), 2) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation by event_type (5 values at any SF —
    every group is hot). Phase 1 groups by (event_type, salt) so one
    key's rows land on 16 reducers; phase 2 merges the algebraic
    partials. Output ≡ the plain GROUP BY (the oracle)."""
    events = load_tables(spark, sf_dir)["events"]
    out = salted_agg(
        events,
        ["event_type"],
        partial_aggs=[
            F.count("*").alias("__n"),
            F.sum("value").alias("__sum"),
            F.max("value").alias("__max"),
        ],
        final_aggs=[
            F.sum("__n").alias("n_events"),
            F.round(F.sum("__sum"), 2).alias("total_value"),
            F.round(F.max("__max"), 2).alias("max_value"),
        ],
        n_salts=16,
    )
    return out.orderBy("event_type")


@query(
    "join_salted_user_revenue",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY mktsegment
    """,
)
def join_salted_user_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: events (big, salted by pmod(hash(user_id))) ⋈
    customer (small, replicated 8×) on (user_id, salt) — a hot user's
    rows spread over 8 tasks instead of straggling one reducer. Output ≡
    the plain inner join (the oracle)."""
    t = load_tables(spark, sf_dir)
    events = t["events"]
    cust = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(events, cust, on=["user_id"], n_salts=8)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("mktsegment")
    )
