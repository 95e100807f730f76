"""Query registry: name -> (spark callable, optional DuckDB oracle SQL).

Contract (driver): spark callable takes (spark, sf_dir) -> DataFrame;
oracle SQL is ANSI SQL over pre-registered DuckDB views of the same
parquet (region nation customer supplier part orders lineitem events
documents embeddings). Aggregate/computed columns are aliased
identically on both sides because the driver sorts columns by name and
hash-compares values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # None => driver records weaker rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a named query with its DuckDB oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


_LOADED = False


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration)."""
    global _LOADED
    if not _LOADED:
        from postrack_spark.queries import (  # noqa: F401
            cdc_queries,
            dedup_queries,
            events_queries,
            graph_queries,
            mining_queries,
            relational,
            sampling_queries,
            skew_queries,
            stats_queries,
            streaming_queries,
            text_queries,
            tpch,
            tpch_extra,
            tpch_missing,
            vector_queries,
            window_queries,
        )

        _LOADED = True
    return QUERIES
