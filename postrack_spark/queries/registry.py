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


def _interleave_families() -> None:
    """Re-order QUERIES in place: round-robin across defining modules.

    Registration order is module import order, so a prefix sample of the
    registry (the driver hash-checks the FIRST 50 entries against their
    oracles) used to see only the first ~2 families. Interleaving makes
    any prefix span every family — cdc, dedup, events, graph, mining,
    relational, sampling, skew, stats, streaming, text, tpch, vector,
    window — so the driver's correctness artifact exercises the whole
    surface (VERDICT r3 §missing #3). Deterministic: stable family
    order (sorted module names), stable registration order within each.
    """
    by_mod: dict[str, list[QuerySpec]] = {}
    for spec in QUERIES.values():
        by_mod.setdefault(spec.fn.__module__, []).append(spec)
    lanes = [by_mod[m] for m in sorted(by_mod)]
    interleaved: list[QuerySpec] = []
    i = 0
    while any(i < len(lane) for lane in lanes):
        for lane in lanes:
            if i < len(lane):
                interleaved.append(lane[i])
        i += 1
    QUERIES.clear()
    QUERIES.update({spec.name: spec for spec in interleaved})


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration)."""
    global _LOADED
    if not _LOADED:
        from postrack_spark.queries import (  # noqa: F401
            cdc_queries,
            dedup_queries,
            events_queries,
            graph_queries,
            layout_queries,
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

        _interleave_families()
        _LOADED = True
    return QUERIES
