"""Named query registry backing __spark_entry__.py.

Every implemented operator from SURVEY.md §2 registers here as a named
query (spark_fn, oracle_sql). The driver runs both sides at sf=0.01 and
hash-compares; column names/aliases MUST match between the Spark result
and the oracle SQL.
"""

from postrack_spark.queries.registry import QUERIES, load_all, query

__all__ = ["QUERIES", "query", "load_all"]
