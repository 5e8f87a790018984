"""Query registry: every implemented operator declares a named query
(callable (spark, sf_dir) -> DataFrame) and, when SQL-expressible, a
matching DuckDB oracle SQL string (driver contract, __spark_entry__.py).

Column names must match between the Spark query and the oracle — the
driver sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB ANSI SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). Omit for non-SQL-expressible
    operators (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        # Duplicate names silently shadow the earlier query (dict
        # assignment + Python function redefinition raise nothing), so
        # the overwritten query would vanish from the driver contract
        # with no error. Fail at import time instead.
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
