"""Query registry.

Every implemented operator registers a ``(spark, sf_dir) -> DataFrame``
callable plus (when SQL-expressible) a DuckDB oracle SQL string. The driver
compares the two by row count + schema + order-insensitive value hash, so:

  * every computed column is aliased identically in both,
  * floating-point aggregates are rounded (engine summation order differs
    between Spark partial/final aggregation and DuckDB; rounding removes the
    last-ulp noise while still validating ~12 significant digits),
  * ties in any top-k / window ordering are broken by a unique key so the
    selected row set is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` means rows-only driver check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
