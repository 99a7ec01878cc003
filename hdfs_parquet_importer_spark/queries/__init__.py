"""Query registry — the driver-facing catalog of every implemented
operator (SURVEY.md §2), each paired with a DuckDB oracle SQL twin.

Contract (/root/repo/__spark_entry__.py): the driver runs each Spark
callable and its oracle side-by-side at sf0.01 and compares row count,
schema, and an order-insensitive value hash. Consequences honored here:

* every computed column is aliased identically in Spark and SQL;
* floating-point aggregates are ROUND()-ed the same way on both sides
  (accumulation order differs between engines; rounding makes the
  doubles bit-identical);
* raw timestamps are avoided in outputs — formatted strings or
  year/month ints travel across the engine boundary instead;
* queries without a SQL-expressible oracle set ``oracle=None`` and get
  the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    """One registered operator demonstration."""

    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def registry() -> dict[str, Query]:
    """Import all query modules and return the full registry."""
    # Imports are deferred so `import hdfs_parquet_importer_spark`
    # stays cheap; each module registers at import time.
    from hdfs_parquet_importer_spark.queries import (  # noqa: F401
        relational,
        etl_parity,
        functions,
        windows,
        events,
        llm,
        subqueries,
        pandas_surface,
    )

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
