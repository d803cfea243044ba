"""Query/oracle registry.

Every operator key from SURVEY.md §2 registers here: a PySpark builder
``(spark, sf_dir) -> DataFrame`` and, for oracle=Y keys, the matching
DuckDB-runnable ANSI SQL. ``__spark_entry__.py`` re-exports these to
the driver.

Float-stability convention (SURVEY.md §2 preamble): fixture money
columns are exactly 2-decimal and ``events.value`` exactly 4-decimal,
so both engines sum them as decimals (exact, order-insensitive) and
cast the result back to double — bitwise-identical on both sides, no
rounding races. Helpers ``dsum`` / ``dexpr`` encode that.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def dsum(col: Column | str, scale: int = 2, precision: int = 38) -> Column:
    """Exact decimal sum of a fixed-point double column, as double.

    Matches the oracle-side ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS
    DOUBLE)``. Decimal addition is associative, so the result is
    independent of partitioning/shuffle order — safe to value-hash.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def osum(expr: str, scale: int = 2, precision: int = 38) -> str:
    """Oracle-SQL fragment matching :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
