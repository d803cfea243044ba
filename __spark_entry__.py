"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All keys live in ``streamingdemo_spark.registry``; importing the
plans/streaming/extensions packages populates it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import streamingdemo_spark.plans  # noqa: F401  (registers plan keys)

try:  # streaming + extension keys land in later build steps
    import streamingdemo_spark.streaming.queries  # noqa: F401
except ImportError:
    pass
try:
    import streamingdemo_spark.extensions  # noqa: F401
except ImportError:
    pass

from streamingdemo_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q3 shape) on /root/testdata/sf0.001."""
    return QUERIES["flagship_q3"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator key from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle=Y key."""
    return dict(ORACLES)
