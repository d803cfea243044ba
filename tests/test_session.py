"""Session-factory contract: the engine defaults that the 100 TB design
depends on must actually be set."""

from __future__ import annotations


def test_session_defaults(spark):
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.session.timeZone") == "UTC"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"


def test_session_is_reused(spark):
    from streamingdemo_spark.session import get_spark

    assert get_spark() is spark  # getOrCreate: one JVM per process
