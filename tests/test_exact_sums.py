"""The exact-sum convention (registry.dsum/osum): the integer-unit
fast path and the decimal(38) wide path must agree with each other and
with DuckDB on the fixture, and the fast path must match the exact
rational sum bit-for-bit."""

from __future__ import annotations

from decimal import Decimal

import duckdb
from pyspark.sql import functions as F

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import dsum, osum


def test_fast_and_wide_paths_agree_on_fixture(spark, sf_dir):
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    row = li.groupBy("l_returnflag").agg(
        dsum("l_extendedprice").alias("fast"),
        dsum("l_extendedprice", wide=True).alias("wide"),
    )
    for r in row.collect():
        assert r["fast"] == r["wide"], r


def test_fast_path_matches_exact_rational_sum(spark, sf_dir):
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    got = li.agg(dsum("l_extendedprice").alias("s")).collect()[0]["s"]
    cents = sum(
        int(Decimal(str(r["l_extendedprice"])) * 100)
        for r in li.select("l_extendedprice").collect()
    )
    assert got == float(cents) / 100.0


def test_osum_matches_dsum_both_paths(spark, duck, sf_dir):
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    for wide in (False, True):
        got = li.agg(dsum("l_quantity", wide=wide).alias("s")).collect()[0]["s"]
        want = duck.execute(
            f"SELECT {osum('l_quantity', wide=wide)} FROM lineitem"
        ).fetchone()[0]
        assert got == want, (wide, got, want)
