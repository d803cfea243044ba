"""Flagship end-to-end query (SURVEY.md §7 step 1).

TPC-H-Q3-shaped: filter a dimension segment + date windows, 3-way join
customer ⋈ orders ⋈ lineitem, aggregate revenue per order, top-10.
Exercises the reference's whole batch path in one plan — catalog scans,
equi-joins, aggregate, sort, limit (C1-C6,
``src/sparkSQL/SparkSQLOperator.java:17-23``).

Scale notes: customer (dim side after the segment filter) is
broadcast-eligible, so Catalyst picks broadcast-hash joins and the only
shuffle is the final per-order aggregation; filters and the 4-column
projection push into the parquet scans. At 100 TB the same plan holds —
AQE re-checks the broadcast threshold at runtime and falls back to
shuffled hash join if the filtered dim outgrows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import dsum, osum, query

_CUTOFF = "1998-06-01"


@query(
    "flagship_q3",
    oracle=f"""
    SELECT l.l_orderkey AS o_orderkey,
           {osum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{_CUTOFF} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{_CUTOFF} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def flagship_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    items = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        items.join(orders, items.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )
