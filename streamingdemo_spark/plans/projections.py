"""Projection / filter / predicate keys (SURVEY.md §2.D).

``proj_withcolumn`` is the engine form of the reference's only concrete
transform operator, AddField (``src/iie/SparkStreaming/AddField.java:
9-23`` — a 1-in-1-out projection-extend); the filter keys are the
predicate surface of its SQL entry point (``SparkSQLOperator.java:18``).

All of these compile to a single parquet scan with the predicate and
column set pushed down (visible as PushedFilters/ReadSchema in
``explain``), so they cost one pass over only the referenced columns at
any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query


@query(
    "proj_select",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    """,
)
def proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return t["customer"].select("c_custkey", "c_name", "c_mktsegment")


@query(
    "proj_withcolumn",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE)
             AS net_price
    FROM lineitem
    """,
)
def proj_withcolumn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AddField: extend each row with a computed column (B3/D)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    net = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    ).cast("double")
    return (
        t["lineitem"]
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .withColumn("net_price", net)
        .drop("l_extendedprice", "l_discount")
    )


@query(
    "proj_rename_drop",
    oracle="""
    SELECT s_suppkey AS supplier_id, s_name FROM supplier
    """,
)
def proj_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("supplier",))
    return (
        t["supplier"]
        .withColumnRenamed("s_suppkey", "supplier_id")
        .drop("s_nationkey", "s_acctbal")
    )


@query(
    "flt_compare",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_totalprice >= 150000.0 AND o_orderstatus != 'O'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    """,
)
def flt_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .filter(
            (F.col("o_totalprice") >= 150000.0)
            & (F.col("o_orderstatus") != "O")
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


@query(
    "flt_boolean",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE (l_returnflag = 'R' OR l_quantity > 45.0) AND NOT l_linestatus = 'F'
    """,
)
def flt_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .filter(
            ((F.col("l_returnflag") == "R") | (F.col("l_quantity") > 45.0))
            & ~(F.col("l_linestatus") == "F")
        )
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    )


@query(
    "flt_in_between_like",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_acctbal BETWEEN 1000.0 AND 8000.0
      AND c_name LIKE '%1%'
    """,
)
def flt_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return t["customer"].filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").between(1000.0, 8000.0)
        & F.col("c_name").like("%1%")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@query(
    "flt_null",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           (CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END
              IS NOT DISTINCT FROM 'F') AS closed_f
    FROM orders
    WHERE CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END IS NOT NULL
       OR o_orderpriority IS NULL
    """,
)
def flt_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality over a derived
    nullable column (fixtures are null-free, so nulls are derived)."""
    t = load_tables(spark, sf_dir, ("orders",))
    status_or_null = F.when(F.col("o_orderstatus") == "O", None).otherwise(
        F.col("o_orderstatus")
    )
    return (
        t["orders"]
        .withColumn("closed", status_or_null)
        .filter(F.col("closed").isNotNull() | F.col("o_orderpriority").isNull())
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("closed").eqNullSafe("F").alias("closed_f"),
        )
    )


@query(
    "flt_sargable_rewrite",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND o_totalprice >= 50000.0
    """,
)
def flt_sargable_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sargability rewrite every 100 TB scan depends on:
    ``year(o_orderdate) = 1996`` wraps the COLUMN in a function, which
    no format pushdown can see through — Spark reads every row group
    and evaluates year() per row. Rewriting it as the equivalent
    half-open range puts bare-column comparisons in the filter, so
    they reach the parquet scan as PushedFilters and row groups whose
    min/max stats exclude 1996 are never read. Same rows, radically
    different I/O at scale; the plan test pins BOTH directions (the
    rewrite pushes, the naive form provably does not)."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_totalprice") >= 50000.0)
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )
