"""Sorts, limits, set operations (SURVEY.md §2.D).

Order-insensitive value-hash can't see row order, so the sort keys
attach an explicit ``pos`` (ROW_NUMBER over the same total order) —
the ordering itself becomes part of the checked values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT c_custkey, c_mktsegment, bal_bucket,
           ROW_NUMBER() OVER (ORDER BY c_mktsegment ASC,
                              bal_bucket DESC NULLS FIRST,
                              c_custkey ASC) AS pos
    FROM (SELECT c_custkey, c_mktsegment,
                 CASE WHEN c_acctbal < 0 THEN NULL
                      ELSE CAST(FLOOR(c_acctbal / 1000) AS BIGINT) END AS bal_bucket
          FROM customer)
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key asc/desc sort with explicit NULLS FIRST placement.

    Scale note: a global total order is a single-reducer range sort —
    Spark's ``orderBy`` does a distributed range partition + local sort,
    acceptable for final presentation output only; inside pipelines use
    partitioned windows instead (``win_*`` keys).
    """
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    bucket = F.when(F.col("c_acctbal") < 0, None).otherwise(
        F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    )
    w = Window.orderBy(
        F.asc("c_mktsegment"), F.desc_nulls_first("bal_bucket"), F.asc("c_custkey")
    )
    return (
        c.withColumn("bal_bucket", bucket)
        .select(
            "c_custkey",
            "c_mktsegment",
            "bal_bucket",
            F.row_number().over(w).alias("pos"),
        )
        .orderBy("pos")
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition top-k then a k-row merge at the driver, no full sort
    or shuffle of the table. The scale-correct global top-k."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping projections of customer for set-op keys."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    a = c.filter(F.col("c_acctbal") >= 2000.0).select("c_nationkey", "c_mktsegment")
    b = c.filter(F.col("c_acctbal") <= 6000.0).select("c_nationkey", "c_mktsegment")
    return a, b


_A = "SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal >= 2000.0"
_B = "SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal <= 6000.0"


@query("set_union_all", oracle=f"{_A} UNION ALL {_B}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.unionAll(b)


@query("set_union_distinct", oracle=f"{_A} UNION {_B}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.union(b).distinct()


@query("set_intersect", oracle=f"{_A} INTERSECT {_B}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.intersect(b)


@query("set_except", oracle=f"{_A} EXCEPT {_B}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.subtract(b)


@query("set_except_all", oracle=f"{_A} EXCEPT ALL {_B}")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity-preserving EXCEPT ALL)."""
    a, b = _halves(spark, sf_dir)
    return a.exceptAll(b)


@query("set_intersect_all", oracle=f"{_A} INTERSECT ALL {_B}")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (multiplicity-preserving INTERSECT ALL) —
    min-of-multiplicities semantics; Spark plans it as a single
    aggregate + join on the grouping key, same shuffle shape as
    ``set_intersect``."""
    a, b = _halves(spark, sf_dir)
    return a.intersectAll(b)


@query(
    "set_union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority, src FROM (
      SELECT o_orderkey, o_totalprice, o_orderpriority, 'v2' AS src
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, 'v1' AS src
      FROM orders WHERE o_orderkey % 2 = 1)
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: combine an old extract (three columns)
    with a new extract (an added column, different column ORDER) via
    ``unionByName(allowMissingColumns=True)`` — columns align by NAME
    and the old rows take NULL for the new column. Positional
    ``union`` silently pairs mismatched columns (the classic
    swapped-column corruption when two exports drifted); by-name
    union is the safe form whenever inputs come from different
    pipeline versions — the compute-side twin of
    ``src_schema_evolution``'s read-side mergeSchema.

    Scale shape: union is a zero-shuffle lineage concat; the NULL
    fill is a projection. The deliberately shuffled column order on
    the v2 side is the test: positional union would pair totalprice
    with priority and corrupt both.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    v2 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.lit("v2").alias("src"),
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
    )
    v1 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", F.lit("v1").alias("src")
    )
    return v2.unionByName(v1, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "src"
    )
