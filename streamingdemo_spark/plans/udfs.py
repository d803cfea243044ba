"""UDF / UDAF / UDTF surface (SURVEY.md §2.D, SNIPPETS.md patterns).

The explicit slow-path escape hatch: row-at-a-time Python UDF shown
once for parity (``udf_scalar_py``), everything else Arrow-vectorized
(pandas_udf / applyInPandas) — the only Python execution shapes allowed
at 100 TB. Numeric UDF bodies compute on scaled int64 (fixture values
are fixed-point) so results are exact and order-insensitive, matching
the decimal-sum oracle convention.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query


@query(
    "udf_scalar_py",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice / 1000) AS BIGINT) * 1000 AS price_bucket
    FROM orders
    """,
)
def udf_scalar_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Python UDF (deterministic integer arithmetic).

    Kept deliberately trivial: this shape serializes every row through
    the Python worker and is the pattern to AVOID on hot paths — the
    pandas variants below are the production shape.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]

    @F.udf(returnType=LongType())
    def bucket(price: float) -> int:
        return int(price // 1000) * 1000

    return o.select("o_orderkey", bucket("o_totalprice").alias("price_bucket"))


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE)
             AS net_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Series→Series pandas UDF (Arrow batches).

    Computes net price on scaled int64 (cents × basis points) so the
    result is the exact 4-decimal value — bitwise equal to the oracle's
    decimal cast.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]

    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        cents = (price * 100).round().astype("int64")
        disc_bp = (discount * 100).round().astype("int64")
        return cents * (100 - disc_bp) / 10_000.0

    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@query(
    "udaf_pandas_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(
             CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE),
           4) AS weighted_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: quantity-weighted mean price.

    Accumulates in exact scaled int64, divides once — order-insensitive,
    so it hash-matches the decimal-sum oracle after a 4-dp round.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]

    @F.pandas_udf(DoubleType())
    def weighted_price(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        qc = (qty * 100).round().astype("int64")
        return round(float((cents * qc).sum() / (100.0 * qc.sum())), 4)

    return li.groupBy("l_returnflag").agg(
        weighted_price("l_extendedprice", "l_quantity").alias("weighted_price")
    )


@query(
    "udtf_apply_in_pandas",
    # the z-score happens to be window-expressible, which makes the
    # grouped-map mechanics oracle-checkable: pandas std(ddof=1) is
    # STDDEV_SAMP; both sides round to 6dp to absorb summation-order
    # ulps — Spark-side with F.round (HALF_UP, matching SQL ROUND),
    # never inside pandas (Series.round is IEEE half-even and diverges
    # on exact dyadic ties); + 0.0 normalizes IEEE negative zero
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
                 / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_mktsegment),
                 6) + 0.0 AS bal_z
    FROM customer
    """,
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF (applyInPandas): z-score normalize account balance
    within each market segment. The whole group arrives as one pandas
    DataFrame per Arrow batch — the pattern for per-group logic that
    generally can't be expressed relationally (this particular function
    can be, which is what lets an oracle check the mechanics). The UDF
    emits the raw z-score; rounding happens in the Spark plan so both
    engines round the same way (repo convention)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        sd = bal.std()
        pdf = pdf[["c_custkey", "c_mktsegment"]].copy()
        pdf["bal_z"] = (bal - bal.mean()) / (sd if sd else 1.0)
        return pdf

    return c.groupBy("c_mktsegment").applyInPandas(
        normalize, schema="c_custkey long, c_mktsegment string, bal_z double"
    ).withColumn("bal_z", F.round("bal_z", 6) + 0.0)


@query(
    "udtf_python_lateral",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, '.') AS ps
      FROM documents WHERE doc_id < 32
    ),
    ex AS (
      SELECT doc_id,
             unnest(generate_series(0, len(ps) - 1)) AS i,
             unnest(ps) AS sentence
      FROM parts
    )
    SELECT doc_id, CAST(i AS INT) AS sent_idx, sentence FROM ex
    """,
)
def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (Spark 4 ``@udtf``) applied LATERAL-style:
    one input row → many output rows, here a sentence splitter — the
    row-expanding shape (parsers, taggers, chunkers) that scalar UDFs
    can't express and applyInPandas only reaches via groupBy.

    The UDTF runs Arrow-batched per partition — no shuffle is
    introduced by the expansion itself; this splitter is SQL-emulable
    (which is what buys the oracle), but the same harness runs any
    opaque Python row-expander. At 100 TB the same cautions as
    ``fn_explode`` apply: project to the minimal column set before
    expanding.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return  # match SQL: string_split(NULL) expands to no rows
            for i, part in enumerate(text.split(".")):
                yield i, part

    spark.udtf.register("sentence_split", SentenceSplit)
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    d.filter(F.col("doc_id") < 32).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM _udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )
