"""Subquery / CTE surface (SURVEY.md §2.D subqueries).

Runs as SQL text through the C1 entry point
(``SparkSQLOperator.java:18-19`` → ``spark.sql``); Catalyst
decorrelates EXISTS/IN into semi-joins — inspect with ``.explain`` to
confirm no per-row subquery execution survives at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamingdemo_spark.io import load_tables, register_views
from streamingdemo_spark.registry import query

# Decimal-exact global average: both engines compute the identical
# double, so the filter boundary cannot flip rows (see registry note).
_AVG_PRICE = (
    "(SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*) "
    "FROM orders)"
)


@query(
    "subq_in",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN
      (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 2))
    """,
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN
          (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 2))
        """
    )


@query(
    "subq_exists_corr",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.0)
    """,
)
def subq_exists_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated to a left-semi join by Catalyst."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.0)
        """
    )


@query(
    "subq_scalar",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 1.5 * {_AVG_PRICE}
    """,
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in WHERE: price above 1.5× the global average."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * {_AVG_PRICE}
        """
    )


_CTE_SQL = """
    WITH nation_rev AS (
      SELECT c.c_nationkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ), ranked AS (
      SELECT n.n_name, r.revenue,
             CAST(SUM(CAST(r.revenue AS DECIMAL(38,2))) OVER () AS DOUBLE)
               AS total_rev
      FROM nation_rev r JOIN nation n ON n.n_nationkey = r.c_nationkey
    )
    SELECT n_name, revenue, ROUND(100 * revenue / total_rev, 4) AS rev_pct
    FROM ranked
"""


@query("cte_with", oracle=_CTE_SQL)
def cte_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained WITH clauses: per-nation revenue and its share of total."""
    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(_CTE_SQL)


_LATERAL_SQL = """
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
"""


@query("subq_lateral", oracle=_LATERAL_SQL)
def subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 customers by balance per
    nation. Catalyst rewrites the lateral limit into a partitioned
    window (rank ≤ 2 over a single customer shuffle by nationkey) —
    not a per-nation re-scan — so the plan scales with one shuffle of
    the probe side regardless of how many nations drive the lateral.
    """
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_LATERAL_SQL)


@query(
    "subq_not_in_null",
    oracle="""
    SELECT p_partkey, p_brand FROM part
    WHERE p_brand NOT IN
      (SELECT CASE WHEN s_suppkey % 100 = 96 THEN NULL
                   ELSE 'Brand#' || CAST(1 + s_suppkey % 5 AS VARCHAR)
                        || CAST(1 + s_suppkey % 3 AS VARCHAR) END
       FROM supplier WHERE s_suppkey % 4 = 0 AND s_suppkey % 100 <> 96)
    """,
)
def subq_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN against a nullable subquery — ANSI three-valued logic's
    classic trap: one NULL in the subquery makes EVERY ``x NOT IN``
    comparison UNKNOWN and the whole result silently empty. Spark
    compiles the null-aware case into a dedicated NullAwareAntiJoin
    (a plain anti-join would return wrong rows), which is the
    expensive shape — production code should write NOT EXISTS, which
    stays a cheap anti-join with the intuitive semantics.

    The key pins the semantics on a subquery that CAN produce NULL by
    construction (Spark must plan null-aware) while the filter
    removes the null-producing rows, so the result is non-empty and
    comparable — the oracle applies identical ANSI rules.
    """
    register_views(spark, sf_dir, ("part", "supplier"))
    return spark.sql(
        """
        SELECT p_partkey, p_brand FROM part
        WHERE p_brand NOT IN
          (SELECT CASE WHEN s_suppkey % 100 = 96 THEN NULL
                       ELSE CONCAT('Brand#', CAST(1 + s_suppkey % 5 AS STRING),
                                   CAST(1 + s_suppkey % 3 AS STRING)) END
           FROM supplier WHERE s_suppkey % 4 = 0 AND s_suppkey % 100 <> 96)
        """
    )


@query(
    "subq_corr_agg",
    oracle="""
    SELECT p.p_brand, COUNT(*) AS n_small_orders,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS small_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity <
      (SELECT 0.2 * (CAST(SUM(CAST(FLOOR(l2.l_quantity * 100 + 0.5)
                                   AS BIGINT)) AS DOUBLE) / 100.0
                     / COUNT(*))
       FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    GROUP BY p.p_brand
    """,
)
def subq_corr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery (the TPC-H Q17 shape): lineitems
    whose quantity is below 20% of their part's average — the query
    that is catastrophic if executed as written (one aggregate scan
    per outer row) and fine when the optimizer decorrelates it into
    one per-part aggregate joined back. Catalyst does exactly that;
    the plan-shape test pins it (aggregates + joins, no per-row
    re-scan loop).

    The per-part average uses the exact-sum convention on BOTH
    engines (integer-unit sum / count), so the 0.2·avg threshold is
    bitwise identical and boundary rows can't flip the comparison —
    a naive AVG() would make the result depend on each engine's
    float summation order.
    """
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT p.p_brand, COUNT(*) AS n_small_orders,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 100.0 AS small_revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity <
          (SELECT 0.2 * (CAST(SUM(CAST(FLOOR(l2.l_quantity * 100 + 0.5)
                                       AS BIGINT)) AS DOUBLE) / 100.0
                         / COUNT(*))
           FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        GROUP BY p.p_brand
        """
    )


_ANY_ALL_SQL = """
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_acctbal > ALL
        (SELECT c.c_acctbal FROM customer c
         WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal < 0)
      AND s.s_acctbal < ANY
        (SELECT c.c_acctbal FROM customer c
         WHERE c.c_nationkey = s.s_nationkey)
    """


@query("subq_any_all", oracle=_ANY_ALL_SQL)
def subq_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries (ANY/ALL), both correlated:
    suppliers whose balance beats EVERY overdrawn same-nation
    customer yet trails AT LEAST ONE same-nation customer — the
    > ALL / < ANY surface the other subquery keys don't touch.

    Spark's parser has no quantified-comparison syntax, so the Spark
    side IS the decorrelation every engine performs internally:
    ONE per-nation aggregate (max/count over the overdrawn subset,
    max/count overall) broadcast-joined back, with the quantifier
    algebra as plain predicates — ``> ALL S`` ≡ ``S empty OR bal >
    max(S)``, ``< ANY S`` ≡ ``S non-empty AND bal < max(S)``. The
    DuckDB oracle runs the native ANY/ALL text, pinning that this
    rewrite implements the standard's semantics (including the
    empty-set cases) rather than a lookalike. Scale shape: the
    aggregate is nation-cardinality-sized, the join broadcasts — no
    per-row subquery re-execution, same discipline as
    ``subq_corr_agg``.
    """
    t = load_tables(spark, sf_dir, ("supplier", "customer"))
    per_nation = t["customer"].groupBy("c_nationkey").agg(
        F.max(F.when(F.col("c_acctbal") < 0, F.col("c_acctbal"))).alias(
            "max_neg"
        ),
        F.count(F.when(F.col("c_acctbal") < 0, F.lit(1))).alias("n_neg"),
        F.max("c_acctbal").alias("max_all"),
        F.count(F.lit(1)).alias("n_all"),
    )
    s = t["supplier"].join(
        F.broadcast(per_nation),
        F.col("s_nationkey") == F.col("c_nationkey"),
        "left",
    )
    gt_all = (F.coalesce(F.col("n_neg"), F.lit(0)) == 0) | (
        F.col("s_acctbal") > F.col("max_neg")
    )
    lt_any = (F.coalesce(F.col("n_all"), F.lit(0)) > 0) & (
        F.col("s_acctbal") < F.col("max_all")
    )
    return s.filter(gt_all & lt_any).select(
        "s_suppkey", "s_name", "s_acctbal"
    )


_RECURSIVE_SQL = """
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
             CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
      FROM orders
    ),
    months AS (
      SELECT lo AS m, hi FROM bounds
      UNION ALL
      SELECT CAST(m + INTERVAL '1' MONTH AS DATE), hi FROM months
      WHERE m < hi
    ),
    agg AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) / 100.0 AS total
      FROM orders GROUP BY 1
    )
    SELECT months.m AS month,
           COALESCE(agg.n_orders, 0) AS n_orders,
           COALESCE(agg.total, 0.0) AS total
    FROM months LEFT JOIN agg ON months.m = agg.m
    """


@query("cte_recursive", oracle=_RECURSIVE_SQL)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): a month spine grown
    by recursion from the observed order-date bounds, left-joined to
    the monthly rollup for a zero-filled revenue calendar — the same
    identical SQL text runs on both engines (no dialect fork), with
    the integer-unit sum convention inline.

    Scale note: each recursion step here produces ONE row (the spine
    is time-bounded, ~tens of iterations), so recursion depth — not
    data volume — drives cost; Spark caps runaway recursion via
    spark.sql.cteRecursionLevelLimit. For DATA-sized iteration
    (transitive closure over millions of edges) prefer the
    explicitly-checkpointed loop operators (``ext_dedup_cluster``,
    ``ext_graph_pagerank``) whose per-round shuffles and lineage are
    under the pipeline's control.
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_RECURSIVE_SQL)


@query(
    "sql_pipe_syntax",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {{osum}} AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """.format(
        osum="CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS DOUBLE) / 100.0"
    ),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (`|>`): the same logical plan as the
    classic GROUP BY form, authored as a linear pipeline — the syntax
    Spark 4.0 added for composable query authoring. The oracle is the
    classic-SQL equivalent, pinning that the pipe form is pure sugar:
    identical rows, identical exact-sum totals. Catalyst produces the
    same optimized plan either way, so every scale property of
    ``agg_groupby`` carries over verbatim.
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                   AS BIGINT)) AS DOUBLE) / 100.0 AS total
           GROUP BY o_orderpriority
        """
    )


@query(
    "sql_named_params",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
)
def sql_named_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with named markers (``:status``/``:floor``,
    Spark 3.4+): values bind as typed literals through the parser —
    never string concatenation — which is the SQL-injection-safe way
    a service exposes this engine (the same discipline as the JDBC
    registry's parameterized options, ``db_registry.py``). The oracle
    inlines the same constants, pinning that binding is semantically
    identical to literal SQL.
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice > :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "floor": 150000.0},
    )


@query(
    "sql_exec_immediate",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE c_acctbal > 5000.0
    GROUP BY c_mktsegment
    """,
)
def sql_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE (Spark 4): run SQL held in a VARIABLE with
    USING-bound parameters — the dynamic-SQL surface stored-procedure
    migrations and templating layers target. The query text travels
    as a session variable and the threshold binds as a typed
    parameter, so even the dynamic path keeps the injection-safe
    discipline of ``sql_named_params``; the oracle inlines the same
    constants, pinning the indirection semantically inert.
    """
    register_views(spark, sf_dir, ("customer",))
    spark.sql("DECLARE OR REPLACE VARIABLE seg_query STRING")
    spark.sql(
        """SET VAR seg_query =
           'SELECT c_mktsegment, COUNT(*) AS n_customers
            FROM customer WHERE c_acctbal > ? GROUP BY c_mktsegment'"""
    )
    return spark.sql("EXECUTE IMMEDIATE seg_query USING 5000.0")


@query(
    "sql_scalar_udf",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             AS revenue,
           CAST(SUM(CASE WHEN l_quantity >= 30.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bulk
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (CREATE FUNCTION ... RETURN expr,
    Spark 4): business logic named once in the catalog and reused
    across queries — the migration target for warehouse UDF libraries.
    Unlike Python UDFs (``udf_scalar_py``), a SQL UDF's body is
    INLINED into the calling plan by Catalyst, so it optimizes,
    prunes, and codegens exactly like hand-written expressions: zero
    serialization boundary, full whole-stage codegen, identical plan
    to the oracle's inline form at any scale. ``disc_revenue`` bakes
    in the integer-unit exact-sum discipline; ``is_bulk`` shows a
    predicate UDF feeding a conditional aggregate.
    """
    register_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_revenue_units(
               p DOUBLE, d DOUBLE) RETURNS BIGINT
           RETURN CAST(FLOOR(p * (1.0 - d) * 100 + 0.5) AS BIGINT)"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION is_bulk(q DOUBLE)
           RETURNS BOOLEAN RETURN q >= 30.0"""
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_lines,
               CAST(SUM(disc_revenue_units(l_extendedprice, l_discount))
                    AS DOUBLE) / 100.0 AS revenue,
               SUM(CASE WHEN is_bulk(l_quantity) THEN 1 ELSE 0 END)
                 AS n_bulk
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "sql_reuse_exchange",
    oracle="""
    WITH agg AS (
      SELECT o_orderstatus, COUNT(*) AS n FROM orders
      GROUP BY o_orderstatus
    ),
    mx AS (SELECT MAX(n) AS mx FROM agg)
    SELECT o_orderstatus, n,
           n * 1000000 // mx AS share_of_max_micro
    FROM agg CROSS JOIN mx
    """,
)
def sql_reuse_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange reuse: an aggregate consumed twice (once as rows, once
    reduced to its max) must SHUFFLE ONCE — AQE recognizes the two
    identical exchanges at runtime and wires the second consumer to
    the first's output (``ReusedExchange`` in the executed plan,
    pinned by the plan test). This is the free multi-consumer
    optimization every share-of-total / pct-of-max query depends on at
    100 TB: without it the fact table is scanned and shuffled once per
    consumer. Note the check must run on the POST-execution plan —
    AQE decides reuse at runtime, so the static plan shows two
    exchanges (the gotcha documented in SCALE.md's ReusedExchange
    note). The share itself is integer arithmetic on both engines.
    """
    t = load_tables(spark, sf_dir, ("orders",))
    agg = t["orders"].groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    mx = agg.agg(F.max("n").alias("mx"))
    return agg.crossJoin(F.broadcast(mx)).select(
        "o_orderstatus",
        "n",
        F.expr("n * 1000000 DIV mx").alias("share_of_max_micro"),
    )
