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

from streamingdemo_spark.io import load_tables, register_views
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


@query(
    "flagship_q5",
    oracle=f"""
    SELECT n.n_name AS nation,
           {osum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def flagship_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second flagship (TPC-H-Q5-shaped): local-supplier revenue by
    nation — a 6-table join with the classic "customer and supplier
    in the SAME nation" correlated equi-condition, a region filter
    that prunes through two dimension hops, and a date-sliced fact
    scan.

    Scale shape: region→nation→customer is a chain of
    broadcast-eligible dims (each filter shrinks the next hop);
    supplier joins the fact on (suppkey) PLUS the nation-equality
    residual, keeping it an equi-join — the naive form (join on
    suppkey, filter nations later) carries the same plan here, but
    expressing both equalities in the join lets Catalyst use them for
    sizing. The only big shuffle is lineitem⋈orders; everything else
    broadcasts, and the final aggregate is nation-cardinality-sized.
    The date filters push into the orders parquet scan
    (PushedFilters), so the fact join sees one year, not the table.
    """
    t = load_tables(
        spark,
        sf_dir,
        ("region", "nation", "customer", "orders", "lineitem", "supplier"),
    )
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    r = t["region"].filter(F.col("r_name") == "ASIA")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    joined = (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        )
    )


@query(
    "flagship_q18",
    oracle=f"""
    WITH hot AS (
      SELECT l_orderkey, {osum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, h.sum_qty
    FROM hot h
    JOIN orders o ON o.o_orderkey = h.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
    """,
)
def flagship_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third flagship (TPC-H-Q18-shaped): large-volume customers — the
    orders whose total line quantity exceeds a threshold, with their
    customer, ranked by order value. The defining shape is an
    aggregate-driven semi-filter: the qualifying set comes from a
    HAVING over a fact-table aggregate, not from any dimension
    predicate.

    Scale shape: ONE aggregate over lineitem (map-side partial
    combine, integer-unit exact sum) produces the hot-order set; the
    HAVING prunes it to a tiny relation that then BROADCASTS to
    orders — the classic Q18 anti-pattern (re-joining the full
    lineitem against orders and re-aggregating) never materializes.
    Customer is a broadcast dim, and the top-100 is a TakeOrdered
    (no global sort). The deterministic o_orderkey tiebreak makes the
    LIMIT oracle-stable.
    """
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    hot = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        t["orders"]
        .join(F.broadcast(hot), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(
            F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(100)
    )


@query(
    "flagship_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           {osum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
        OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INT)
    """,
)
def flagship_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth flagship (TPC-H-Q7-shaped): volume shipping between two
    nations — revenue flowing supplier-nation → customer-nation per
    year, with the classic DISJUNCTIVE pair predicate ((A,B) or
    (B,A)) that couples two different dimension hops of the same
    dimension table.

    Scale shape: the disjunction implies each nation side is
    individually in {{A, B}}, so BOTH aliased nation scans are
    pre-filtered to two rows before joining — the pair condition
    survives only as a cheap residual that removes the A→A / B→B
    combinations. That turns supplier and customer into
    semi-filtered broadcast dims (each keeps ~2/25ths of its rows),
    the date range pushes into the lineitem parquet scan, and the
    only big shuffle is lineitem⋈orders. The aggregate output is
    2 pairs × years — trivially small. A naive translation that
    keeps the OR-of-ANDs as a post-join filter forfeits the nation
    pruning and drags the full dims through the join; plan-asserted
    in tests/test_plans.py.
    """
    t = load_tables(
        spark, sf_dir, ("nation", "customer", "orders", "lineitem", "supplier")
    )
    pair = ("NATION_3", "NATION_9")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    n1 = (
        t["nation"]
        .filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = (
        t["nation"]
        .filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    supp = t["supplier"].join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = t["customer"].join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    items = t["lineitem"].filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    return (
        items.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        # residual of the disjunctive pair predicate: nation pruning
        # already restricted both sides to {A, B}; only cross pairs stay
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "flagship_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
)
def flagship_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth flagship (TPC-H-Q21 shape): suppliers who kept orders
    waiting — the sole late supplier on multi-supplier finished
    orders ('late' = shipped >60 days after the order date, standing
    in for the reference fixture's missing receipt/commit dates).

    Single-pass plan (round-6 rewrite, replacing the naive
    EXISTS + NOT EXISTS form the oracle still runs): the correlated
    pair decorrelates by hand into per-order conditional aggregates —
    ONE scan of lineitem instead of the three (base + left-semi +
    left-anti re-scans) Catalyst compiled the subquery form into,
    which made this the worst key in the sf10 sweep (41× wall at
    100× data).

      1. lineitem ⋈ orders(status='F') on orderkey — the only
         fact-sized shuffle; both sides bucketable by orderkey at
         100 TB (``join_bucketed``'s layout).
      2. groupBy (orderkey, suppkey): n_late = late-line count
         (map-side partial agg shrinks the fact to supplier-order
         grain before the exchange).
      3. Two order-grain window aggregates over the tiny supplier-
         order table: n_supp (EXISTS l2 ⟺ n_supp ≥ 2) and
         n_late_supp (NOT EXISTS l3 ⟺ this supplier is the ONLY
         late one, n_late_supp = 1 with n_late > 0).
      4. Qualifying rows contribute their n_late line count (the
         original COUNT(*) counts l1 ROWS, not suppliers), broadcast-
         join supplier for the name, sum per s_name.
    """
    t = load_tables(spark, sf_dir, ("supplier", "orders", "lineitem"))
    from pyspark.sql.window import Window as W

    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    per_so = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            t["orders"]
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(late.cast("long")).alias("n_late"))
    )
    wo = W.partitionBy("l_orderkey")
    waiting = (
        per_so.withColumn("n_supp", F.count(F.lit(1)).over(wo))
        .withColumn(
            "n_late_supp",
            F.sum((F.col("n_late") > 0).cast("long")).over(wo),
        )
        .filter(
            (F.col("n_late") > 0)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        waiting.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("n_late").alias("numwait"))
    )


_Q13_SQL = """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """


@query("flagship_q13", oracle=_Q13_SQL)
def flagship_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth flagship (TPC-H-Q13 shape): customer order-count
    distribution — how many customers placed 0, 1, 2… qualifying
    orders. The defining subtlety: the order filter lives in the
    JOIN'S ON CLAUSE, not the WHERE — moving it to WHERE silently
    deletes every zero-order customer from the distribution (the
    LEFT JOIN's null rows fail any WHERE predicate on the right
    side), which is the most common Q13 rewrite bug.

    Shape: one outer join (customer side broadcastable; at scale the
    orders side shuffles on custkey once), a per-customer COUNT of
    the RIGHT side's key (NULL-skipping, so unmatched customers count
    0), then a distribution-sized second aggregate. Identical SQL on
    both engines."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q13_SQL)


_Q19_SQL = f"""
    SELECT {{osum}} AS revenue, COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """


@query(
    "flagship_q19",
    oracle=_Q19_SQL.format(
        osum=osum("l.l_extendedprice * (1 - l.l_discount)", 4)
    ),
)
def flagship_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seventh flagship (TPC-H-Q19 shape): discounted revenue under a
    DISJUNCTION of conjunctive condition groups mixing columns from
    BOTH join sides — the classic stress test for OR-predicate
    handling. The optimizer must split each OR branch into its
    per-side conjuncts and push the derivable unions down: the part
    scan receives brand IN (…) (every branch constrains brand) and
    the lineitem scan a quantity range, while only the cross-side
    residual stays on the join — a naive plan filters the full join
    output instead. Plan-asserted: pushed scan filters on both sides,
    part broadcast, no cartesian. Identical SQL on both engines.
    """
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        _Q19_SQL.format(
            osum="CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)"
            " * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0"
        )
    )
