"""Window-function surface (SURVEY.md §2.D windows).

Scale notes: every window here partitions by a key (customer, user,
group), so work distributes across the shuffle — never a global
``Window.orderBy`` without partitioning, which would serialize onto one
task at 100 TB. (The one global ordering in the engine lives in
``sorts_sets.sort_multi`` and is documented there.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("orders",))["orders"]


# Deterministic intra-partition order: (o_orderdate, o_orderkey) is
# unique per customer, so ranks/frames are reproducible on both engines.
_BY_CUST = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"


def _w_by_cust() -> Window:
    return Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


@query(
    "win_row_number",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER ({_BY_CUST}) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(_w_by_cust()).alias("rn"),
    )


@query(
    "win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)
             AS drnk,
           NTILE(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    by_prio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    by_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(by_prio).alias("rnk"),
        F.dense_rank().over(by_prio).alias("drnk"),
        F.ntile(4).over(by_price).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderdate) OVER ({_BY_CUST}) AS prev_date,
           LEAD(o_orderdate) OVER ({_BY_CUST}) AS next_date,
           date_diff('day', LAG(o_orderdate) OVER ({_BY_CUST}), o_orderdate)
             AS days_since_prev
    FROM orders
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    w = _w_by_cust()
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.datediff(F.col("o_orderdate"), prev).cast("bigint").alias("days_since_prev"),
    )


@query(
    "win_running",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))
                OVER ({_BY_CUST} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum, unbounded-preceding row frame (decimal-accumulated
    so the prefix sums hash-match exactly)."""
    o = _orders(spark, sf_dir)
    w = _w_by_cust().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "win_moving",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))
                OVER ({_BY_CUST} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS DOUBLE)
           / COUNT(*) OVER ({_BY_CUST} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg_3
    FROM orders
    """,
)
def win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a bounded 3-row frame."""
    o = _orders(spark, sf_dir)
    w = _w_by_cust().rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(38,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_3"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT p_partkey, p_size,
           COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
             AS n_similar_size
    FROM part
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: peers within 5 size units below."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_size")
        .rangeBetween(-5, Window.currentRow)
    )
    return p.select(
        "p_partkey", "p_size", F.count(F.lit(1)).over(w).alias("n_similar_size")
    )


@query(
    "win_first_last",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER ({_BY_CUST}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_order,
           LAST_VALUE(o_orderkey) OVER ({_BY_CUST}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    w = _w_by_cust().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@query(
    "win_topk_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer)
    WHERE rn <= 3
    """,
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the distributed top-k idiom (rank within
    partition, filter), never a global sort."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


def sessionized_events(ev: DataFrame) -> DataFrame:
    """The events relation plus a per-user ``session_id`` from the
    30-minute lag-gap rule (break when the gap from the previous event
    exceeds 30 minutes, (ts, event_id)-ordered) — THE batch session
    boundary definition, shared by ``win_sessionize`` and
    ``ext_attribution_shapley`` so the rule cannot drift between
    keys."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order)
    is_start = F.when(
        prev_ts.isNull()
        | (F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    return ev.withColumn("session_id", F.sum(is_start).over(run))


@query(
    "win_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum = session id
    (the window-function form of session_window, exact and
    oracle-checkable; the streaming form is ``stream_session``)."""
    from streamingdemo_spark.io import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        sessionized_events(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "win_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey), 6) AS bal_pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey), 6) AS bal_cume
    FROM customer
    """,
)
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist per
    segment (rounded — both are ratios of row positions)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC, c_custkey) AS INT) AS bal_quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: account-balance quartiles per market segment —
    the percentile-bucket assignment (cohorting, tier pricing) the
    distribution functions (win_dist) don't directly give. Integer
    output, so exactly comparable across engines."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@query(
    "win_time_range",
    oracle="""
    WITH u AS (
      SELECT event_id, user_id,
             date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec,
             CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS x
      FROM events
    )
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_last_hour,
           CAST(CAST(SUM(x) OVER w AS BIGINT) AS DOUBLE) / 10000.0
             AS val_last_hour
    FROM u
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, the rolling count and
    value sum over the trailing hour of events — the "activity in the
    last N minutes" window where ROWS frames (``win_moving``) are
    wrong because event spacing is irregular.

    The frame key is integer epoch seconds (identical truncation on
    both engines) and the summed column rides in integer units, so
    frame membership AND the rolling sums are exact everywhere. Spark
    evaluates a RANGE frame with one ordered pass per partition —
    state is the in-frame window, which a time bound keeps naturally
    bounded (events older than an hour leave the frame); the shuffle
    is only the per-user clustering.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    u = ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("sec"),
        F.floor(F.col("value") * 10000 + F.lit(0.5)).alias("x"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return u.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        (F.sum("x").over(w).cast("double") / F.lit(10000.0)).alias(
            "val_last_hour"
        ),
    )


@query(
    "win_ewma",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             list(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vals
      FROM events
    )
    SELECT user_id, event_id,
           ROUND(
             list_aggregate(
               list_transform(vals,
                 (v, i) -> v / CAST(CAST(1 AS BIGINT)
                                    << (len(vals) - i) AS DOUBLE)),
               'sum')
             / (2.0 - 1.0 / CAST(CAST(1 AS BIGINT)
                                 << (len(vals) - 1) AS DOUBLE))
             / 10000.0,
             6) + 0.0 AS ewma_value
    FROM seq
    """,
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2) per user over a
    16-event trailing frame — the smoothing every monitoring/trading
    pipeline runs, which plain SQL windows can't express because the
    weight depends on the row's POSITION in the frame (not a builtin
    aggregate). Expressed as a frame-ordered ``collect_list`` plus a
    positional higher-order fold — JVM-side, no UDF.

    Exactness (why α = 1/2): weights 2^-k are built by INTEGER shift
    then one exact division (never libm ``pow``), value units are
    ≤24-bit integers, and k ≤ 15 — so every term AND every partial sum
    fits the 53-bit mantissa exactly: the whole fold is
    exact-arithmetic on both engines, with one correctly-rounded
    division by the closed-form weight total 2 − 2^−(n−1) at the end.
    Index convention pinned by the oracle: Spark's lambda index is
    0-based, DuckDB's is 1-based — both reduce to weight
    2^-(n-1-pos0).

    Scale shape: one partitioned window carrying a ≤16-element array —
    state is frame-bounded, cost linear in events, shuffle only on
    user_id. For unbounded (non-truncated) EWMA, use the streaming
    stateful path (``stream_stateful_custom``) where the running value
    is one number of state per key."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, 0)
    )
    v_units = F.floor(F.col("value") * 10000 + F.lit(0.5))
    vals = F.collect_list(v_units).over(w)
    seq = ev.select("user_id", "event_id", vals.alias("vals"))
    # weight 2^-(n-1-i): integer shift, exact
    num = F.expr(
        "aggregate(transform(vals, (v, i) -> "
        "v / CAST(shiftleft(CAST(1 AS BIGINT), size(vals) - 1 - i) "
        "AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    den = F.lit(2.0) - F.lit(1.0) / F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), size(vals) - 1) AS DOUBLE)"
    )
    return seq.select(
        "user_id",
        "event_id",
        (F.round(num / den / F.lit(10000.0), 6) + F.lit(0.0)).alias(
            "ewma_value"
        ),
    )


@query(
    "win_session_native",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def win_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window()`` in batch: one groupBy on
    (user, session_window(ts, 30 min)) assigns and merges sessions
    inside the aggregate — no explicit lag/running-sum window pass
    (contrast ``win_sessionize``, the window-function formulation of
    the same semantics, and ``stream_session``, the streaming form).

    The oracle replays the semantics with the lag-gap construction and
    pins the boundary convention: session_window's end is
    last_event + gap with an EXCLUSIVE bound, so an event exactly
    gap-after its predecessor starts a NEW session (>= in the gap
    test, where the plain sessionize key's documented convention is
    >). One shuffle on user_id; the session merge is
    aggregate-internal state bounded per user."""
    from streamingdemo_spark.io import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sw = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy("user_id", sw.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "win_yoy_growth",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) / 100.0 AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    )
    SELECT nation, o_year, revenue,
           LAG(revenue) OVER (PARTITION BY nation ORDER BY o_year)
             AS prev_revenue,
           (revenue - LAG(revenue) OVER (PARTITION BY nation
                                         ORDER BY o_year))
             / LAG(revenue) OVER (PARTITION BY nation ORDER BY o_year)
             AS yoy_growth
    FROM rev
    """,
)
def win_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth: a window over an AGGREGATE's output —
    nation×year revenue first, then LAG along each nation's year
    series to produce the growth ratio. The composition (aggregate →
    window on the aggregate, not on raw rows) is the defining shape of
    every BI trend report and of TPC-DS's share-shift queries; the
    raw-row window keys (win_lag_lead etc.) don't cover it.

    Scale shape: the aggregate reduces the fact to nation×year grain
    BEFORE the window, so the window input is tiny however large the
    fact — the window shuffle moves ~nations×years rows. Partitioned
    by nation (never a global order). First year per nation has NULL
    prev/growth on both engines.

    Exactness: revenue is an integer-unit exact sum; LAG moves those
    exact doubles unchanged; the growth ratio replays the identical
    (sub, div) float sequence on both engines.
    """
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    rev = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            (
                F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))).cast(
                    "double"
                )
                / F.lit(100.0)
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("nation").orderBy("o_year")
    prev = F.lag("revenue").over(w)
    return rev.select(
        "nation",
        "o_year",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev).alias("yoy_growth"),
    )


@query(
    "win_share_of_total",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS units
      FROM orders
    )
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(units AS DOUBLE)
             / CAST(SUM(units) OVER (PARTITION BY o_custkey) AS DOUBLE)
             AS share_of_customer,
           RANK() OVER (PARTITION BY o_custkey
                        ORDER BY units DESC, o_orderkey) AS spend_rank
    FROM u
    """,
)
def win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its customer's total
    spend, plus its rank among that customer's orders — the canonical
    "percent of group total" BI window (RATIO_TO_REPORT in Oracle/
    Teradata dialects), expressed as a full-partition window aggregate
    feeding a per-row division.

    Scale shape: ONE shuffle on the partition key serves both the
    window SUM and the RANK (same window spec family); no join-back of
    a separate aggregate (the naive two-pass form) and no global
    window — everything is per-customer.

    Exactness: prices scale to integer cents; the partition SUM is an
    exact integer, so each share is one exact-int / exact-int double
    division, identical on both engines. The rank orders by the
    integer units with an orderkey tiebreak — fully deterministic.
    """
    o = _orders(spark, sf_dir)
    u = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("units"),
    )
    wsum = Window.partitionBy("o_custkey")
    wrank = Window.partitionBy("o_custkey").orderBy(
        F.desc("units"), F.asc("o_orderkey")
    )
    return u.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        (
            F.col("units").cast("double")
            / F.sum("units").over(wsum).cast("double")
        ).alias("share_of_customer"),
        F.rank().over(wrank).alias("spend_rank"),
    )


@query(
    "win_moving_median",
    oracle="""
    WITH u AS (
      SELECT event_id, user_id, value,
             CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS v_units,
             ts
      FROM events
    ),
    fr AS (
      SELECT event_id, user_id, value,
             list_sort(list(v_units) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS frame
      FROM u
    )
    SELECT event_id, user_id, value,
           CAST(frame[(len(frame) + 1) // 2] AS DOUBLE) / 10000.0
             AS moving_median
    FROM fr
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving MEDIAN over the trailing 7 observations per user — the
    outlier-robust smoother ops dashboards use where ``win_moving``'s
    mean spikes on a single bad reading. Exact, not approximate: the
    frame's values (integer 1e-4 units) sort inside the window and
    the nearest-rank element at ceil(n/2) is selected — both engines
    pick the identical source value, nothing interpolated.

    Scale shape: one shuffle on the partition key; per-row cost is
    the O(k log k) sort of a SEVEN-element frame (constant), so the
    whole operator is linear — the classic streaming-median heap
    trick is unnecessary at fixed small k, and for large frames the
    exact-percentile window of ``agg_percentile_exact`` or the KLL
    sketch keys are the documented paths. The (ts, event_id) order
    makes frames deterministic under ties.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    frame = F.array_sort(
        F.collect_list(
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
        ).over(w)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (
            F.element_at(frame, ((F.size(frame) + 1) / 2).cast("int")).cast(
                "double"
            )
            / F.lit(10000.0)
        ).alias("moving_median"),
    )


@query(
    "win_skyline_frontier",
    oracle="""
    WITH pts AS (
      SELECT p_retailprice AS price, p_size AS psize,
             COUNT(*) AS n_parts, MIN(p_partkey) AS sample_part
      FROM part GROUP BY p_retailprice, p_size
    ),
    scan AS (
      SELECT *, MAX(psize) OVER (
               ORDER BY price ASC, psize DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS best_prev
      FROM pts
    )
    SELECT price, psize, n_parts, sample_part
    FROM scan
    WHERE best_prev IS NULL OR psize > best_prev
    """,
)
def win_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: the parts no other part
    dominates (cheaper-or-equal AND bigger-or-equal, strictly better
    in one) — the multi-objective shortlist shape of product search,
    instance-type pickers, and model-selection dashboards (cost vs
    quality).

    The naive formulation is a quadratic NOT EXISTS self-join; the
    plan here is the sort-based linear scan: dedupe to distinct
    (price, size) points, order by (price asc, size desc), and keep a
    point iff its size beats the running MAX over all strictly-prior
    points — after tie-dedup that inequality is exactly
    non-domination (a prior point has smaller price, or equal price
    and larger size; either way size ≥ current means dominated).

    The global ORDER here serializes the frontier scan onto one task
    after a point-grain dedup — fine while distinct (price, size)
    points fit one task (they usually do; the DOMAIN is small even
    when rows are billions). For wider domains, grid-partition price
    into ranges, compute local frontiers per range in parallel, then
    rescan the concatenated local frontiers — same operator twice.
    Identical window logic on both engines.
    """
    p = load_tables(spark, sf_dir, ("part",))["part"]
    pts = p.groupBy(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("psize")
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("sample_part"),
    )
    w = (
        Window.orderBy(F.asc("price"), F.desc("psize"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scan = pts.withColumn("best_prev", F.max("psize").over(w))
    return scan.filter(
        F.col("best_prev").isNull() | (F.col("psize") > F.col("best_prev"))
    ).select("price", "psize", "n_parts", "sample_part")
