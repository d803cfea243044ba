"""Behavioral / product-analytics operator surface over the events
table: funnel analysis, cohort retention, and activity streaks
(gaps-and-islands) — the event-sequence queries the reference's
unrestricted SQL entry point (``src/sparkSQL/SparkSQLOperator.java:
18-19``) is used for in stream-analysis deployments.

All three are windows/aggregates over integer day indices and ordered
event sequences — no floats anywhere, so every value is exactly
portable. The fixture guarantees (user_id, ts) uniqueness, and every
ordering ties-breaks by event_id anyway, so sequences are
deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query

_EPOCH = "2024-01-01"


@query(
    "ext_funnel_analysis",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id,
             STRING_AGG(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN seq LIKE '%s%' THEN 1 ELSE 0 END)
                AS BIGINT) AS reached_signup,
           CAST(SUM(CASE WHEN seq LIKE '%s%v%' THEN 1 ELSE 0 END)
                AS BIGINT) AS reached_view,
           CAST(SUM(CASE WHEN seq LIKE '%s%v%c%' THEN 1 ELSE 0 END)
                AS BIGINT) AS reached_click,
           CAST(SUM(CASE WHEN seq LIKE '%s%v%c%p%' THEN 1 ELSE 0 END)
                AS BIGINT) AS reached_purchase
    FROM seqs
    """,
)
def ext_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: how many users progressed signup → view → click
    → purchase IN THAT ORDER (later stages may interleave with other
    events — the subsequence semantics of product funnels).

    Each user's event-initial string (ordered by ts, event_id — first
    letters are distinct across the 5 fixture event types) is matched
    against cumulative LIKE patterns: '%s%v%c%p%' is exactly "a signup
    before a view before a click before a purchase". One groupBy
    per user then one global aggregate; the per-user sequence is
    bounded by that user's event count, and LIKE subsequence matching
    is linear — no per-stage self-joins (the naive funnel query is a
    4-way join on inequality conditions).
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    item = F.struct(
        F.col("ts").alias("t"),
        F.col("event_id").alias("e"),
        F.substring("event_type", 1, 1).alias("i"),
    )
    seqs = (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(item)).alias("items"))
        .select(
            F.array_join(
                F.transform(F.col("items"), lambda x: x["i"]), ""
            ).alias("seq")
        )
    )
    flag = lambda p: F.sum(  # noqa: E731
        F.when(F.col("seq").like(p), 1).otherwise(0)
    )
    return seqs.agg(
        F.count(F.lit(1)).alias("n_users"),
        flag("%s%").alias("reached_signup"),
        flag("%s%v%").alias("reached_view"),
        flag("%s%v%c%").alias("reached_click"),
        flag("%s%v%c%p%").alias("reached_purchase"),
    )


@query(
    "agg_retention_cohort",
    oracle=f"""
    WITH weeks AS (
      SELECT user_id,
             date_diff('day', DATE '{_EPOCH}', ts) // 7 AS week
      FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(week) AS cohort FROM weeks GROUP BY user_id
    )
    SELECT f.cohort,
           w.week - f.cohort AS weeks_since,
           COUNT(DISTINCT w.user_id) AS active_users
    FROM weeks w JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week
    (the cohort), counted as active for each subsequent week — the
    table behind every retention curve.

    Two aggregates and one join on user_id: the firsts relation is one
    row per user (broadcastable at any realistic user count relative
    to the event log), and the output is |cohorts| × |weeks| rows —
    bounded by time, not data. Week indices are pure integer division
    of day differences; no timestamps leave the query.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    weeks = ev.select(
        "user_id",
        F.floor(F.datediff(F.col("ts"), F.lit(_EPOCH)) / 7).alias("week"),
    )
    firsts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (
        weeks.join(F.broadcast(firsts), "user_id")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("weeks_since"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "win_gap_islands",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '{_EPOCH}', ts) AS day
      FROM events
    ),
    grp AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY day) AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, COUNT(*) AS len FROM grp GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           COUNT(*) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the longest run of consecutive
    active days and the number of distinct runs — the classic
    streak/sessionization-by-calendar query.

    The island key is day - row_number(): constant within a
    consecutive run, strictly decreasing across gaps. One distinct,
    one partitioned window, two aggregates — all partitioned by
    user_id, so the only shuffle is the initial per-user clustering.
    Pure integer day indices end to end.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    days = ev.select(
        "user_id", F.datediff(F.col("ts"), F.lit(_EPOCH)).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("island", F.col("day") - F.row_number().over(w))
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
