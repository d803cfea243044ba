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
from streamingdemo_spark.registry import dsum, half_up_micro_avg, query, usum

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


def _hourly_spine_join(ev, agg):
    """Gap-filled hourly grid (shared by ext_ts_resample and
    ext_ts_motif — the oracle SQL mirrors this spine in both keys):
    generate every hour between the observed min/max bucket (broadcast
    1-row bounds relation, never a driver collect), cross the distinct
    series, and left-join the per-(series, bucket) aggregate so gap
    buckets surface as NULL rows for the caller to fill."""
    bounds = ev.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    return hours.crossJoin(F.broadcast(types)).join(
        agg, ["event_type", "bucket"], "left"
    )


def _nonneg_value_guard(ev, key: str):
    """``half_up_micro_avg``'s truncating-div-equals-floor identity
    holds only for non-negative operands (registry.py): fail the query
    loudly on a negative event value instead of silently rounding
    toward zero — a divergence the hash-parity harness can't surface
    because both engines would agree (the agg_minmax_by encoding-guard
    discipline)."""
    guard = F.assert_true(
        F.col("value") >= 0,
        F.lit(
            f"{key}: negative event value violates half_up_micro_avg's"
            " non-negative-operand precondition (truncating div is not"
            " floor for negative operands); shift values upstream or"
            " extend the formula to signed sums"
        ),
    )
    return ev.where(guard.isNull())


@query(
    "ext_ts_resample",
    oracle=f"""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(FLOOR((value) * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) AS units
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                    AS bucket FROM bounds) g
    ),
    j AS (
      SELECT s.event_type, s.bucket,
             COALESCE(a.n_events, 0) AS n_events,
             CAST(COALESCE(a.units, 0) AS DOUBLE) / 10000.0 AS sum_value,
             CASE WHEN a.n_events > 0
                  THEN {half_up_micro_avg("a.units", "a.n_events", sql=True)}
                  END AS avg_micro
      FROM spine s LEFT JOIN agg a
        ON s.event_type = a.event_type AND s.bucket = a.bucket
    )
    SELECT event_type, bucket, n_events, sum_value,
           CAST(LAST_VALUE(avg_micro IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 1000000.0 AS ffill_avg
    FROM j
    """,
)
def ext_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill and forward fill — the
    hypertable-rollup / ``time_bucket_gapfill`` shape: bucket events to
    a fixed hourly grid, emit EVERY bucket in the observed range per
    series (zero-filled counts/sums), and carry the last observed
    per-bucket average forward across gaps.

    Shape: one fact-table aggregate (map-side partial combine, shuffle
    bounded by series × buckets), a generated time spine (sequence +
    explode over a broadcast 1-row min/max relation — never a driver
    collect), a spine←rollup left join on (series, bucket), and one
    per-series ordered window for the forward fill. At 100 TB the only
    full-data pass is the first aggregate; everything downstream is
    rollup-sized (series × buckets), and the fill window partitions by
    series so no single reducer sees more than one series' grid.

    Portability: sums go through the integer-unit convention
    (events.value is exactly 4-decimal), and the carried average is
    computed ENTIRELY on the integer micro grid — round-half-up via
    ``(2·units·100 + n) div (2n)``, all operands non-negative —
    before ONE exact display division by 1e6. The earlier form
    rounded a double quotient to 6 decimals, and the sf1 differential
    probe caught the classic failure: a bucket whose exact average
    sits ON the 1e-6 midpoint (13911.3/320 = 43.4728125) rounds
    differently per engine (2 rows in 3600 flipped). Integer
    arithmetic has no midpoint ambiguity. Overflow headroom:
    2·units·100 per (series, bucket) stays under 2^63 until a single
    hourly bucket holds ~9e13 value-units (~2500× the 100 TB bucket
    estimate). Leading buckets before the first observation stay NULL
    (nothing to carry) on both engines.
    """
    ev = _nonneg_value_guard(
        load_tables(spark, sf_dir, ("events",))["events"], "ext_ts_resample"
    ).withColumn("bucket", F.date_trunc("hour", F.col("ts")))
    agg = ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        usum("value").alias("units"),
    )
    j = _hourly_spine_join(ev, agg).select(
        "event_type",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        (F.coalesce("units", F.lit(0)).cast("double") / 10000.0).alias(
            "sum_value"
        ),
        F.when(
            F.col("n_events") > 0,
            F.expr(half_up_micro_avg("units", "n_events")),
        ).alias("avg_micro"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "event_type",
        "bucket",
        "n_events",
        "sum_value",
        (
            F.last("avg_micro", ignorenulls=True).over(w).cast("double")
            / 1000000.0
        ).alias("ffill_avg"),
    )


@query(
    "ext_event_pattern",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             STRING_AGG(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(length(seq) AS INT) AS seq_len,
           CAST(length(regexp_extract_all(seq, 'v[ce]*p')) AS INT)
             AS n_conversions
    FROM seqs
    """,
)
def ext_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (the MATCH_RECOGNIZE / CEP shape):
    count, per user, the non-overlapping view→…→purchase runs where
    only clicks/errors may sit between the view and its purchase —
    ``v[ce]*p`` over the ordered event-initial string.

    This is the complex-event-processing query a streaming analysis
    container gets asked for (detect conversion episodes, alert on
    N-step patterns); funnels (``ext_funnel_analysis``) answer "did
    the user ever reach stage k", this answers "how many complete
    episodes occurred and how long is the history". Regex matching is
    leftmost non-overlapping in both engines, so counts agree exactly.

    Scale shape: one groupBy(user) building the bounded per-user
    sequence (same aggregate as the funnel — at 100 TB sessions are
    bounded, not lifetime histories), then a narrow projection; the
    regex runs once per user, not per event. No joins, no windows.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    item = F.struct(
        F.col("ts").alias("t"),
        F.col("event_id").alias("e"),
        F.substring("event_type", 1, 1).alias("i"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(item)), lambda x: x["i"]
            ),
            "",
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.length("seq").alias("seq_len"),
        F.regexp_count("seq", F.lit(r"v[ce]*p")).alias("n_conversions"),
    )


@query(
    "ext_ts_anomaly",
    oracle="""
    WITH u AS (
      SELECT event_id, event_type, ts,
             CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS x
      FROM events
    ),
    win AS (
      SELECT event_id, event_type, x,
             COUNT(x) OVER w AS n,
             CAST(COALESCE(SUM(x) OVER w, 0) AS BIGINT) AS su,
             CAST(COALESCE(SUM(x * x) OVER w, 0) AS BIGINT) AS sq
      FROM u
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type,
           CAST(x AS DOUBLE) / 10000.0 AS value,
           CAST(n AS INT) AS n_window,
           (n >= 12 AND
            (x * n - su) * (x * n - su) > 9 * (n * sq - su * su))
             AS is_anomaly
    FROM win
    """,
)
def ext_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: flag events whose value sits
    more than 3 population standard deviations from the mean of the
    previous 24 events in their series — the batch form of the
    streaming outlier monitor.

    The entire test runs in INTEGER arithmetic: values quantize to
    1e-4 units (exact for the fixture's 4-decimal column), the window
    keeps trailing count/sum/sum-of-squares, and the 3σ test
    ``(x−mean)² > 9·var`` multiplies through by n² to
    ``(x·n − su)² > 9·(n·sq − su²)`` — no division, no sqrt, no
    floats, so the anomaly set is bitwise identical on both engines
    (a float z-score would flip boundary rows on the last ulp).

    Scale shape: one window partitioned by series with a bounded
    ROWS frame — Spark keeps a 24-row ring buffer per partition, so
    memory is O(frame), not O(series length), and the only shuffle is
    the per-series clustering. The same three running sums are what
    the streaming variant would keep in applyInPandasWithState.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    u = ev.select(
        "event_id",
        "event_type",
        "ts",
        F.floor(F.col("value") * 10000 + F.lit(0.5)).alias("x"),
    )
    # (ts, event_id), matching the stream twin's r7 fix: the trailing
    # window is defined over TIME order, and id order coincides only
    # while ids are ts-monotone — the twin keys must screen the same
    # window on any corpus
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, -1)
    )
    win = u.select(
        "event_id",
        "event_type",
        "x",
        F.count("x").over(w).alias("n"),
        F.coalesce(F.sum("x").over(w), F.lit(0)).alias("su"),
        F.coalesce(F.sum(F.col("x") * F.col("x")).over(w), F.lit(0)).alias("sq"),
    )
    dev = F.col("x") * F.col("n") - F.col("su")
    var_n2 = F.col("n") * F.col("sq") - F.col("su") * F.col("su")
    return win.select(
        "event_id",
        "event_type",
        (F.col("x").cast("double") / F.lit(10000.0)).alias("value"),
        F.col("n").cast("int").alias("n_window"),
        ((F.col("n") >= 12) & (dev * dev > 9 * var_n2)).alias("is_anomaly"),
    )


@query(
    "ext_ts_motif",
    oracle="""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                    AS bucket FROM bounds) g
    ),
    grid AS (
      SELECT s.event_type, s.bucket, COALESCE(a.cnt, 0) AS cnt,
             CAST(ROW_NUMBER() OVER (PARTITION BY s.event_type
                                     ORDER BY s.bucket) AS INT) - 1 AS idx
      FROM spine s LEFT JOIN agg a
        ON s.event_type = a.event_type AND s.bucket = a.bucket
    ),
    wins AS (
      SELECT event_type, idx,
             list(cnt) OVER (PARTITION BY event_type ORDER BY idx
                             ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
      FROM grid
    ),
    feat AS (
      SELECT event_type, idx,
             list_transform(w, x -> 8 * x - list_reduce(w, (a, b) -> a + b))
               AS c
      FROM wins WHERE len(w) = 8
    ),
    sk AS (
      SELECT event_type, idx, c,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, 8), i ->
                 CASE WHEN c[i] >= 0
                      THEN CAST(1 AS BIGINT) << (i - 1)
                      ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a + b) AS sig,
             list_reduce(list_transform(c, x -> x * x), (a, b) -> a + b)
               AS n2
      FROM feat
    ),
    nz AS (SELECT * FROM sk WHERE n2 > 0),
    cand AS (
      SELECT a.event_type AS et_a, a.idx AS idx_a,
             b.event_type AS et_b, b.idx AS idx_b,
             ROUND(
               CAST(list_reduce(
                 list_transform(generate_series(1, 8),
                                i -> a.c[i] * b.c[i]),
                 (x, y) -> x + y) AS DOUBLE)
               / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)),
               6) + 0.0 AS corr
      FROM nz a JOIN nz b
        ON a.sig = b.sig AND a.event_type < b.event_type
    )
    SELECT et_a, idx_a, et_b, idx_b, corr
    FROM cand
    ORDER BY corr DESC, et_a, idx_a, et_b, idx_b
    LIMIT 5
    """,
)
def ext_ts_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series motif search (streaming time-series similarity
    search, EDBT'19 shape): find the most-correlated pairs of 8-hour
    windows BETWEEN different event series — shape-matching after
    level/scale removal, the building block of "which metrics co-move"
    and subsequence anomaly search.

    Scale discipline mirrors ``ext_sim_ann_lsh``: windows are sketched
    to an integer sign pattern of their mean-centered shape (c_i =
    8·x_i − Σx — integer, no division), candidates come from a
    bucket-equality self-join on the 8-bit sketch (identical sign
    shape), and only within-bucket pairs get the exact correlation —
    candidate volume is bucket-bounded, never all-windows². The final
    correlation is an integer dot product over integer norms with one
    sqrt+round at the end, so scores are engine-exact; the top-5 is a
    TakeOrdered on the fully tie-broken (corr, keys) order.

    Sliding windows come from ONE ordered pass per series (an 8-row
    window frame over the gap-filled hourly grid — series × buckets
    rows, rollup-sized); nothing rescans the raw events after the
    first hourly aggregate.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"].withColumn(
        "bucket", F.date_trunc("hour", F.col("ts"))
    )
    agg = ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grid = _hourly_spine_join(ev, agg).select(
        "event_type",
        "bucket",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
    )
    wo = Window.partitionBy("event_type").orderBy("bucket")
    grid = grid.withColumn(
        "idx", (F.row_number().over(wo) - 1).cast("int")
    )
    wf = wo.rowsBetween(0, 7)
    wins = grid.select(
        "event_type", "idx", F.collect_list("cnt").over(wf).alias("w")
    ).filter(F.size("w") == 8)
    ssum = F.aggregate("w", F.lit(0).cast("long"), lambda a, x: a + x)
    feat = wins.select(
        "event_type",
        "idx",
        F.transform("w", lambda x: 8 * x - ssum).alias("c"),
    )
    sig = F.aggregate(
        F.expr(
            "transform(sequence(1, 8), i -> "
            "CASE WHEN c[i-1] >= 0 THEN shiftleft(CAST(1 AS BIGINT), i - 1) "
            "ELSE CAST(0 AS BIGINT) END)"
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n2 = F.aggregate(
        F.transform("c", lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    sk = feat.select(
        "event_type", "idx", "c", sig.alias("sig"), n2.alias("n2")
    ).filter(F.col("n2") > 0)
    a = sk.select(
        F.col("event_type").alias("et_a"),
        F.col("idx").alias("idx_a"),
        F.col("c").alias("c_a"),
        F.col("sig").alias("sig"),
        F.col("n2").alias("n2_a"),
    )
    b = sk.select(
        F.col("event_type").alias("et_b"),
        F.col("idx").alias("idx_b"),
        F.col("c").alias("c_b"),
        F.col("sig").alias("sig"),
        F.col("n2").alias("n2_b"),
    )
    dot = F.aggregate(
        F.zip_with("c_a", "c_b", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    cand = (
        a.join(b, "sig")
        .filter(F.col("et_a") < F.col("et_b"))
        .select(
            "et_a",
            "idx_a",
            "et_b",
            "idx_b",
            (
                F.round(
                    dot.cast("double")
                    / F.sqrt(
                        F.col("n2_a").cast("double") * F.col("n2_b").cast("double")
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("corr"),
        )
    )
    return cand.orderBy(
        F.desc("corr"), "et_a", "idx_a", "et_b", "idx_b"
    ).limit(5)


@query(
    "ext_ts_twa",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS v_units,
             LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_sec
      FROM events
    ),
    agg AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(next_sec - sec) AS BIGINT) AS sum_dt,
             CAST(SUM(v_units * (next_sec - sec)) AS BIGINT) AS sum_w
      FROM seq WHERE next_sec IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, n_events, sum_dt,
           CAST({half_up_micro_avg("sum_w", "sum_dt", sql=True)}
                AS DOUBLE) / 1000000.0 AS twa_value
    FROM agg WHERE sum_dt > 0
    """,
)
def ext_ts_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user over the irregular event series:
    each observation holds until the next one (step interpolation), so
    its weight is the seconds until that successor — the correct mean
    for irregularly-sampled gauges (connection counts, prices, queue
    depths), where the row-mean over-weights bursts.

    Exactness: epoch seconds and 1e-4 value units are integers, so
    every weight and weighted term is an exact int64 product
    (|v_units·Δt| ≪ 2^63 for any realistic gauge/timespan) and the
    per-user sums are order-insensitive; the average itself rounds
    half-up ON THE INTEGER MICRO GRID (``(2·sum_w·100 + sum_dt) div
    (2·sum_dt)``, operands non-negative) before one exact display
    division by 1e6 — the same r7 rewrite as ``ext_ts_resample``,
    whose ROUND(double, 6) idiom the sf1 probe proved flips per
    engine when a rational quotient lands on a 1e-6 midpoint; this
    key's quotients are the same small-denominator rationals, so the
    idiom was retired here too rather than waiting for the midpoint.
    Intervals are closed-open: the last observation of a user
    carries no weight (no successor) — users whose events share one
    second (sum_dt = 0) are excluded rather than divided by zero.

    Scale shape: one window pass (lead) partitioned by user + one
    aggregate — both shuffle on user_id, and AQE coalesces the
    window/agg exchanges into one. No spine join, no explode: cost is
    linear in events regardless of time span (contrast
    ``ext_ts_resample``, whose hourly spine grows with the window)."""
    ev = _nonneg_value_guard(
        load_tables(spark, sf_dir, ("events",))["events"], "ext_ts_twa"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; the NTZ→LTZ cast is pinned safe by the
    # session's UTC timeZone (session.py), making unix_seconds the
    # same naive epoch DuckDB's epoch(ts) floors to
    sec = F.unix_seconds(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        sec.alias("sec"),
        F.floor(F.col("value") * 10000 + F.lit(0.5)).alias("v_units"),
    ).withColumn("next_sec", F.lead("sec").over(w))
    agg = (
        seq.filter(F.col("next_sec").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("next_sec") - F.col("sec")).alias("sum_dt"),
            F.sum(
                F.col("v_units") * (F.col("next_sec") - F.col("sec"))
            ).alias("sum_w"),
        )
    )
    return agg.filter(F.col("sum_dt") > 0).select(
        "user_id",
        "n_events",
        "sum_dt",
        (
            F.expr(half_up_micro_avg("sum_w", "sum_dt")).cast("double")
            / 1000000.0
        ).alias("twa_value"),
    )


@query(
    "ext_ts_interp",
    oracle=f"""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(FLOOR((value) * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) AS units
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                    AS bucket FROM bounds) g
    ),
    j AS (
      SELECT s.event_type, s.bucket,
             CAST(FLOOR(epoch(s.bucket)) AS BIGINT) // 3600 AS bi,
             COALESCE(a.n_events, 0) AS n_events,
             CASE WHEN a.n_events > 0
                  THEN {half_up_micro_avg("a.units", "a.n_events", sql=True)}
                  END AS avg_micro
      FROM spine s LEFT JOIN agg a
        ON s.event_type = a.event_type AND s.bucket = a.bucket
    ),
    br AS (
      SELECT *,
             LAST_VALUE(avg_micro IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
             LAST_VALUE(CASE WHEN avg_micro IS NOT NULL THEN bi END
                        IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
             FIRST_VALUE(avg_micro IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm,
             FIRST_VALUE(CASE WHEN avg_micro IS NOT NULL THEN bi END
                         IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM j
    )
    SELECT event_type, bucket, n_events,
           CASE WHEN avg_micro IS NOT NULL
                THEN CAST(avg_micro AS DOUBLE) / 1000000.0
                WHEN pm IS NOT NULL AND nm IS NOT NULL THEN
                  CAST((2 * (pm * (nb - bi) + nm * (bi - pb)) + (nb - pb))
                       // (2 * (nb - pb)) AS DOUBLE) / 1000000.0
                END AS interp_avg,
           (avg_micro IS NULL AND pm IS NOT NULL AND nm IS NOT NULL)
             AS filled
    FROM br
    """,
)
def ext_ts_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by LINEAR INTERPOLATION — the ``interpolate()`` of
    timeseries stores, next to ``ext_ts_resample``'s forward fill:
    empty hourly buckets take the value linearly between the last
    observed average before and the first after, weighted by integer
    bucket distance; buckets outside the observed bracket stay NULL.

    Portability: the ENTIRE computation is integer until one display
    division by 1e6 — bucket averages round half-up on the micro grid
    (``(2·units·100 + n) div (2n)``), bucket indices are exact
    integer epoch-hours, and the interpolated value is the integer
    convex combination ``(pm·(nb−bi) + nm·(bi−pb)) / (nb−pb)`` with
    the same half-up rule (all operands non-negative, so truncating
    div IS floor on both engines). The earlier form rounded double
    quotients to 6 decimals; the sf1 probe caught an exact-midpoint
    bucket average rounding differently per engine — integers have
    no midpoints to disagree on.

    Scale shape: same as the resample — one fact aggregate, a
    broadcast-bounds spine, and now FOUR per-series ordered window
    carries (prev/next value and position). Spark computes all four
    over ONE exchange (same partitioning, two sort orders), so the
    extra carries cost sorts, not shuffles."""
    ev = _nonneg_value_guard(
        load_tables(spark, sf_dir, ("events",))["events"], "ext_ts_interp"
    ).withColumn("bucket", F.date_trunc("hour", F.col("ts")))
    agg = ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        usum("value").alias("units"),
    )
    j = _hourly_spine_join(ev, agg).select(
        "event_type",
        "bucket",
        F.expr(
            "CAST(unix_seconds(CAST(bucket AS TIMESTAMP)) AS BIGINT) div 3600"
        ).alias("bi"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(
            F.col("n_events") > 0,
            F.expr(half_up_micro_avg("units", "n_events")),
        ).alias("avg_micro"),
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    bi_obs = F.when(F.col("avg_micro").isNotNull(), F.col("bi"))
    br = (
        j.withColumn("pm", F.last("avg_micro", ignorenulls=True).over(wb))
        .withColumn("pb", F.last(bi_obs, ignorenulls=True).over(wb))
        .withColumn("nm", F.first("avg_micro", ignorenulls=True).over(wf))
        .withColumn("nb", F.first(bi_obs, ignorenulls=True).over(wf))
    )
    interp_micro = F.expr(
        "(2 * (pm * (nb - bi) + nm * (bi - pb)) + (nb - pb))"
        " div (2 * (nb - pb))"
    )
    return br.select(
        "event_type",
        "bucket",
        "n_events",
        F.when(
            F.col("avg_micro").isNotNull(),
            F.col("avg_micro").cast("double") / 1000000.0,
        )
        .when(
            F.col("pm").isNotNull() & F.col("nm").isNotNull(),
            interp_micro.cast("double") / 1000000.0,
        )
        .alias("interp_avg"),
        (
            F.col("avg_micro").isNull()
            & F.col("pm").isNotNull()
            & F.col("nm").isNotNull()
        ).alias("filled"),
    )


@query(
    "ext_ab_ttest",
    oracle="""
    WITH s AS (
      SELECT
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             AS DOUBLE) AS n1,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS DOUBLE) AS n2,
        CAST(SUM(CASE WHEN event_type = 'view'
                 THEN CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)
                 ELSE 0 END) AS DOUBLE) / 10000.0 AS s1,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)
                 ELSE 0 END) AS DOUBLE) / 10000.0 AS s2,
        CAST(SUM(CASE WHEN event_type = 'view'
                 THEN CAST(FLOOR(value * value * 100000000 + 0.5) AS BIGINT)
                 ELSE 0 END) AS DOUBLE) / 100000000.0 AS ss1,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(FLOOR(value * value * 100000000 + 0.5) AS BIGINT)
                 ELSE 0 END) AS DOUBLE) / 100000000.0 AS ss2
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    v AS (
      SELECT n1, n2, s1 / n1 AS m1, s2 / n2 AS m2,
             ((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1 AS se1,
             ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2 AS se2
      FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n_view, CAST(n2 AS BIGINT) AS n_purchase,
           ROUND(m1 - m2, 6) + 0.0 AS mean_diff,
           ROUND((m1 - m2) / sqrt(se1 + se2), 6) + 0.0 AS t_stat,
           ROUND((se1 + se2) * (se1 + se2) /
                 (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)), 2) + 0.0
             AS welch_df
    FROM v
    """,
)
def ext_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test: does `value` differ between view and
    purchase events — the A/B significance readout every experiment
    platform computes, as ONE conditional-aggregate pass (no
    per-group scan, no collect).

    Exactness: both groups' Σy and Σy² come from integer-unit sums
    (4-decimal values → exact 1e-4 and 1e-8 grids; y² of a 4-dec
    double is exactly representable below 2^53, so the floor is
    exact), making the accumulations shuffle-order independent; the
    closing t/df formulas then run in one pinned double order on both
    engines before the shared rounding grid. At 100 TB this is one
    map-side-combined aggregate — experiment readouts cost a scan,
    not a shuffle."""
    ev = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .filter(F.col("event_type").isin("view", "purchase"))
    )
    is1 = F.col("event_type") == "view"
    u = F.floor(F.col("value") * 10000 + F.lit(0.5))
    uu = F.floor(F.col("value") * F.col("value") * 100000000 + F.lit(0.5))
    s = ev.agg(
        F.sum(is1.cast("long")).cast("double").alias("n1"),
        F.sum((~is1).cast("long")).cast("double").alias("n2"),
        (F.sum(F.when(is1, u).otherwise(0)).cast("double") / 10000.0).alias("s1"),
        (F.sum(F.when(~is1, u).otherwise(0)).cast("double") / 10000.0).alias("s2"),
        (F.sum(F.when(is1, uu).otherwise(0)).cast("double") / 100000000.0).alias("ss1"),
        (F.sum(F.when(~is1, uu).otherwise(0)).cast("double") / 100000000.0).alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1, m2 = F.col("s1") / n1, F.col("s2") / n2
    se1 = ((F.col("ss1") - F.col("s1") * F.col("s1") / n1) / (n1 - 1)) / n1
    se2 = ((F.col("ss2") - F.col("s2") * F.col("s2") / n2) / (n2 - 1)) / n2
    v = s.select(
        n1, n2, m1.alias("m1"), m2.alias("m2"),
        se1.alias("se1"), se2.alias("se2"),
    )
    se = F.col("se1") + F.col("se2")
    return v.select(
        F.col("n1").cast("long").alias("n_view"),
        F.col("n2").cast("long").alias("n_purchase"),
        (F.round(F.col("m1") - F.col("m2"), 6) + F.lit(0.0)).alias("mean_diff"),
        (
            F.round((F.col("m1") - F.col("m2")) / F.sqrt(se), 6) + F.lit(0.0)
        ).alias("t_stat"),
        (
            F.round(
                se * se
                / (
                    F.col("se1") * F.col("se1") / (F.col("n1") - 1)
                    + F.col("se2") * F.col("se2") / (F.col("n2") - 1)
                ),
                2,
            )
            + F.lit(0.0)
        ).alias("welch_df"),
    )


@query(
    "agg_regression",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(date_diff('day', DATE '{_EPOCH}', ts)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
               / 10000.0 AS sy,
             CAST(SUM(date_diff('day', DATE '{_EPOCH}', ts)
                      * date_diff('day', DATE '{_EPOCH}', ts)) AS DOUBLE)
               AS sxx,
             CAST(SUM(date_diff('day', DATE '{_EPOCH}', ts)
                      * CAST(FLOOR(value * 10000 + 0.5) AS BIGINT))
                  AS DOUBLE) / 10000.0 AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0
             AS slope_per_day,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) + 0.0 AS intercept
    FROM s
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares trend (value vs day index): slope and
    intercept per event_type — the drift line behind every metrics
    dashboard, computed from exact integer component sums rather than
    the built-in ``regr_slope`` (whose float accumulation order, and
    therefore last ulp, depends on partitioning).

    x is the integer day index (day² sums stay far inside int64 —
    centering/rescaling is the fix if x were epoch seconds), y is the
    4-decimal value in integer units, so Σx, Σy, Σx², Σxy are all
    exact and shuffle-order independent; the closed-form slope and
    intercept evaluate in one pinned double order on both engines.
    One map-side-combined aggregate pass, |series| output rows."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    x = F.datediff(F.col("ts"), F.lit(_EPOCH))
    yu = F.floor(F.col("value") * 10000 + F.lit(0.5))
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        (F.sum(yu).cast("double") / 10000.0).alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        (F.sum(x.cast("long") * yu).cast("double") / 10000.0).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "event_type",
        n.cast("long").alias("n_events"),
        (F.round(slope, 6) + F.lit(0.0)).alias("slope_per_day"),
        (F.round((sy - slope * sx) / n, 6) + F.lit(0.0)).alias("intercept"),
    )


@query(
    "agg_chi_square",
    oracle=f"""
    WITH obs AS (
      SELECT event_type,
             date_diff('day', DATE '{_EPOCH}', ts) % 7 AS weekday,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, weekday, o,
             CAST(SUM(o) OVER (PARTITION BY event_type) AS DOUBLE) AS row_tot,
             CAST(SUM(o) OVER (PARTITION BY weekday) AS DOUBLE) AS col_tot,
             CAST(SUM(o) OVER () AS DOUBLE) AS n
      FROM obs
    ),
    cells AS (
      SELECT (o - row_tot * col_tot / n) * (o - row_tot * col_tot / n)
             / (row_tot * col_tot / n) AS term,
             event_type, weekday
      FROM m
    )
    SELECT CAST(COUNT(DISTINCT event_type) AS INT) AS n_rows_dim,
           CAST(COUNT(DISTINCT weekday) AS INT) AS n_cols_dim,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT weekday) - 1) AS INT) AS dof,
           ROUND(CAST(SUM(CAST(FLOOR(term * 1000000 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1000000.0, 4) + 0.0 AS chi_square
    FROM cells
    """,
)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test on the event_type × weekday
    contingency table — 'does activity mix shift by day of week', the
    categorical counterpart to ``ext_ab_ttest``.

    All observed and marginal counts are exact integers from ONE
    aggregate plus window marginals over the contingency table
    (|types| × 7 rows — the windows run on the tiny rollup, never the
    events). Each cell's (o−e)²/e term evaluates in pinned double
    order and is quantized to integer micro-units BEFORE the final
    sum, so the statistic is order-insensitive and hash-portable
    (same discipline as the surprisal keys). At 100 TB the only
    full-data pass is the contingency aggregate with map-side
    combine."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    weekday = F.datediff(F.col("ts"), F.lit(_EPOCH)) % 7
    obs = ev.groupBy(
        "event_type", weekday.alias("weekday")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = obs.select(
        "event_type",
        "weekday",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).cast("double").alias("row_tot"),
        F.sum("o").over(Window.partitionBy("weekday")).cast("double").alias("col_tot"),
        F.sum("o").over(
            Window.partitionBy()
        ).cast("double").alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    cells = m.select(
        "event_type", "weekday", F.floor(term * 1000000 + F.lit(0.5)).alias("tm")
    )
    return cells.agg(
        F.countDistinct("event_type").cast("int").alias("n_rows_dim"),
        F.countDistinct("weekday").cast("int").alias("n_cols_dim"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("weekday") - 1)
        ).cast("int").alias("dof"),
        (
            F.round(F.sum("tm").cast("double") / 1000000.0, 4) + F.lit(0.0)
        ).alias("chi_square"),
    )


@query(
    "win_cumulative_reach",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             date_diff('day', DATE '{_EPOCH}', ts) AS day, user_id
      FROM events
    ),
    daily AS (
      SELECT event_type, day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS day_users,
             list(DISTINCT user_id) AS us
      FROM d GROUP BY 1, 2
    )
    SELECT event_type, CAST(day AS INT) AS day, day_users,
           CAST(len(list_distinct(flatten(list(us) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))))
             AS BIGINT) AS cumulative_reach
    FROM daily
    """,
)
def win_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative reach: per event_type per day, how many DISTINCT
    users have been seen so far — the marketing/growth curve that a
    plain running COUNT cannot produce (users repeat across days, so
    the daily counts don't sum). Expressed as a per-day distinct-set
    rollup plus a set-union window: collect_set per day, then
    flatten + array_distinct over the unbounded-preceding frame.

    Scale honesty: the carried set is bounded by the true user
    universe per series (the reach itself), NOT by event volume — the
    union window is exact and fine while reach ≤ ~1e6 per series; for
    internet-scale reach swap the exact set for the mergeable HLL
    sketches of ``agg_hll_mergeable`` (same rollup shape, fixed
    sketch size, ~1% error). The daily rollup keeps the window input
    at series × days rows, never event-sized."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    d = ev.select(
        "event_type",
        F.datediff(F.col("ts"), F.lit(_EPOCH)).alias("day"),
        "user_id",
    )
    daily = d.groupBy("event_type", "day").agg(
        F.countDistinct("user_id").alias("day_users"),
        F.collect_set("user_id").alias("us"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "event_type",
        F.col("day").cast("int").alias("day"),
        "day_users",
        F.size(
            F.array_distinct(F.flatten(F.collect_list("us").over(w)))
        ).cast("long").alias("cumulative_reach"),
    )


@query(
    "agg_market_basket",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
             FROM b GROUP BY 1),
    tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
            FROM b),
    pairs AS (
      SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM b x JOIN b y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    )
    SELECT p.part_a, p.part_b, p.support,
           (p.support * t.n_orders * 1000000) // (ia.n_item * ib.n_item)
             AS lift_micro
    FROM pairs p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN tot t
    """,
)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought together in ≥3
    orders, with lift = P(a,b)/(P(a)·P(b)) in integer micro-units —
    association mining's support/lift readout, float-free end to end
    (one integer division per pair).

    Scale shape: pair generation is a WITHIN-ORDER self-join (orders
    are small, so candidate pairs are Σ|basket|² — linear-ish in
    orders, never the catastrophic parts × parts cross join), with
    map-side combine on (a, b) before the shuffle. Item counts and
    the order total are item-/1-row-sized broadcast relations. The
    support floor prunes the long tail of singleton pairs BEFORE the
    lift join, the same discipline as every frequent-itemset miner's
    first Apriori pass."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    b = li.select("l_orderkey", "l_partkey").distinct().cache()
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    tot = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    x = b.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    y = b.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        x.join(y, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("na")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("nb")
    )
    return (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "support",
            F.expr(
                "(support * n_orders * 1000000) div (na * nb)"
            ).alias("lift_micro"),
        )
    )


@query(
    "ext_feature_pit_assembly",
    oracle="""
    WITH feat AS (
      SELECT event_id, user_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN value END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_value,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS clicks_before,
             epoch_us(ts)
               - MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS micros_since_signup
      FROM events
    )
    SELECT event_id, user_id, value AS purchase_value,
           last_view_value,
           CAST(COALESCE(clicks_before, 0) AS BIGINT) AS clicks_before,
           micros_since_signup
    FROM feat WHERE event_type = 'purchase'
    """,
)
def ext_feature_pit_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature assembly — the feature-store join that
    builds leakage-free training examples: for every purchase event,
    attach features computed ONLY from that user's strictly-earlier
    events (most recent prior view value, clicks so far, microseconds
    since signup). Off-by-one here is the classic train/serve-skew
    bug; the strictly-preceding frame (UNBOUNDED PRECEDING AND 1
    PRECEDING) makes "no peeking at the label row or the future" a
    property of the frame, not of discipline.

    Scale shape: ONE window pass over (user, time) computes ALL
    features — no per-feature as-of join cascade (N features would
    otherwise mean N sorted merge passes); one shuffle on user_id,
    per-user work linear in that user's history. At 100 TB this is
    the assembly pattern feature stores compile to; add features by
    adding window columns, not joins.

    Exactness: the view value passes through unchanged (stored
    4-decimal double); click counts are integers; the signup delta is
    exact integer microseconds (unix_micros vs DuckDB epoch_us over
    the same NTZ-as-UTC convention pinned by session.py). Users with
    no prior signup/view yield NULLs on both engines; tie order is
    (ts, event_id)-deterministic.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    feat = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") == "view", F.col("value")), ignorenulls=True
        )
        .over(w)
        .alias("last_view_value"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w)
        .alias("clicks_before"),
        (
            us
            - F.min(F.when(F.col("event_type") == "signup", us)).over(w)
        ).alias("micros_since_signup"),
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("value").alias("purchase_value"),
        "last_view_value",
        F.coalesce(F.col("clicks_before"), F.lit(0)).alias("clicks_before"),
        "micros_since_signup",
    )


@query(
    "ext_attribution_last_touch",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'click'
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
             END AS click_k,
             CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
      FROM events
    ),
    pit AS (
      SELECT user_id, ts, event_id, event_type, value,
             LAST_VALUE(click_k IGNORE NULLS) OVER w AS last_k,
             LAST_VALUE(click_us IGNORE NULLS) OVER w AS last_click_us,
             epoch_us(ts) AS us
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN last_click_us IS NOT NULL
                 AND us - last_click_us <= 86400000000
                THEN last_k END AS campaign,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS attributed_revenue
    FROM pit
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def ext_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase's revenue is credited to
    the campaign (the ``k`` field of the click's JSON props) of that
    user's most recent click within the preceding 24 hours — the
    default attribution model of every marketing-analytics stack.
    Purchases with no qualifying click fall into the NULL (direct)
    bucket rather than disappearing, so the revenue total is
    conserved across the report.

    Composition: JSON field extraction (the ``fn_json`` surface), a
    strictly-preceding PIT window carrying both the campaign and its
    click time (the ``ext_feature_pit_assembly`` frame — attribution
    IS a point-in-time feature), the 24 h recency test in exact
    integer microseconds, and an integer-unit revenue rollup at
    campaign grain.

    Scale shape: one shuffle on user_id for the window, then a
    campaign-cardinality aggregate with map-side combine. No
    self-join of purchases to clicks (the naive form shuffles events
    twice and double-counts multi-click users); the window is the
    single-pass formulation.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.col("event_type") == "click",
            F.get_json_object("props", "$.k").cast("long"),
        ).alias("click_k"),
        F.when(F.col("event_type") == "click", us).alias("click_us"),
        us.alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pit = base.select(
        "event_type",
        "value",
        "us",
        F.last("click_k", ignorenulls=True).over(w).alias("last_k"),
        F.last("click_us", ignorenulls=True).over(w).alias("last_click_us"),
    )
    day_us = 86_400_000_000
    campaign = F.when(
        F.col("last_click_us").isNotNull()
        & ((F.col("us") - F.col("last_click_us")) <= day_us),
        F.col("last_k"),
    )
    return (
        pit.filter(F.col("event_type") == "purchase")
        .groupBy(campaign.alias("campaign"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("value", 4).alias("attributed_revenue"),
        )
    )


@query(
    "win_ohlc_bars",
    oracle="""
    SELECT user_id, date_trunc('hour', ts) AS bar,
           arg_min(value, ts) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ts) AS close,
           COUNT(*) AS n_obs
    FROM events
    GROUP BY user_id, date_trunc('hour', ts)
    """,
)
def win_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: each user's value series resampled to hourly
    open/high/low/close candles — the compaction every monitoring and
    market-data pipeline applies before charting or downsampled
    storage (the raw series is too dense to keep hot; the candle
    preserves the shape). open/close are SELECTED source values
    (min_by/max_by on event time — no arithmetic, so exactness is
    free), high/low are plain extremes.

    Determinism: the fixture guarantees (user_id, ts) uniqueness, so
    the time-arg selection has no ties within a bar; per-series bars
    are the realistic grain anyway (a global bar would mix every
    series' values). At 100 TB this is one map-side-combinable
    aggregate — min_by/max_by carry (value, ts) pairs as mergeable
    accumulator state, so the candle compaction runs in the scan
    stage, the classic pre-aggregation before windowed charting.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bar"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


@query(
    "agg_ltv_cohort",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey,
             MIN(EXTRACT(year FROM o_orderdate) * 12
                 + EXTRACT(month FROM o_orderdate)) AS cohort_m
      FROM orders GROUP BY o_custkey
    ),
    aged AS (
      SELECT f.cohort_m,
             (EXTRACT(year FROM o.o_orderdate) * 12
              + EXTRACT(month FROM o.o_orderdate)) - f.cohort_m AS age_m,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
    ),
    by_age AS (
      SELECT cohort_m, age_m, SUM(cents) AS cents
      FROM aged GROUP BY cohort_m, age_m
    )
    SELECT CAST(cohort_m AS INT) AS cohort_m,
           CAST(age_m AS INT) AS age_m,
           CAST(SUM(cents) OVER (PARTITION BY cohort_m ORDER BY age_m
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / 100.0 AS cum_revenue
    FROM by_age
    """,
)
def agg_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by their FIRST
    order month, revenue accumulated by months-since-first — the
    growth-analytics table behind "how much is a January-acquired
    customer worth by month 6?" and payback-period decisions.
    ``agg_retention_cohort`` counts who comes back; this accumulates
    what they spend — the two views every cohort dashboard pairs.

    Exactness: cohort and age are pure integer month indices
    (year×12+month — no date-diff rounding conventions to reconcile
    across engines); revenue accumulates in integer cents; the
    running sum is a window over the (cohort, age)-grain AGGREGATE,
    so the window input is tiny (cohorts × ages) regardless of fact
    size — same window-over-aggregate discipline as win_yoy_growth.

    Scale shape: one fact pass for first-order months (min-aggregate,
    map-side combined), a broadcast join back (customer-grain
    relation), one (cohort, age) aggregate, then the small window.
    """
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    month_idx = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast(
        "long"
    )
    first = (
        o.groupBy("o_custkey")
        .agg(F.min(month_idx).alias("cohort_m"))
    )
    aged = (
        o.join(F.broadcast(first), "o_custkey")
        .select(
            "cohort_m",
            (month_idx - F.col("cohort_m")).alias("age_m"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    by_age = aged.groupBy("cohort_m", "age_m").agg(F.sum("cents").alias("cents"))
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return by_age.select(
        F.col("cohort_m").cast("int").alias("cohort_m"),
        F.col("age_m").cast("int").alias("age_m"),
        (F.sum("cents").over(w).cast("double") / F.lit(100.0)).alias(
            "cum_revenue"
        ),
    )


@query(
    "ext_churn_label",
    oracle="""
    WITH act AS (
      SELECT user_id,
             MAX(CASE WHEN ts < TIMESTAMP '2024-01-24 00:00:00'
                      THEN epoch_us(ts) END) AS last_before_us,
             COUNT(CASE WHEN ts < TIMESTAMP '2024-01-24 00:00:00'
                        THEN 1 END) AS n_before,
             COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-24 00:00:00'
                        THEN 1 END) AS n_after
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_before,
           epoch_us(TIMESTAMP '2024-01-24 00:00:00') - last_before_us
             AS idle_us_at_cutoff,
           n_after = 0 AS churned
    FROM act
    WHERE n_before > 0
    """,
)
def ext_churn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time churn LABEL construction — the supervised-label
    half of the training-example assembly that
    ``ext_feature_pit_assembly`` builds features for: a user active
    before the cutoff is labeled churned iff they have NO activity in
    the post-cutoff observation window. The cutoff discipline is the
    leakage control: every feature (activity count, idleness at
    cutoff) derives strictly from BEFORE the cutoff; only the label
    looks after it. Mixing those windows is the most common silent
    leak in churn models.

    One pass over events builds both windows' aggregates
    (conditional aggregation — no self-join of before vs after);
    idleness is exact integer microseconds; users who first appear
    after the cutoff are excluded (nothing to predict from).
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cutoff = F.lit("2024-01-24 00:00:00").cast("timestamp")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cutoff_us = F.unix_micros(cutoff)
    act = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("ts") < cutoff, us)).alias("last_before_us"),
        F.count(F.when(F.col("ts") < cutoff, 1)).alias("n_before"),
        F.count(F.when(F.col("ts") >= cutoff, 1)).alias("n_after"),
    )
    return act.filter(F.col("n_before") > 0).select(
        "user_id",
        "n_before",
        (cutoff_us - F.col("last_before_us")).alias("idle_us_at_cutoff"),
        (F.col("n_after") == 0).alias("churned"),
    )


@query(
    "agg_time_to_convert",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, epoch_us(ts) AS us,
             MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id) AS signup_us
      FROM events
    ),
    conv AS (
      SELECT user_id, MIN(signup_us) AS signup_us,
             MIN(CASE WHEN event_type = 'purchase' AND us >= signup_us
                      THEN us END) AS first_purchase_us
      FROM marked WHERE signup_us IS NOT NULL
      GROUP BY user_id
    ),
    durs AS (
      SELECT first_purchase_us - signup_us AS dur_us FROM conv
      WHERE first_purchase_us IS NOT NULL
    ),
    ranked AS (
      SELECT dur_us,
             ROW_NUMBER() OVER (ORDER BY dur_us) AS rn,
             COUNT(*) OVER () AS n
      FROM durs
    )
    SELECT (SELECT COUNT(*) FROM conv) AS n_signup_users,
           (SELECT COUNT(*) FROM durs) AS n_converted,
           (SELECT COUNT(*) FROM durs) * 1000000
             // (SELECT COUNT(*) FROM conv) AS conv_rate_micro,
           MAX(CASE WHEN rn = (n + 3) // 4 THEN dur_us END) AS p25_us,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN dur_us END) AS p50_us,
           MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN dur_us END) AS p75_us
    FROM ranked
    """,
)
def agg_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: how long users take from SIGNUP to their first
    subsequent PURCHASE — conversion rate plus the exact quartiles of
    the delay distribution, the activation metric every funnel review
    opens with. The correlation subtlety: the qualifying purchase must
    follow THAT USER'S signup, so the signup time rides a per-user
    window onto every row before the conditional min — no per-user
    subquery, no self-join of signups to purchases.

    Exactness end to end: integer-microsecond durations, nearest-rank
    quartiles in pure integer rank arithmetic (the
    ``agg_percentile_exact`` convention — both engines select the
    identical source duration), and the conversion rate in integer
    micro-units via floor division. Never-converting signups stay in
    the denominator and out of the quartiles on both engines.

    Scale shape: one user-partitioned window + per-user aggregate;
    the quartile ranking runs over the CONVERTED-USER relation (users,
    not events) — at extreme user counts swap in the KLL sketch keys;
    this is the exact auditor.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wu = Window.partitionBy("user_id")
    marked = ev.select(
        "user_id",
        "event_type",
        us.alias("us"),
        F.min(F.when(F.col("event_type") == "signup", us)).over(wu).alias(
            "signup_us"
        ),
    )
    conv = (
        marked.filter(F.col("signup_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("signup_us").alias("signup_us"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") >= F.col("signup_us")),
                    F.col("us"),
                )
            ).alias("first_purchase_us"),
        )
    )
    durs = conv.filter(F.col("first_purchase_us").isNotNull()).select(
        (F.col("first_purchase_us") - F.col("signup_us")).alias("dur_us")
    )
    w = Window.orderBy("dur_us")
    wall = Window.partitionBy()
    ranked = durs.select(
        "dur_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    n_signup = conv.agg(F.count(F.lit(1)).alias("ns"))
    n_conv = durs.agg(F.count(F.lit(1)).alias("nc"))
    q = ranked.agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("dur_us"))
        ).alias("p25_us"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("dur_us"))
        ).alias("p50_us"),
        F.max(
            F.when(F.col("rn") == F.expr("(3 * n + 3) DIV 4"), F.col("dur_us"))
        ).alias("p75_us"),
    )
    return (
        n_signup.crossJoin(n_conv)
        .crossJoin(q)
        .select(
            F.col("ns").alias("n_signup_users"),
            F.col("nc").alias("n_converted"),
            F.expr("nc * 1000000 DIV ns").alias("conv_rate_micro"),
            "p25_us",
            "p50_us",
            "p75_us",
        )
    )


@query(
    "agg_seasonality_profile",
    oracle="""
    SELECT CAST(isodow(ts) AS INT) AS iso_dow,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS val_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonality profile: event volume and value by
    (ISO day-of-week, hour) — the 7×24 load grid behind capacity
    planning, anomaly baselines ("is Tuesday 3 am unusually busy?"),
    and traffic-shaped batch scheduling.

    The portability pin this key exists to document: engines DISAGREE
    on day-of-week numbering — Spark's ``dayofweek`` counts Sunday=1
    (so Monday=2) while DuckDB's counts Sunday=0 via ``dayofweek``
    and Monday=1 via ``isodow``. The only safe cross-engine convention
    is ISO (Monday=1..Sunday=7): Spark ``weekday()+1`` ==
    DuckDB ``isodow()``, pinned here by the value hash — a naive
    ``dayofweek`` on both sides would rotate the whole profile by a
    day and STILL look plausible on a dashboard.

    One scan, 168-group map-side-combined aggregate; integer-unit
    value sums.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(
            (F.weekday(F.col("ts").cast("timestamp")) + 1)
            .cast("int")
            .alias("iso_dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 4).alias("val_sum"),
        )
    )


# CUSUM parameters in integer 1e-4 value units: allowance K ~ 0.5 sigma
# of the fixture's value distribution (sd ~ 50), alarm threshold H ~ 5
# sigma -- the standard (k, h) = (sigma/2, 5*sigma) tuning.
_CUSUM_K = 250_000
_CUSUM_H = 2_500_000


@query(
    "ext_ts_cusum",
    oracle=f"""
    WITH u AS (
      SELECT event_id, event_type, ts,
             CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS x
      FROM events
    ),
    st AS (
      SELECT event_id, event_type, ts, x,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS su,
             CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS px,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS BIGINT) AS i
      FROM u
    ),
    p AS (
      SELECT event_id, event_type, ts, n,
             px * n - i * su - i * {_CUSUM_K} * n AS pi
      FROM st
    ),
    s AS (
      SELECT event_id, event_type, n,
             CAST(pi - LEAST(CAST(0 AS BIGINT),
                             MIN(pi) OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING))
                  AS BIGINT) AS sc
      FROM p
    )
    SELECT event_id, event_type,
           ROUND(CAST(sc AS DOUBLE) / (n * 10000.0), 4) + 0.0 AS cusum,
           (sc > {_CUSUM_H} * n) AS is_alarm
    FROM s
    """,
)
def ext_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event series — the control-
    chart statistic (Page 1954) that flags a SUSTAINED upward shift in
    a metric's level, where the 3σ point test (``ext_ts_anomaly``)
    only sees single outliers: S_i = max(0, S_{i-1} + x_i − μ − K)
    accumulates small drifts until they cross the alarm threshold H.

    The recurrence looks inherently sequential (each S_i needs
    S_{i-1}), which is what usually exiles CUSUM to a stateful UDF.
    It is not: S_i = P_i − min_{j≤i} P_j where P is the plain prefix
    sum of (x_i − μ − K) — the same identity that turns maximum
    drawdown into two windows. Two exact window passes per series
    (prefix sum, running min), zero Python.

    Exactness: everything is multiplied through by the series count n
    (P_i·n = px·n − i·su − i·K·n with px the integer prefix sum), so
    the reference mean μ = su/n never materializes as a float; the
    alarm is the pure integer inequality sc > H·n, and the reported
    cusum closes with ONE double division on the shared 1e-4 grid.
    Overflow bound: |px·n| < n²·x̄ — at 1e-4 units and this value
    scale that is ~2e16 at sf0.1 and crosses int64 near per-series
    n ≈ 3e6 (where DuckDB silently HUGEINT-widens while Spark wraps —
    the one-sided divergence class from the r4 agg_corr fix); past
    that, cut over to decimal(38) prefix sums, or chunk series.

    Scale shape: one shuffle clusters each series; both window passes
    are O(1)-state running aggregates over it. Streaming form: the
    raw recurrence IS the transformWithState loop (one long + one min
    per key); this batch form is its backfill auditor.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    u = ev.select(
        "event_id",
        "event_type",
        "ts",
        F.floor(F.col("value") * 10000 + F.lit(0.5)).alias("x"),
    )
    w_all = Window.partitionBy("event_type")
    w_pre = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    st = u.select(
        "event_id",
        "event_type",
        "ts",
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("x").over(w_all).alias("su"),
        F.sum("x").over(w_pre).alias("px"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("ts", "event_id")
        ).cast("long").alias("i"),
    )
    p = st.select(
        "event_id",
        "event_type",
        "ts",
        "n",
        (
            F.col("px") * F.col("n")
            - F.col("i") * F.col("su")
            - F.col("i") * F.lit(_CUSUM_K) * F.col("n")
        ).alias("pi"),
    )
    w_min = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the running min must include the empty prefix P_0 = 0 (else the
    # first element of every series reads S_1 = 0 instead of max(0, t_1))
    s = p.select(
        "event_id",
        "event_type",
        "n",
        (
            F.col("pi")
            - F.least(F.lit(0).cast("long"), F.min("pi").over(w_min))
        ).alias("sc"),
    )
    return s.select(
        "event_id",
        "event_type",
        (
            F.round(F.col("sc").cast("double") / (F.col("n") * 10000.0), 4)
            + F.lit(0.0)
        ).alias("cusum"),
        (F.col("sc") > F.lit(_CUSUM_H) * F.col("n")).alias("is_alarm"),
    )


@query(
    "agg_markov_transitions",
    oracle="""
    WITH t AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM t WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_trans,
           ROUND(CAST(n_trans AS DOUBLE)
                 / SUM(n_trans) OVER (PARTITION BY from_type), 6) + 0.0
             AS p
    FROM c
    """,
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (from, to) event-type pair, how often a
    user's next action follows — the empirical behavior model behind
    next-action prediction, funnel leak diagnosis, and session
    simulation (``ext_event_pattern`` matches one fixed pattern; this
    is the full conditional distribution).

    Shape: one LEAD window per user (the series shuffle every
    sequence op pays), then an aggregate to |types|² rows; the row
    probability divides by the from-state total via a window over
    that domain-sized relation — never corpus-sized. The final
    division is the single double op, on the shared 1e-6 grid.

    100 TB: transition counting is a map-side-combinable aggregate
    after the per-user sort; second-order chains just widen the key
    to (prev2, prev, next) — same two stages.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = t.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n_trans"))
    w_from = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n_trans",
        (
            F.round(
                F.col("n_trans").cast("double")
                / F.sum("n_trans").over(w_from),
                6,
            )
            + F.lit(0.0)
        ).alias("p"),
    )


@query(
    "ext_ts_decompose",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, hr, y,
             CAST((SUM(y) OVER w * 1000) // COUNT(*) OVER w AS BIGINT)
               AS trend_milli
      FROM h
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
    ),
    d AS (
      SELECT event_type, hr, y, trend_milli,
             y * 1000 - trend_milli AS det_milli,
             CAST(hour(hr) AS INT) AS hod
      FROM t
    ),
    s AS (
      -- det sums go negative and DuckDB // floors while Spark DIV
      -- truncates: shift by a large offset so the numerator is
      -- positive and the two agree, then shift back
      SELECT event_type, hod,
             CAST((SUM(det_milli) + 1000000000 * COUNT(*)) // COUNT(*)
                  - 1000000000 AS BIGINT) AS seasonal_milli
      FROM d GROUP BY 1, 2
    )
    SELECT d.event_type, d.hr, d.y, d.trend_milli, s.seasonal_milli,
           CAST(d.det_milli - s.seasonal_milli AS BIGINT) AS resid_milli
    FROM d JOIN s ON s.event_type = d.event_type AND s.hod = d.hod
    """,
)
def ext_ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical time-series decomposition per event series: hourly
    volume split into trend + daily seasonal + residual — the triage
    view every metrics pipeline builds before alerting (is the spike
    drift, time-of-day, or genuinely anomalous?), and the input
    representation forecasting models consume.

    Construction (additive decomposition, all INTEGER milli-units):
    trend = centered 24-hour moving average of the hourly counts
    (integer-division mean — deterministic, no float mean anywhere);
    seasonal = per (series, hour-of-day) mean of the detrended
    series; residual = detrended − seasonal. ``hour()`` agrees
    between engines on the fixture's naive timestamps (unlike
    day-of-week numbering — the agg_seasonality_profile lesson).

    Assumes a dense hourly series (the fixture's event volume fills
    every hour); for sparse series compose with ``ext_ts_resample``'s
    time spine first, or the centered window spans non-contiguous
    hours. Edge hours use the shrunk frame both engines share.

    Scale shape: one aggregate to series×hours (map-side combine),
    one bounded-frame window per series (O(1) ring-buffer state), one
    domain-sized (series × 24) aggregate broadcast back. Nothing
    corpus-sized past the first aggregate. The iterative STL variant
    (loess loops) is deliberately NOT this key: classical
    decomposition is closed-form, exact, and covers the triage use.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("y"))
    # integer-division mean without float: (sum*1000) DIV count
    t = h.withColumn(
        "trend_milli",
        F.expr("(sum(y) OVER (PARTITION BY event_type ORDER BY hr "
               "ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) * 1000) DIV "
               "count(*) OVER (PARTITION BY event_type ORDER BY hr "
               "ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)"),
    )
    d = t.select(
        "event_type",
        "hr",
        "y",
        "trend_milli",
        (F.col("y") * 1000 - F.col("trend_milli")).alias("det_milli"),
        F.hour("hr").cast("int").alias("hod"),
    )
    # det sums go negative and Spark DIV truncates while DuckDB //
    # floors: shift by a large offset so the numerator is positive and
    # the two agree, then shift back
    s = d.groupBy("event_type", "hod").agg(
        F.expr(
            "(sum(det_milli) + 1000000000 * count(*)) DIV count(*)"
            " - 1000000000"
        ).alias("seasonal_milli")
    )
    return (
        d.join(s, ["event_type", "hod"])
        .select(
            "event_type",
            "hr",
            "y",
            "trend_milli",
            "seasonal_milli",
            (F.col("det_milli") - F.col("seasonal_milli")).alias("resid_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Holt's linear-trend smoothing: sequential recursion as an
# order-pinned fold.

HOLT_ALPHA = 0.3  # level smoothing
HOLT_BETA = 0.1   # trend smoothing

# Shared by ext_ts_holt and the streaming leg (stream_ts_holt): both
# must converge to the same final per-series state, so they replay
# against the same recursive-CTE oracle.
HOLT_ORACLE_SQL = f"""
    WITH RECURSIVE seq AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS t,
             value AS x
      FROM events
    ),
    nper AS (SELECT user_id, MAX(t) AS n_obs FROM seq GROUP BY user_id),
    init AS (
      SELECT a.user_id, CAST(2 AS BIGINT) AS t,
             b.x AS l, b.x - a.x AS b
      FROM seq a JOIN seq b
        ON a.user_id = b.user_id AND a.t = 1 AND b.t = 2
    ),
    rec AS (
      SELECT * FROM init
      UNION ALL
      SELECT r.user_id, r.t + 1,
             {HOLT_ALPHA} * v.x + {1 - HOLT_ALPHA} * (r.l + r.b) AS l,
             {HOLT_BETA} * (({HOLT_ALPHA} * v.x
                             + {1 - HOLT_ALPHA} * (r.l + r.b)) - r.l)
               + {1 - HOLT_BETA} * r.b AS b
      FROM rec r JOIN seq v
        ON v.user_id = r.user_id AND v.t = r.t + 1
    )
    SELECT r.user_id, nper.n_obs,
           ROUND(r.l, 6) + 0.0 AS level,
           ROUND(r.b, 6) + 0.0 AS trend,
           ROUND(r.l + r.b, 6) + 0.0 AS forecast
    FROM rec r JOIN nper ON nper.user_id = r.user_id AND r.t = nper.n_obs
    """


@query("ext_ts_holt", oracle=HOLT_ORACLE_SQL)
def ext_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per series:
    ``l_t = a*x_t + (1-a)*(l+b)``, ``b_t = B*(l_t - l) + (1-B)*b``,
    init ``l_2 = x_2, b_2 = x_2 - x_1`` — the classic coupled
    recursion behind short-horizon forecasting, emitting each user's
    final level/trend state and one-step forecast.

    Portability: a sequential recursion has no closed form the
    ``win_ewma`` truncation trick covers (level and trend are mutually
    recursive), so the contract is an ORDER-PINNED FOLD: Spark runs
    ``F.aggregate`` left-to-right over the (ts, event_id)-sorted value
    array with a struct accumulator; the oracle replays the identical
    IEEE-754 op sequence via a recursive CTE (one iteration per step,
    all series advancing in lockstep). Same doubles, same op order →
    bit-identical states, so ROUND(.,6) is collision-free. (A DuckDB
    ``list_reduce`` struct fold would be shorter but its 1.0.0
    evaluation updates accumulator fields SEQUENTIALLY within a step —
    later fields see already-updated earlier fields — so the recursive
    CTE, whose semantics are standard SQL, is the replay vehicle.)

    Scale shape: one groupBy(user) building each series' value array
    (map-side partial collect, one shuffle keyed by series), then the
    fold runs map-side per row — state is O(1) per series and NOTHING
    iterates driver-side; 10^9 series parallelize as ordinary rows. A
    series too long for one array (not the case here: <=99 points)
    folds incrementally batch-over-batch exactly like
    ``stream_incremental_agg`` carries state.

    Reference parity: north-star extension beyond the reference's SQL
    entry (src/sparkSQL/SparkSQLOperator.java:17-23), per SURVEY §2.F.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    per = ev.groupBy("user_id").agg(xs.alias("xs"))
    x1 = F.element_at("xs", 1)
    x2 = F.element_at("xs", 2)
    acc0 = F.struct(x2.alias("l"), (x2 - x1).alias("b"))
    a, b_ = F.lit(HOLT_ALPHA), F.lit(HOLT_BETA)

    def step(acc, x):
        l_new = a * x + F.lit(1 - HOLT_ALPHA) * (acc["l"] + acc["b"])
        b_new = b_ * (l_new - acc["l"]) + F.lit(1 - HOLT_BETA) * acc["b"]
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    n = F.size("xs")
    fitted = per.select(
        "user_id",
        n.cast("long").alias("n_obs"),
        F.aggregate(F.slice("xs", 3, n - 2), acc0, step).alias("st"),
    )
    rnd = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return fitted.select(
        "user_id",
        "n_obs",
        rnd(F.col("st.l")).alias("level"),
        rnd(F.col("st.b")).alias("trend"),
        rnd(F.col("st.l") + F.col("st.b")).alias("forecast"),
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing: the triple recursion
# (level, trend, m-slot seasonal queue) as an order-pinned fold.

HW_ALPHA = 0.3   # level smoothing
HW_BETA = 0.1    # trend smoothing
HW_GAMMA = 0.2   # seasonal smoothing
HW_PERIOD = 4    # pinned season length (every fixture series has >= 45 obs)

# The inline l_t expression, reused inside b_t and s_t exactly as the
# Spark fold recomputes it (same tree -> same double).
_HW_L = (
    f"{HW_ALPHA} * (v.x - r.seas[1]) + {1 - HW_ALPHA} * (r.l + r.b)"
)

# Init terms derived from HW_PERIOD in BOTH engines (no frozen 4/16
# literals): l = mean of the first period, b = the classic two-period
# trend estimate, s_i = x_i - l.
_HW_L0 = (
    "(" + " + ".join(f"xs[{i}]" for i in range(1, HW_PERIOD + 1))
    + f") / {HW_PERIOD}"
)
_HW_B0 = (
    "(" + " + ".join(
        f"(xs[{HW_PERIOD + i}] - xs[{i}])" for i in range(1, HW_PERIOD + 1)
    )
    + f") / {HW_PERIOD * HW_PERIOD}"
)
_HW_SEAS0 = (
    "[" + ", ".join(f"xs[{i}] - l" for i in range(1, HW_PERIOD + 1)) + "]"
)

HW_ORACLE_SQL = f"""
    WITH RECURSIVE seq AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS t,
             value AS x
      FROM events
    ),
    arr AS (
      SELECT user_id, list(x ORDER BY t) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM seq GROUP BY user_id
    ),
    lb AS (
      SELECT user_id, n_obs, xs,
             {_HW_L0} AS l,
             {_HW_B0} AS b
      FROM arr
    ),
    init AS (
      SELECT user_id, CAST({HW_PERIOD} AS BIGINT) AS t, l, b,
             {_HW_SEAS0} AS seas
      FROM lb
    ),
    rec AS (
      SELECT * FROM init
      UNION ALL
      SELECT r.user_id, r.t + 1,
             {_HW_L} AS l,
             {HW_BETA} * (({_HW_L}) - r.l) + {1 - HW_BETA} * r.b AS b,
             r.seas[2:]
               || [{HW_GAMMA} * (v.x - ({_HW_L}))
                   + {1 - HW_GAMMA} * r.seas[1]] AS seas
      FROM rec r JOIN seq v
        ON v.user_id = r.user_id AND v.t = r.t + 1
    )
    SELECT r.user_id, a.n_obs,
           ROUND(r.l, 6) + 0.0 AS level,
           ROUND(r.b, 6) + 0.0 AS trend,
           ROUND(r.seas[1], 6) + 0.0 AS seasonal_next,
           ROUND(r.l + r.b + r.seas[1], 6) + 0.0 AS forecast
    FROM rec r JOIN arr a
      ON a.user_id = r.user_id AND r.t = a.n_obs
    """


@query("ext_ts_holt_winters", oracle=HW_ORACLE_SQL)
def ext_ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive seasonal smoothing per series — the
    triple recursion extending ``ext_ts_holt`` with an m-slot seasonal
    queue: ``l_t = a*(x_t - s_{{t-m}}) + (1-a)*(l+b)``,
    ``b_t = B*(l_t - l) + (1-B)*b``,
    ``s_t = G*(x_t - l_t) + (1-G)*s_{{t-m}}``; init from the first two
    periods (``l = mean(x_1..x_m)``, ``b`` = the classic two-period
    trend estimate, ``s_i = x_i - l``), fold from ``t = m+1``. Emits
    each series' final level/trend, the next-step seasonal, and the
    one-step forecast ``l + b + s_{{n+1-m}}``.

    Portability: same ORDER-PINNED FOLD contract as ``ext_ts_holt``
    (see that docstring for why a recursive CTE, not a DuckDB
    ``list_reduce``, is the replay vehicle) — the accumulator here
    additionally carries the seasonal queue as an ``array<double>``
    rotated one slot per step (``slice(seas, 2, m-1) || [s_t]``), and
    the oracle's list state replays the identical rotation. The
    inline ``l_t`` expression is deliberately duplicated inside the
    ``b_t``/``s_t`` terms in BOTH engines (same tree, same doubles),
    so ROUND(.,6) is collision-free. ``HW_PERIOD`` is pinned at 4;
    the contract needs ``n >= 2m`` (every fixture series has >= 45
    obs at all sfs — documented bound, no filter).

    Scale shape: identical to ``ext_ts_holt`` — one shuffle keyed by
    series to build the sorted value array, then the fold is map-side
    with O(m) state per series; 10^9 series parallelize as rows.

    Reference parity: north-star extension beyond the reference's SQL
    entry (src/sparkSQL/SparkSQLOperator.java:17-23), per SURVEY §2.F.
    """
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    per = ev.groupBy("user_id").agg(xs.alias("xs"))
    e = lambda i: F.element_at("xs", i)  # noqa: E731
    m = HW_PERIOD
    # left-assoc sums, matching the oracle's parse of `a + b + c + ...`
    l0 = sum((e(i) for i in range(2, m + 1)), e(1)) / F.lit(m)
    b0 = sum(
        ((e(m + i) - e(i)) for i in range(2, m + 1)), e(m + 1) - e(1)
    ) / F.lit(m * m)
    acc0 = F.struct(
        l0.alias("l"),
        b0.alias("b"),
        F.array(*[e(i) - l0 for i in range(1, m + 1)]).alias("seas"),
    )
    a, b_, g = F.lit(HW_ALPHA), F.lit(HW_BETA), F.lit(HW_GAMMA)

    def step(acc, x):
        s_old = F.element_at(acc["seas"], 1)
        l_new = a * (x - s_old) + F.lit(1 - HW_ALPHA) * (acc["l"] + acc["b"])
        b_new = b_ * (l_new - acc["l"]) + F.lit(1 - HW_BETA) * acc["b"]
        s_new = g * (x - l_new) + F.lit(1 - HW_GAMMA) * s_old
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            F.concat(
                F.slice(acc["seas"], 2, HW_PERIOD - 1), F.array(s_new)
            ).alias("seas"),
        )

    n = F.size("xs")
    fitted = per.select(
        "user_id",
        n.cast("long").alias("n_obs"),
        F.aggregate(
            F.slice("xs", HW_PERIOD + 1, n - HW_PERIOD), acc0, step
        ).alias("st"),
    )
    rnd = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    s_next = F.element_at("st.seas", 1)
    return fitted.select(
        "user_id",
        "n_obs",
        rnd(F.col("st.l")).alias("level"),
        rnd(F.col("st.b")).alias("trend"),
        rnd(s_next).alias("seasonal_next"),
        rnd(F.col("st.l") + F.col("st.b") + s_next).alias("forecast"),
    )


# ---------------------------------------------------------------------------
# Shapley data-driven attribution: exact coalition values over
# sessionized journeys.

SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]
_SHAP_SCALE = 1_000_000


def _shapley_terms() -> list[tuple[str, int, str, str]]:
    """(channel, coef, with_key, without_key) for every subset S of
    the other channels: coef = |S|! * (k-1-|S|)! — the Shapley weight
    numerator over the common denominator k!."""
    from math import factorial

    k = len(SHAPLEY_CHANNELS)
    terms = []
    for ch in SHAPLEY_CHANNELS:
        rest = [c for c in SHAPLEY_CHANNELS if c != ch]
        for mask in range(2 ** len(rest)):
            s = [c for j, c in enumerate(rest) if mask >> j & 1]
            coef = factorial(len(s)) * factorial(k - 1 - len(s))
            terms.append(
                (ch, coef, ",".join(sorted(s + [ch])), ",".join(sorted(s)))
            )
    return terms


def _shapley_oracle() -> str:
    from math import factorial

    kfact = factorial(len(SHAPLEY_CHANNELS))

    def vref(key: str) -> str:
        return (
            f"COALESCE((SELECT v_micro FROM v WHERE setkey = '{key}'), 0)"
        )

    rows = []
    for ch in SHAPLEY_CHANNELS:
        acc = " + ".join(
            f"{coef} * ({vref(k1)} - {vref(k0)})"
            for c, coef, k1, k0 in _shapley_terms()
            if c == ch
        )
        rows.append(f"SELECT '{ch}' AS channel, CAST({acc} AS BIGINT) AS phi_scaled")
    union = "\n      UNION ALL ".join(rows)
    return f"""
    WITH gaps AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    ),
    j AS (
      SELECT user_id, sid,
             array_to_string(list_sort(list_distinct(
               list(event_type) FILTER (WHERE event_type != 'purchase'))),
               ',') AS setkey,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM sess GROUP BY user_id, sid
    ),
    v AS (
      SELECT setkey,
             (SUM(conv) * {_SHAP_SCALE}) // COUNT(*) AS v_micro
      FROM j WHERE setkey IS NOT NULL AND setkey != ''
      GROUP BY setkey
    ),
    phi AS ({union})
    SELECT channel, phi_scaled,
           ROUND(CAST(phi_scaled AS DOUBLE) / {kfact * _SHAP_SCALE}.0, 6)
             + 0.0 AS phi
    FROM phi
    """


@query("ext_attribution_shapley", oracle=_shapley_oracle())
def ext_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley data-driven attribution (the GA360 'data-driven' model;
    Shapley 1953 applied to channel coalitions): each channel's credit
    is its average marginal contribution to session conversion across
    all coalition orderings — phi_i = sum over subsets S of
    |S|!(k-1-|S|)!/k! * (v(S + i) - v(S)) with v(S) the conversion
    rate of sessions whose distinct channel set is exactly S.

    Semantics pinned for replay: sessions are the ``win_sessionize``
    lag-gap 30-minute windows; a session's journey is its distinct
    non-purchase event types; purchase-only sessions are excluded
    (direct conversions get no channel credit — standard for
    data-driven models) and unobserved coalitions take v = 0;
    v is an integer-micro conversion rate ((conv * 1e6) DIV cnt,
    non-negative so Spark DIV == DuckDB // == floor); phi_scaled sums
    integer coefficient-weighted deltas over the k! common
    denominator, and the closing division is ONE double division
    rounded in Spark (F.round half-up == DuckDB ROUND). The efficiency
    property sum(phi) = v(full) - v(empty) is pinned by pytest.

    Scale shape: one user-keyed shuffle for the session window, one
    (user, session)-grain aggregate, then the v relation is at most
    2^k rows — collected to the driver where the 2^(k-1) * k Shapley
    terms are exact integer arithmetic (k is the CHANNEL count, never
    data-sized; k=10 is 5k terms). Nothing pairwise in the data path.

    Reference parity: north-star extension beyond the reference's SQL
    entry (src/sparkSQL/SparkSQLOperator.java:17-23), per SURVEY §2.F.
    """
    from math import factorial

    from streamingdemo_spark.plans.windows import sessionized_events

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    sess = sessionized_events(ev).withColumnRenamed("session_id", "sid")
    j = sess.groupBy("user_id", "sid").agg(
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.collect_list(
                        F.when(
                            F.col("event_type") != "purchase",
                            F.col("event_type"),
                        )
                    )
                )
            ),
            ",",
        ).alias("setkey"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    v_rows = (
        j.filter(F.col("setkey") != "")
        .groupBy("setkey")
        .agg(
            F.expr(f"(SUM(conv) * {_SHAP_SCALE}) DIV COUNT(*)").alias(
                "v_micro"
            )
        )
        .collect()
    )
    v = {r["setkey"]: int(r["v_micro"]) for r in v_rows}
    phi: dict[str, int] = {c: 0 for c in SHAPLEY_CHANNELS}
    for ch, coef, k1, k0 in _shapley_terms():
        phi[ch] += coef * (v.get(k1, 0) - v.get(k0, 0))
    kfact = factorial(len(SHAPLEY_CHANNELS))
    out = spark.createDataFrame(
        [(c, phi[c]) for c in SHAPLEY_CHANNELS],
        "channel string, phi_scaled long",
    )
    return out.select(
        "channel",
        "phi_scaled",
        (
            F.round(
                F.col("phi_scaled").cast("double")
                / F.lit(float(kfact * _SHAP_SCALE)),
                6,
            )
            + F.lit(0.0)
        ).alias("phi"),
    )
