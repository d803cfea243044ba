"""Streaming operator keys (SURVEY.md §2.E).

``win_time_*`` run Spark's time-window aggregation in batch mode (the
same ``window()`` expression works on static DataFrames — Structured
Streaming's batch/stream unification) and therefore carry a DuckDB
oracle. ``stream_*`` keys execute real ``writeStream`` micro-batches
over the deterministic replay sources in ``sources.py`` and are
rows-only checked (plus stronger pytest assertions in
``tests/test_streaming.py``).

State-boundedness (the 100 TB rule): every stateful query bounds its
state — watermarks GC window/session state; the one deliberate
exception (``stream_dedup`` without watermark) is called out in its
docstring.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import dsum, osum, query
from streamingdemo_spark.streaming.runner import run_to_memory
from streamingdemo_spark.streaming.sources import events_stream


@query(
    "win_time_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS ws,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
           COUNT(*) AS n, {osum("value", 4)} AS val_sum
    FROM events GROUP BY 1, 2
    """,
)
def win_time_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate, batch mode."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", 4).alias("val_sum"))
        .select(
            F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n", "val_sum"
        )
    )


@query(
    "win_time_sliding",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS ws,
           COUNT(*) AS n, {osum("value", 4)} AS val_sum
    FROM events, generate_series(CAST(0 AS BIGINT), CAST(3 AS BIGINT)) AS g(k)
    GROUP BY 1
    """,
)
def win_time_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1 h window every 15 min, batch mode — each event lands in
    4 overlapping windows."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", 4).alias("val_sum"))
        .select(F.col("w.start").alias("ws"), "n", "val_sum")
    )


@query("stream_tumbling")  # rows-only: real micro-batched execution
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling aggregate executed as a real stream (complete mode);
    pytest asserts it equals the batch-mode result on the same data."""
    stream = events_stream(spark, sf_dir, "ordered", files_per_trigger=2)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", 4).alias("val_sum"))
        .select(F.col("w.start").alias("ws"), "n", "val_sum")
    )
    return run_to_memory(agg, output_mode="complete")


@query("stream_session")  # rows-only: session merge is stateful/streaming
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per user (append mode —
    the only output mode Spark supports for streaming session aggs).

    Watermark bounds session state; a session closes when no event for
    its user arrives within 30 minutes, and append emits it once the
    watermark passes its end (sessions still open at end-of-replay stay
    unemitted — correct append semantics).

    files_per_trigger=4 → 2 micro-batches: session-merge semantics are
    event-time-driven and chunk-independent; two batches exercise the
    cross-batch state merge at half the per-batch fixed cost.
    """
    stream = events_stream(spark, sf_dir, "ordered", files_per_trigger=4)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", 4).alias("val_sum"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "val_sum",
        )
    )
    return run_to_memory(agg, output_mode="append")


@query("stream_watermark_late")  # rows-only: watermark drop semantics
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data handling: the 'late' source holds back old rows until
    the final micro-batch, by which time the 10-minute watermark has
    passed them — they are dropped, and append mode emits only
    finalized windows. State is GC'd as the watermark advances.

    5 chunks / 1 per trigger: the 4 ordered batches advance the
    watermark past most held-back rows before the late batch delivers
    them — the same drop demonstration 9 batches gave at ~half the
    micro-batch fixed cost."""
    stream = events_stream(spark, sf_dir, "late", n_chunks=5, files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    return run_to_memory(agg, output_mode="append")


@query("stream_dedup")  # rows-only: stateful dedup
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful exactly-once dedup on event_id: the 'dups' source
    re-delivers every 10th event in a later batch; dropDuplicates keeps
    first occurrences only.

    No watermark here deliberately: duplicates arrive arbitrarily late,
    so the dedup state must span the replay. In production, pair
    ``dropDuplicates`` with ``withWatermark`` sized to the maximum
    redelivery lag so state stays bounded.
    """
    stream = events_stream(spark, sf_dir, "dups", n_chunks=4, files_per_trigger=2)
    deduped = stream.dropDuplicates(["event_id"])
    return run_to_memory(deduped, output_mode="append")


@query("stream_stream_static_join")  # rows-only: stream enriched by static dim
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (B1 + C3 composition): enrich the event stream
    with a static user-cohort dimension. The static side is broadcast
    per micro-batch — no stream state at all."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cohorts = (
        ev.select("user_id").distinct()
        .withColumn("cohort", F.concat(F.lit("c"), (F.col("user_id") % 5)))
    )
    stream = events_stream(spark, sf_dir, "ordered", files_per_trigger=4)
    joined = stream.join(F.broadcast(cohorts), "user_id").select(
        "event_id", "user_id", "cohort", "event_type", "value"
    )
    return run_to_memory(joined, output_mode="append")


@query("stream_stateful_custom")  # rows-only: arbitrary per-key state
def stream_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-key state via applyInPandasWithState: running event
    count + value sum per user, updated each micro-batch. Returns the
    final totals per user (the last update emitted).

    State is one small struct per user — bounded by key cardinality; at
    100 TB add a state timeout for inactive keys.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = events_stream(spark, sf_dir, "ordered", files_per_trigger=4)

    def track(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # scaled-int accumulation: exact & order-insensitive
            cents += int((pdf["value"] * 10_000).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "val_sum": [cents / 10_000.0]}
        )

    updates = stream.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id long, n_events long, val_sum double",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    mem = run_to_memory(updates, output_mode="update")
    # Reduce the update-mode emission log to the final emission per user
    # ATOMICALLY: max over a (n_events, val_sum) struct orders by
    # n_events (strictly monotone — every micro-batch adds rows) and
    # carries the matching val_sum from that same emission. Independent
    # per-column maxes would pair fields from different emissions
    # whenever val_sum is non-monotone (negative values).
    last = F.max(F.struct("n_events", "val_sum")).alias("s")
    return (
        mem.groupBy("user_id")
        .agg(last)
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.val_sum").alias("val_sum"),
        )
    )


@query("stream_kafka_smoke")  # rows-only: B1/B2 wiring through the container
def stream_kafka_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source→transform→sink wiring behind the operator registry (the
    KafkaInput → AddField → KafkaOutput pipeline of the reference,
    ``OpContainer`` + stubs). No broker in this environment, so the
    registered ``kafka_source``/``kafka_sink`` operators are swapped for
    the file-stream source and memory sink — the swap is pure config,
    which is exactly the reference's operator-container contract."""
    from streamingdemo_spark.operators import run_pipeline
    from streamingdemo_spark.streaming.sources import EVENTS_SCHEMA, _build

    src_dir = _build(sf_dir, "ordered", 8)
    ports = run_pipeline(
        spark,
        {
            "operators": [
                {
                    "name": "kafkaInput",
                    "op": "stream_parquet_source",
                    "params": {"path": src_dir, "schema": EVENTS_SCHEMA},
                },
                {
                    "name": "addField",
                    "op": "add_field",
                    "params": {
                        "name": "value_bucket",
                        "expr": "CAST(FLOOR(value / 100) AS BIGINT)",
                    },
                    "inputs": {"in": "kafkaInput.out"},
                },
            ]
        },
    )
    return run_to_memory(ports["addField.out"], output_mode="append")


@query("stream_foreach_batch")  # rows-only: side-effecting sink
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink: each micro-batch appends to a parquet target
    tagged with its epoch; the read-back dedups on event_id, showing
    the idempotent-merge pattern for exactly-once semantics on
    re-delivery (the 'dups' source re-sends 10% of events).

    This is the production escape hatch when a sink has no native
    transactional support — MERGE/upsert per epoch keyed on a stable
    id. State lives in the target table, not the stream.
    """
    import tempfile

    out = tempfile.mkdtemp(prefix="feb_sink_") + "/events_merged"
    stream = events_stream(spark, sf_dir, "dups", n_chunks=4, files_per_trigger=2)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out)
        )

    ckpt = tempfile.mkdtemp(prefix="ckpt_feb_")
    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(300)
    finally:
        query.stop()
    return (
        spark.read.parquet(out)
        .orderBy("epoch")
        .dropDuplicates(["event_id"])
        .drop("epoch")
    )


@query("stream_rate_smoke")  # rows-only: wall-clock-driven source
def stream_rate_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 processing-time trigger on a true unbounded source: the rate
    source emits rows on a wall-clock schedule; the query runs two
    1-second micro-batches (the engine form of the reference's fixed
    10 s batch interval, OpContainer.java:47-49) and stops. Asserts
    only liveness — wall-clock sources are inherently nondeterministic.
    """
    import tempfile
    import uuid

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 50).load()
        .withColumn("bucket", F.col("value") % 10)
    )
    name = f"rate_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    query = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time as _time

        deadline = _time.time() + 10
        while _time.time() < deadline:
            if query.lastProgress and query.lastProgress["batchId"] >= 2:
                break
            _time.sleep(0.5)
    finally:
        query.stop()
    return spark.table(name)
