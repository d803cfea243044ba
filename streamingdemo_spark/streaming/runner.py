"""Run a streaming DataFrame to completion and return the batch result.

Test/driver harness: ``availableNow`` replays the whole source through
real micro-batch execution (the engine analogue of the reference's
10 s-interval container run, ``OpContainer.java:46-69``), collecting
into a memory sink. Production sinks swap the format — the query shape
is identical.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_to_memory(
    df: DataFrame,
    output_mode: str = "append",
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame with trigger(availableNow) into an
    in-memory table; returns the table as a batch DataFrame."""
    spark: SparkSession = df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_sec)
    finally:
        query.stop()
    return spark.table(name)
