"""Fixture / table I/O.

Plays the role of the reference's two data-access paths:
- Hive-catalog table reads (``SparkSQLOperator.java:18``) -> parquet
  reads + temp views, so ``spark.sql`` can address every table;
- the schema-tagged stream source (``KafkaInput.java``) -> see
  ``streamingdemo_spark.streaming`` for the readStream variants.

100 TB design note: reads stay fully declarative (``spark.read
.parquet``) so partition pruning / predicate pushdown / column pruning
reach the scan. Nothing here collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def parquet_rows(sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from its parquet FOOTER
    metadata — driver-side, no Spark job. Identical by definition to
    an unfiltered ``count()`` over the same files (the footer is the
    writer's own row accounting, the same source Spark's count-star
    optimization reads inside its tasks); for the scale dials that
    need only n (LSH band widths, partition counts, tile grids) the
    count() JOB's fixed scheduling cost is pure overhead — the same
    job-for-metadata swap as the txn family's ``_footer_stats``."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def spread_scan(df: DataFrame, min_tasks_ratio: int = 2) -> DataFrame:
    """Parallelism floor for heavy per-row work over few-file scans
    (guide §2.5: "one huge unsplittable file … repartition immediately
    after the read").

    The bench fixtures are single-row-group parquet files, so every
    stage up to the first exchange runs as ONE task regardless of core
    count — shingle explodes, rolling-hash UDFs and signature builds
    all serialize on one core. At production scale a table scan has
    thousands of row-group splits and this helper is a metadata-only
    no-op: it round-robin repartitions to the session's default
    parallelism ONLY when the scan's own layout yields fewer than
    1/``min_tasks_ratio`` of the cores (decided from the planned
    partition count, no job). Results are unchanged by construction —
    repartition moves rows, and every consumer is a key/group
    computation. The cost when it fires is one shuffle of the
    projected columns, so project/filter before calling (guide §2.3);
    the deterministic sort-before-repartition default stays on so task
    retries reproduce the same placement (guide §2.5). A size floor
    (plan-statistics bytes, default 256 KiB, env
    ``STREAMINGDEMO_SPREAD_MIN_BYTES``) keeps tiny inputs unspread —
    below it the shuffle's fixed cost exceeds the per-row work it
    parallelizes (measured: the same keys that win 1.3-7× at sf0.1
    lose 15-35 % at sf0.01).
    """
    if os.environ.get("STREAMINGDEMO_SPREAD_SCAN", "1") == "0":
        return df  # site override / A-B measurement kill-switch
    # Size floor: the repartition's fixed shuffle cost is only paid
    # back when there is enough per-row work behind it. Interleaved
    # A/B: at sf0.1 (~4 MB corpus) the heavy consumers win 1.3-7x, at
    # sf0.01 (~0.4 MB) the same keys LOSE 15-35% — so tiny inputs stay
    # unspread (plan-statistics estimate, driver-side, no job).
    min_bytes = int(
        os.environ.get("STREAMINGDEMO_SPREAD_MIN_BYTES", str(256 << 10))
    )
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est < min_bytes:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * min_tasks_ratio <= target:
        return df.repartition(target)
    return df


def _load_one(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The events fixture stores TIMESTAMP(NANOS), which Spark's
        # reader rejects outright; force the legacy long read on
        # whatever session we were handed (the driver builds its own,
        # without our session.py defaults).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as raw int64 (see session.py); convert
        # with integer division — double division would lose precision
        # above 2^53 ns.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the fixture tables as DataFrames keyed by table name."""
    return {name: _load_one(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view of the same name.

    Mirrors the reference's catalog-managed relations so arbitrary SQL
    (the C1 entry point) can run against them.
    """
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
