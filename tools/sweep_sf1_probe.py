"""TPC-H sweep at ~sf1: derive a 10x dataset from sf0.1 by key-offset
replication (join cardinalities scale realistically: each replica
shifts orderkey/custkey/partkey/suppkey by a disjoint offset, dates
unchanged) into /tmp/sweep_sf1, then run every flagship key and
report wall + rows vs sf0.1. Nothing under /root/testdata is touched.

Usage: python tools/sweep_sf1_probe.py [--skip-build]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import streamingdemo_spark.plans  # noqa: E402,F401
from pyspark.sql import functions as F  # noqa: E402
from streamingdemo_spark.registry import QUERIES  # noqa: E402
from streamingdemo_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sweep_sf1"
REPLICAS = 10
# per-table key columns to offset so replicas don't collide; dims
# region/nation stay shared (25 nations at any TPC-H sf)
OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
}

KEYS = [
    "flagship_q1", "flagship_q2", "flagship_q3", "flagship_q4",
    "flagship_q5", "flagship_q6", "flagship_q7", "flagship_q8",
    "flagship_q9", "flagship_q10", "flagship_q11", "flagship_q12",
    "flagship_q13", "flagship_q14", "flagship_q15", "flagship_q16",
    "flagship_q17", "flagship_q18", "flagship_q19", "flagship_q20",
    "flagship_q21", "flagship_q22",
]


def build(spark) -> None:
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
    for t, offs in OFFSETS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = None
        for r in range(REPLICAS):
            rep = base
            for col, step in offs.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(r * step))
            out = rep if out is None else out.unionAll(rep)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    # the sweep never reads these, but load_tables may: symlink-copy
    for t in ("events", "documents", "embeddings"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")


def main() -> None:
    spark = get_spark(app_name="sweep-sf1-probe")
    if "--skip-build" not in sys.argv or not os.path.isdir(DST):
        t0 = time.perf_counter()
        build(spark)
        print(f"built {DST} in {time.perf_counter() - t0:.1f}s")
    QUERIES["src_parquet_scan"](spark, SRC).collect()
    for key in KEYS:
        walls, rows = {}, {}
        for tag, d in (("sf0.1", SRC), ("sf1", DST)):
            t0 = time.perf_counter()
            rows[tag] = QUERIES[key](spark, d).count()
            walls[tag] = time.perf_counter() - t0
        print(
            f"{key:15s} {walls['sf0.1']:6.2f}s -> {walls['sf1']:6.2f}s "
            f"(x{walls['sf1'] / walls['sf0.1']:.2f}) "
            f"rows {rows['sf0.1']} -> {rows['sf1']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
