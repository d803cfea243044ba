"""Pinned ~sf10 flagship sweep: every TPC-H flagship key at 100x the
bench scale, with the bench's anchor convention so box-speed drift is
separable from engine regressions.

Derivation: /tmp/sweep_sf1 (10 key-offset replicas of sf0.1, built by
tools/sweep_sf1_probe.py) replicated 10 more times with 10x-larger
disjoint key offsets -> /tmp/sweep_sf10 (~60M lineitem / 15M orders).
Join cardinalities scale realistically (each replica is a closed key
universe); dims region/nation stay shared, as at any TPC-H sf.
Nothing under /root/testdata is touched.

Output: one markdown table (paste into SCALE.md) + SF10_SWEEP.json
next to the repo's BENCH artifacts. Warm walls: each key runs twice
per scale, the second run is recorded (first-touch codegen/broadcast
excluded). Anchors: the 5 bench anchor keys at sf0.1 are re-run and
divided by the latest BENCH_r*.json values — a uniform shift is the
box, not the engine (read this sweep through anchor_median exactly
like BENCH).

Usage: python tools/sf10_sweep.py [--skip-build]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import streamingdemo_spark.plans  # noqa: E402,F401
from pyspark.sql import functions as F  # noqa: E402
from streamingdemo_spark.registry import QUERIES  # noqa: E402
from streamingdemo_spark.session import get_spark  # noqa: E402

from bench import ANCHOR_KEYS, _anchor_ratios  # noqa: E402
from tools.sweep_sf1_probe import KEYS, build as build_sf1  # noqa: E402

SRC = "/root/testdata/sf0.1"
MID = "/tmp/sweep_sf1"
DST = "/tmp/sweep_sf10"
REPLICAS = 10
# sf1 replicas consumed key space up to 10x the base step; the sf10
# offsets start a decade higher so all 100 effective replicas stay
# disjoint
OFFSETS = {
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
}


def build_sf10(spark) -> None:
    for t in ("region", "nation", "events", "documents", "embeddings"):
        spark.read.parquet(f"{MID}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
    for t, offs in OFFSETS.items():
        base = spark.read.parquet(f"{MID}/{t}.parquet")
        out = None
        for r in range(REPLICAS):
            rep = base
            for col, step in offs.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(r * step))
            out = rep if out is None else out.unionAll(rep)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def _warm_wall(key: str, d: str) -> tuple[float, int]:
    QUERIES[key](spark, d).count()  # first touch: codegen + broadcasts
    t0 = time.perf_counter()
    n = QUERIES[key](spark, d).count()
    return time.perf_counter() - t0, n


if __name__ == "__main__":
    spark = get_spark(app_name="sf10-sweep")
    if "--skip-build" not in sys.argv or not os.path.isdir(DST):
        t0 = time.perf_counter()
        if not os.path.isdir(MID):
            build_sf1(spark)
        build_sf10(spark)
        print(f"built {DST} in {time.perf_counter() - t0:.1f}s")

    QUERIES["src_parquet_scan"](spark, SRC).collect()
    anchor_walls = {}
    for key in ANCHOR_KEYS:
        anchor_walls[key], _ = _warm_wall(key, SRC)
    anchors = _anchor_ratios(anchor_walls, 0.1)

    out: dict = {"sf": "0.1->10", "anchors": anchors, "keys": {}}
    if anchors:
        ratios = sorted(anchors.values())
        out["anchor_median"] = ratios[len(ratios) // 2]
    print("| key | sf0.1 | ~sf10 | 100x data => wall | rows sf0.1 -> sf10 |")
    print("|---|---|---|---|---|")
    for key in KEYS:
        w01, r01 = _warm_wall(key, SRC)
        w10, r10 = _warm_wall(key, DST)
        out["keys"][key] = {
            "sf0.1_s": round(w01, 2),
            "sf10_s": round(w10, 2),
            "ratio": round(w10 / w01, 2),
            "rows_sf0.1": r01,
            "rows_sf10": r10,
        }
        print(
            f"| {key} | {w01:.1f} s | {w10:.1f} s "
            f"| {w10 / w01:.1f}x | {r01} -> {r10} |"
        )
    (REPO / "SF10_SWEEP.json").write_text(json.dumps(out, indent=1))
    print(f"anchors: {anchors} (median {out.get('anchor_median')})")
    worst = max(out["keys"].items(), key=lambda kv: kv[1]["ratio"])
    print(f"worst ratio: {worst[0]} {worst[1]['ratio']}x (superlinear iff > 100x)")
    spark.stop()
