"""TPC-H-sweep scale probes: the 13 flagship_sweep keys at sf0.01 vs
sf0.1 (every TPC-H table 10x). Methodology as SCALE.md: warm the
session, time a full drain per key per scale, report the wall ratio
next to the data ratio — a key is scale-clean when wall grows no
faster than its dominant input.

Usage: python tools/sweep_scale_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import streamingdemo_spark.plans  # noqa: E402,F401  (registers keys)
import streamingdemo_spark.extensions  # noqa: E402,F401
from streamingdemo_spark.registry import QUERIES  # noqa: E402
from streamingdemo_spark.session import get_spark  # noqa: E402

KEYS = [
    # (key, dominant input at sf0.1 vs sf0.01)
    ("flagship_q1", "lineitem 10x, 6 groups fixed"),
    ("flagship_q4", "orders+lineitem 10x, semi join"),
    ("flagship_q6", "lineitem 10x, scan-bound"),
    ("flagship_q8", "lineitem 10x, dims broadcast"),
    ("flagship_q9", "lineitem 10x, dims broadcast"),
    ("flagship_q10", "lineitem 10x, top-20 fixed"),
    ("flagship_q12", "lineitem 10x, 2 groups fixed"),
    ("flagship_q14", "lineitem 10x, 1 row out"),
    ("flagship_q15", "lineitem 10x, supplier grain 10x"),
    ("flagship_q16", "lineitem 10x, distinct suppliers"),
    ("flagship_q17", "lineitem 10x, part grain 10x"),
    ("flagship_q20", "lineitem 10x, two agg grains"),
    ("flagship_q22", "customer+orders 10x, anti join"),
    ("ext_dedup_substring", "docs 10x (grams 10x, dup spans grow with planted dups)"),
    ("ext_bigram_surprisal", "docs 10x (bigram vocab sub-linear)"),
    ("win_yoy_growth", "orders 10x, nation-year grain fixed"),
    ("ext_dedup_span_coverage", "docs 10x, per-doc window bounded"),
]


def main() -> None:
    spark = get_spark(app_name="sweep-scale-probe")
    QUERIES["src_parquet_scan"](spark, "/root/testdata/sf0.01").collect()
    for key, note in KEYS:
        walls = {}
        rows = {}
        for sf in ("0.01", "0.1"):
            t0 = time.perf_counter()
            rows[sf] = QUERIES[key](spark, f"/root/testdata/sf{sf}").count()
            walls[sf] = time.perf_counter() - t0
        print(
            f"{key:30s} {walls['0.01']:6.2f}s -> {walls['0.1']:6.2f}s "
            f"(x{walls['0.1'] / walls['0.01']:.2f}) rows "
            f"{rows['0.01']} -> {rows['0.1']}  [{note}]"
        )
    spark.stop()


if __name__ == "__main__":
    main()
