"""Round-4 scale probes (SCALE.md methodology) for the keys the
round-3 batch left unprobed or probed only at the default shape:

1. join_range_banded at WIDER interval slices: the registered key
   takes a ~3% slice of orders (o_orderkey % 32) to keep the driver
   check output-bounded; this probe re-runs the identical banded plan
   at % 8 (4x) and % 2 (16x the intervals) on sf0.1 to show wall
   tracks CANDIDATE/OUTPUT volume linearly - the per-candidate cost
   of the band equi-join is flat, there is no quadratic term hiding
   behind the slice.

2. agg_bitmap_distinct at a LARGER ID DOMAIN: the fixture's user ids
   span ~1.5k, so per-group bitmap state is a handful of 32-bit
   words. This probe synthesizes 2M events with ids drawn from a 10k
   vs a 1M domain (100x the words) to show the shuffle stays
   row-bounded: words-per-group is min(rows, domain/32), so a sparse
   huge domain costs the same as a small one (the bitmap only
   materializes words that contain at least one id).

3. ext_ts_motif 10x re-run (sf0.01 -> sf0.1) confirming the round-3
   row on the current code.

Usage: python tools/r4_scale_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

import streamingdemo_spark.plans  # noqa: E402,F401  (registers keys)
import streamingdemo_spark.extensions  # noqa: E402,F401
from streamingdemo_spark.io import load_tables  # noqa: E402
from streamingdemo_spark.registry import QUERIES, dsum  # noqa: E402
from streamingdemo_spark.session import get_spark  # noqa: E402


def _drain(df) -> tuple[int, float]:
    t0 = time.perf_counter()
    n = df.count()
    return n, round(time.perf_counter() - t0, 2)


def banded(spark, sf_dir: str, mod: int):
    """The exact join_range_banded plan at slice o_orderkey % mod
    (imports the shipped salted builder so the probe measures the
    production plan)."""
    from streamingdemo_spark.plans.joins import _range_banded

    return _range_banded(spark, sf_dir, mod)


def bitmap(spark, n_rows: int, domain: int):
    """The agg_bitmap_distinct aggregation shape over synthetic events
    with ids drawn (deterministically) from [0, domain)."""
    ev = spark.range(n_rows).select(
        (F.col("id") % 7).cast("string").alias("event_type"),
        F.pmod(F.xxhash64("id"), F.lit(domain)).alias("user_id"),
    )
    bits = ev.groupBy(
        "event_type",
        F.expr("(user_id - pmod(user_id, 32)) div 32").alias("word"),
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT),"
            " CAST(pmod(user_id, 32) AS INT)))"
        ).alias("bm")
    )
    return bits.groupBy("event_type").agg(
        F.sum(F.bit_count("bm")).alias("n_users"),
        F.count(F.lit(1)).alias("n_words"),
    )


def main() -> None:
    spark = get_spark()
    out: dict = {}

    rows = {}
    for mod in (32, 8, 2):
        spark.catalog.clearCache()
        n, sec = _drain(banded(spark, "/root/testdata/sf0.1", mod))
        rows[f"mod_{mod}"] = {"groups": n, "sec": sec}
        print(f"banded %{mod}: {n} groups, {sec}s", flush=True)
    out["join_range_banded_slices"] = rows

    rows = {}
    for domain in (10_000, 1_000_000):
        spark.catalog.clearCache()
        n, sec = _drain(bitmap(spark, 2_000_000, domain))
        rows[f"domain_{domain}"] = {"groups": n, "sec": sec}
        print(f"bitmap domain {domain}: {sec}s", flush=True)
    out["agg_bitmap_distinct_domains"] = rows

    rows = {}
    for sf in ("sf0.01", "sf0.1"):
        spark.catalog.clearCache()
        n, sec = _drain(QUERIES["ext_ts_motif"](spark, f"/root/testdata/{sf}"))
        rows[sf] = {"rows": n, "sec": sec}
        print(f"ts_motif {sf}: {sec}s", flush=True)
    out["ext_ts_motif_10x"] = rows

    # 10x probes for every round-4 key (SCALE discipline: each new
    # key records a growth ratio; best-of-2 to shed first-touch
    # codegen)
    new_keys = [
        "flagship_q18", "agg_percentile_exact", "stream_stream_outer_join",
        "fn_variant_json", "fn_xml", "src_text_scan",
        "src_python_datasource", "fn_collation",
    ]
    for key in new_keys:
        rec = {}
        for sf in ("sf0.01", "sf0.1"):
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                n, sec = _drain(QUERIES[key](spark, f"/root/testdata/{sf}"))
                best = sec if best is None else min(best, sec)
            rec[sf] = {"rows": n, "sec": best}
        rec["ratio"] = round(rec["sf0.1"]["sec"] / max(rec["sf0.01"]["sec"], 0.01), 2)
        print(f"{key}: {rec['sf0.01']['sec']}s -> {rec['sf0.1']['sec']}s ({rec['ratio']}x)", flush=True)
        out[f"{key}_10x"] = rec

    print(json.dumps(out))


if __name__ == "__main__":
    main()
