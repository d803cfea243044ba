"""Assemble BENCH_FULL_r{N}.json: per-key seconds for the ENTIRE
registry at sf0.1, so round-over-round regressions outside the
43-query bench headline become visible.

Input: a completed full driver_sim run (`python tools/driver_sim.py
/root/testdata/sf0.1 --out <sim.json>`) — its per-key `sec` includes
the DuckDB oracle replay and the canonicalization hash, which is fine
for round-over-round comparison as long as every round uses the same
method (this one). Anchors: the 5 bench anchor keys are re-measured
as PURE warm Spark walls (bench.py convention, second run recorded)
and divided by the latest BENCH_r*.json values, so box drift is
separable exactly like the headline bench.

Usage: python tools/bench_full.py <sim.json> <round_number>
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sim_path, rnd = sys.argv[1], int(sys.argv[2])
    sim = json.loads(Path(sim_path).read_text())

    import __spark_entry__ as entry
    from bench import ANCHOR_KEYS, _anchor_ratios
    from streamingdemo_spark.session import get_spark

    spark = get_spark(app_name="bench-full-anchors")
    queries = entry.queries()
    sf_dir = "/root/testdata/sf0.1"
    queries["src_parquet_scan"](spark, sf_dir).collect()
    anchor_walls = {}
    for key in ANCHOR_KEYS:
        queries[key](spark, sf_dir).count()
        t0 = time.perf_counter()
        queries[key](spark, sf_dir).count()
        anchor_walls[key] = time.perf_counter() - t0
    anchors = _anchor_ratios(anchor_walls, 0.1)

    keys = {k: v["sec"] for k, v in sim.items()}
    n_pass = sum(1 for v in sim.values() if v.get("hash_match"))
    n_rows = sum(
        1
        for v in sim.values()
        if v.get("err") == "no_oracle" and v.get("spark_rows") is not None
    )
    out = {
        "metric": "full_registry_sim_seconds",
        "sf": 0.1,
        "method": "driver_sim per-key wall (spark + oracle + canon), cold JVM",
        "n_keys": len(keys),
        "n_pass": n_pass,
        "n_rows_only": n_rows,
        "n_fail": len(keys) - n_pass - n_rows,
        "total_sec": round(sum(keys.values()), 1),
        "anchors": anchors,
        "keys": keys,
    }
    if anchors:
        ratios = sorted(anchors.values())
        out["anchor_median"] = ratios[len(ratios) // 2]
    dest = REPO / f"BENCH_FULL_r{rnd}.json"
    dest.write_text(json.dumps(out, indent=1))
    slow = sorted(keys.items(), key=lambda kv: -kv[1])[:10]
    print(f"wrote {dest}: {len(keys)} keys, total {out['total_sec']}s, "
          f"anchors {anchors} (median {out.get('anchor_median')})")
    print("top-10 slowest:")
    for k, s in slow:
        print(f"  {s:7.2f}s  {k}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
