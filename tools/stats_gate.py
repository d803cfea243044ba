"""Shuffle/spill regression gate over the sweep's --stats sidecar.

The r10 class of scale bug (a compile-time LSH band width silently
saturating into a 30M-pair verify join) shows up in execution stats
LONG before it trips a watchdog: shuffle bytes jump an order of
magnitude while the wall is still "merely slow". This gate pins the
per-key stats of the heaviest sf10 keys and fails loudly when a
refresh exceeds the pinned envelope.

Pins live in SF10_STATS_PINS.json as per-key upper bounds with
headroom already built in (measured * 1.5, rounded up):
    {"key": {"shuffle_read_bytes": N, "disk_spilled_bytes": N,
             "n_tasks": N}, ...}

Usage:
    python tools/stats_gate.py STATS.json [PINS.json]   # check
    python tools/stats_gate.py STATS.json --repin [PINS.json]

--repin rewrites the pins from the given stats artifact (measured
* 1.5); use it only after a DELIBERATE plan change, with the diff in
review — the whole point is that growth must be explained, not
absorbed.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

DEFAULT_PINS = Path(__file__).resolve().parent.parent / "SF10_STATS_PINS.json"
HEADROOM = 1.5
GATED_FIELDS = ("shuffle_read_bytes", "disk_spilled_bytes", "n_tasks")


def main() -> int:
    args = sys.argv[1:]
    repin = "--repin" in args
    if repin:
        args.remove("--repin")
    stats_path, *rest = args
    pins_path = Path(rest[0]) if rest else DEFAULT_PINS

    runs = json.load(open(stats_path))
    stats = {
        k: r["stats"] for k, r in runs.items() if r.get("stats")
    }

    if repin:
        pins = {
            k: {
                f: int(math.ceil(v.get(f, 0) * HEADROOM))
                for f in GATED_FIELDS
            }
            for k, v in stats.items()
        }
        pins_path.write_text(json.dumps(pins, indent=1))
        print(f"pinned {len(pins)} keys -> {pins_path}")
        return 0

    pins = json.load(open(pins_path))
    failures = []
    for k, bound in pins.items():
        got = stats.get(k)
        if got is None:
            failures.append(f"{k}: no stats recorded (run with --stats)")
            continue
        for f in GATED_FIELDS:
            if got.get(f, 0) > bound.get(f, 0):
                failures.append(
                    f"{k}.{f}: {got.get(f, 0):,} > pinned {bound.get(f, 0):,}"
                )
    if failures:
        print("STATS GATE FAIL:")
        for line in failures:
            print(f"  {line}")
        return 1
    print(f"stats gate: {len(pins)} keys within pinned envelope")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
