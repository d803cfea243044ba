"""Fold a full-registry driver_sim run at /tmp/sim_sf10 (plus any
supplemental single-key runs) into SF10_SWEEP.json — the round-10
shape: per-key PASS/rows-only/FAIL verdicts for the WHOLE registry at
~sf10 (60M-row lineitem, 10M events, 500k docs), replacing r7's
21-key integer-heavy subset.

Usage:
    python tools/sf10_summarize.py OUT.json SIM1.json [SIM2.json ...]

Later files override earlier ones per key (supplemental re-runs win).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path, *sims = sys.argv[1:]
    merged: dict[str, dict] = {}
    for p in sims:
        merged.update(json.load(open(p)))
    keys = {}
    n_pass = n_rows = n_fail = 0
    for k, r in sorted(merged.items()):
        if r.get("hash_match"):
            status = "PASS"
            n_pass += 1
        elif r.get("err") == "no_oracle" and r.get("spark_rows") is not None:
            status = "rows-only"
            n_rows += 1
        else:
            status = "FAIL"
            n_fail += 1
        keys[k] = {
            "status": status,
            "sec": r.get("sec"),
            "spark_rows": r.get("spark_rows"),
            **({"err": r["err"]} if r.get("err") not in (None, "no_oracle") else {}),
        }
    doc = {
        "sf": "~10 (60M lineitem / 10M events / 500k docs; "
              "/tmp/sim_sf10 via tools/sf10_differential.py)",
        "n_keys": len(keys),
        "n_pass": n_pass,
        "n_rows_only": n_rows,
        "n_fail": n_fail,
        "keys": keys,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{out_path}: {len(keys)} keys, {n_pass} pass, "
          f"{n_rows} rows-only, {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
