"""Maintain ORACLE_FP.json — the per-key oracle-SQL fingerprint
snapshot that makes driver certification stick to the ORACLE TEXT it
actually proved (r8 advice: a key that hash-matched once must not stay
certified after its oracle is strengthened).

Each record: ``{key: {"fp": <16-hex sha256 of whitespace-normalized
SQL>, "round": N}}`` where ``round`` is the round the current text
took effect — a key is certified only by a hash row from that round
or later (``__spark_entry__.driver_uncertified``).

Run after any session that adds or edits oracles (the pytest gate
``tests/test_oracle.py::test_oracle_fingerprints_current`` fails until
the snapshot is regenerated):

    python tools/oracle_fp.py            # update snapshot
    python tools/oracle_fp.py --check    # report drift, write nothing

Bootstrap semantics: a brand-new or changed oracle gets
``round = current round`` (max CORRECTNESS_r* + 1), re-opening its
certification; an unchanged oracle keeps its recorded round. On first
run (no snapshot), keys with an existing hash row are seeded with that
hash row's round — the r8 verdict verified every oracle-backed key's
current text holds a hash row, so seeding at the certified round is
the honest baseline, and any LATER edit bumps the round forward.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402

# Resolved at the driver's sf0.01 contract tier: data-derived oracles
# (PCA component literals, compression pin) are fingerprinted on the
# exact text the driver will run.
ORACLES = entry.oracle_sql()


def current_round() -> int:
    rounds = [
        int(m.group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
        for m in [re.search(r"r(\d+)", p.stem)]
        if m
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    check_only = "--check" in sys.argv[1:]
    path = REPO / "ORACLE_FP.json"
    try:
        old = json.loads(path.read_text())
    except (OSError, ValueError):
        old = {}
    hist = entry._correctness_history()
    rnd = current_round()
    out: dict[str, dict] = {}
    changed, dropped = [], []
    for key in sorted(ORACLES):
        fp = entry.oracle_fp(ORACLES[key])
        prev = old.get(key)
        if prev is not None and prev.get("fp") == fp:
            out[key] = prev  # unchanged text keeps its effective round
        else:
            if prev is None and old == {}:
                # first-run seed: certified keys keep their hash round
                hr = (hist.get(key) or {}).get("hash_round")
                out[key] = {"fp": fp, "round": hr if hr else rnd}
            else:
                out[key] = {"fp": fp, "round": rnd}
            changed.append(key)
    dropped = sorted(set(old) - set(out))
    if check_only:
        print(f"round={rnd} changed_or_new={len(changed)} dropped={len(dropped)}")
        for k in changed:
            print(f"  changed/new: {k}")
        for k in dropped:
            print(f"  dropped: {k}")
        return 1 if (changed or dropped) else 0
    path.write_text(json.dumps(out, indent=0, sort_keys=True) + "\n")
    print(
        f"wrote {path.name}: {len(out)} oracles, "
        f"{len(changed)} changed/new at round {rnd}, {len(dropped)} dropped"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
