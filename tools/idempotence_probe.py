"""Same-session idempotence probe: run every registry key TWICE in
one SparkSession and require identical canonical results. Catches the
failure class the one-pass driver sim cannot: cross-key interference
through session state (temp-view name collisions, stale caches,
leaked configs) and any within-session nondeterminism.

Usage: python tools/idempotence_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from streamingdemo_spark.session import get_spark  # noqa: E402


def canon(df) -> tuple:
    rows = sorted(
        tuple(str(v) for v in row) for row in df.collect()
    )
    return (tuple(sorted(df.columns)), tuple(rows))


# Nondeterministic BY CONTRACT: the wall-clock rate source is the one
# remaining rows-only key whose output may differ between executions.
# (agg_kll_quantile_merge left this set in r7: its output is now exact
# nearest-rank percentiles plus a tolerance flag, both stable across
# runs — only the sketch's internal samples vary, and they no longer
# reach the output.) Everything else must be bitwise idempotent.
EXPECTED_NONDETERMINISTIC = {"stream_rate_smoke"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="idempotence-probe")
    queries = entry_mod.queries()
    first: dict[str, tuple] = {}
    failures: list[str] = []
    for key, fn in queries.items():
        first[key] = canon(fn(spark, sf_dir))
    for key, fn in queries.items():
        again = canon(fn(spark, sf_dir))
        if again != first[key] and key not in EXPECTED_NONDETERMINISTIC:
            failures.append(key)
            print(f"NONIDEMPOTENT {key}")
    print(
        f"{len(queries)} keys x2: "
        + ("ALL IDENTICAL" if not failures else f"{len(failures)} FAILED")
    )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
