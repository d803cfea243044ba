"""Tile-grid kNN scale probe (SCALE.md methodology): at 50k vectors
(x25 jittered replicas of the sf0.1 embeddings corpus, built by
ann_scale_probe.build_scale), run the exact kNN self-join with a
single build-side tile vs a 10k-row tile grid and report wall seconds,
per-tile broadcast size, and result equality.

The point being probed: the tile grid bounds executor-side build
memory at tile_rows x dims x 8 B per tile (plus one tile resident at a
time per task) while producing the identical top-k graph — the margin
cut emits a per-tile superset of the global rounded-tie set, and the
final window re-ranks the union.

Usage: python tools/knn_tile_probe.py [--factor 25] [--tile-rows 10000]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.ann_scale_probe import build_scale  # noqa: E402


def main() -> None:
    factor = 25
    tile_rows = 10_000
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    if "--tile-rows" in sys.argv:
        tile_rows = int(sys.argv[sys.argv.index("--tile-rows") + 1])

    from streamingdemo_spark.extensions.similarity import ext_sim_knn_join
    from streamingdemo_spark.session import get_spark

    spark = get_spark()
    sf_dir = build_scale(factor)
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    dims = 64
    out = {}
    results = {}
    for name, tr in [("single_tile", None), (f"tiles_{tile_rows}", tile_rows)]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rows = ext_sim_knn_join(spark, sf_dir, tile_rows=tr).collect()
        wall = time.perf_counter() - t0
        results[name] = {(r["vec_id"], r["rank"]): (r["nbr_id"], r["cosine"]) for r in rows}
        build_rows = n if tr is None else min(tr, n)
        out[name] = {
            "sec": round(wall, 2),
            "rows": len(rows),
            "tile_mib": round(build_rows * dims * 8 / 2**20, 1),
        }
        print(f"{name}: {wall:.2f}s, {len(rows)} rows, "
              f"build tile {out[name]['tile_mib']} MiB", flush=True)
    match = results["single_tile"] == results[f"tiles_{tile_rows}"]
    out["identical_results"] = match
    out["n_vectors"] = n
    print(json.dumps(out))
    if not match:
        raise SystemExit("tile-grid result differs from single tile")


if __name__ == "__main__":
    main()
