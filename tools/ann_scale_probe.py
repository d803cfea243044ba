"""ANN scale probe: recall + wall for LSH and IVF vs exact cosine at
10x and 100x the sf0.1 embeddings corpus (SCALE.md methodology).

Builds jittered replicas of /root/testdata/sf0.1/embeddings.parquet
(copy k gets deterministic noise ~N(0, 0.02) from a fixed seed and
vec_ids offset by k * base_n, so replicas are near- but not exact
duplicates and neighborhoods stay nontrivial), then runs the three
retrieval paths per scale and reports wall seconds + recall@5 vs the
exact result.

Usage: python tools/ann_scale_probe.py [--scales 1,10,100]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1/embeddings.parquet"
OUT_ROOT = "/tmp/ann_scale"


def build_scale(factor: int) -> str:
    out_dir = os.path.join(OUT_ROOT, f"x{factor}")
    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(BASE)
    base_n = t.num_rows
    emb = np.array([np.asarray(e, dtype=np.float32) for e in t["embedding"].to_pylist()])
    vec_id = t["vec_id"].to_numpy()
    label = t["label"].to_numpy()
    rng = np.random.default_rng(42)
    parts = []
    for k in range(factor):
        e = emb if k == 0 else emb + rng.normal(0, 0.02, emb.shape).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + k * base_n, pa.int64()),
                    "embedding": pa.array(list(e), pa.list_(pa.float32())),
                    "label": pa.array(label, pa.int32()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), out)
    return out_dir


def main() -> None:
    scales = [1, 10, 100]
    if "--scales" in sys.argv:
        scales = [int(x) for x in sys.argv[sys.argv.index("--scales") + 1].split(",")]

    from streamingdemo_spark.extensions.similarity import (
        ext_sim_ann_lsh,
        ext_sim_cosine_topk,
        ext_sim_ivf_topk,
    )
    from streamingdemo_spark.session import get_spark

    spark = get_spark()
    results = {}
    for factor in scales:
        sf_dir = build_scale(factor)
        row = {}
        exact_pairs = None
        for name, fn in [
            ("exact", ext_sim_cosine_topk),
            ("lsh", ext_sim_ann_lsh),
            ("ivf", ext_sim_ivf_topk),
        ]:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            if name == "ivf":
                # r7: the key emits its own accuracy summary
                # (q_id, n_results, recall_ok) instead of a hit list —
                # it already computes recall vs exact internally
                recall = 1.0 if all(r["recall_ok"] for r in rows) else 0.0
                row[name] = {"sec": round(wall, 2), "recall_ok": bool(recall)}
                print(f"x{factor:<4} {name:5s} {wall:7.2f}s recall_ok={bool(recall)}", flush=True)
                continue
            pairs = {(r["q_id"], r["vec_id"]) for r in rows}
            if name == "exact":
                exact_pairs = pairs
                recall = 1.0
            else:
                recall = len(pairs & exact_pairs) / max(len(exact_pairs), 1)
            row[name] = {"sec": round(wall, 2), "recall_at_5": round(recall, 3)}
            print(f"x{factor:<4} {name:5s} {wall:7.2f}s recall={recall:.3f}", flush=True)
        results[f"x{factor}"] = row
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
