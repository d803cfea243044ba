"""Round-6 dedup/ANN scale probe: pin the 100 TB claims of the
substring-dedup trio (post map-side-winnowing rewrite) and the hybrid
RRF fusion key with a measured 10x point, the way the flagships are
pinned by tools/sf10_sweep.py.

Derivation (into /tmp/r6_scale_x10; nothing under /root/testdata is
touched):
- documents 10x (50,000 docs): replica r keeps doc_ids offset by
  r * 10_000_000 and remaps the 10 most common letters through a
  rotation-by-r substitution cipher. That keeps each replica's
  INTERNAL duplicate structure (and n_chars) byte-for-byte intact
  while making cross-replica 40-gram/shingle matches vanish — the
  realistic "10x more corpus, same duplicate rate" shape, unlike the
  round-1 dup-dense probe (which planted ~9 near-dups per doc and is
  kept in SCALE.md as the worst-case point). Offsets clear
  MUTANT_OFFSET so the minhash mutant-planting stays per-replica.
- embeddings 10x (20,000 vectors): the ann_scale_probe derivation
  (vec_id + k * base_n, N(0, 0.02) jitter on replicas) so the ANN
  legs see near- but not exact duplicates.

Warm walls (second run recorded), sf0.1 vs 10x, plus the bench anchor
ratio so box drift stays separable. Output: one JSON
(/root/repo/R6_SCALE.json) + markdown rows for SCALE.md.

Usage: python tools/r6_scale_probe.py [--skip-build]
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

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import streamingdemo_spark.extensions  # noqa: E402,F401
import streamingdemo_spark.plans  # noqa: E402,F401
from streamingdemo_spark.registry import QUERIES  # noqa: E402
from streamingdemo_spark.session import get_spark  # noqa: E402

from bench import ANCHOR_KEYS, _anchor_ratios  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/r6_scale_x10"
REPLICAS = 10
DOC_OFFSET = 10_000_000  # clears MUTANT_OFFSET (1e6) per replica
COMMON = "etaoinsrhl"  # remapped letters; rotation r per replica

KEYS = [
    "ext_dedup_substring",
    "ext_dedup_span_coverage",
    "ext_dedup_minhash",
    "ext_sim_ann_lsh",
    "ext_sim_rrf_ann",
    "ext_dsir_weights",
    "ext_sim_pq_adc",
    "ext_semdedup",
    "ext_hard_negatives",
    "ext_retrieval_metrics",
    "ext_ts_holt",
    "ext_coreset_kcenter",
    "ext_ts_holt_winters",
    "ext_cluster_kmeans",
    "ext_bootstrap_ci",
    "ext_attribution_shapley",
]


def replicate_embeddings(src: str, dst: str, replicas: int) -> None:
    """embeddings Nx: replica k offsets vec_id by k * base_n and
    jitters the vectors N(0, 0.02) (seed 42) — near- but not exact
    duplicates, the ann_scale_probe derivation. Shared with
    tools/r7_scale_probe.py so both probes measure the same corpus."""
    e = pq.read_table(os.path.join(src, "embeddings.parquet"))
    base_n = e.num_rows
    emb = np.array(
        [np.asarray(v, dtype=np.float32) for v in e["embedding"].to_pylist()]
    )
    rng = np.random.default_rng(42)
    eparts = []
    for k in range(replicas):
        vecs = (
            emb
            if k == 0
            else emb + rng.normal(0, 0.02, emb.shape).astype(np.float32)
        )
        eparts.append(
            pa.table(
                {
                    "vec_id": pa.array(
                        e["vec_id"].to_numpy() + k * base_n, pa.int64()
                    ),
                    "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                    "label": e["label"],
                }
            )
        )
    pq.write_table(
        pa.concat_tables(eparts), os.path.join(dst, "embeddings.parquet")
    )


def replicate_events(src: str, dst: str, replicas: int, offset: int) -> None:
    """events Nx: replicas are fresh user populations (user_id offset)
    with event_ids offset to stay unique — Nx series, same lengths,
    the growth shape for per-series state keys. Shared with
    tools/r7_scale_probe.py."""
    ev = pq.read_table(os.path.join(src, "events.parquet"))
    vparts = []
    for k in range(replicas):
        cols = {n: ev[n] for n in ev.column_names}
        cols["user_id"] = pa.array(
            ev["user_id"].to_numpy() + k * offset, pa.int64()
        )
        cols["event_id"] = pa.array(
            ev["event_id"].to_numpy() + k * offset, pa.int64()
        )
        vparts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(vparts), os.path.join(dst, "events.parquet"))


def warm_wall(spark, key: str, d: str) -> tuple[float, int]:
    """Second-run (warm) wall + row count for a registry key."""
    QUERIES[key](spark, d).count()
    t0 = time.perf_counter()
    n = QUERIES[key](spark, d).count()
    return time.perf_counter() - t0, n


def build() -> None:
    os.makedirs(DST, exist_ok=True)
    # documents: per-replica substitution cipher over COMMON letters
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = t["text"].to_pylist()
    parts = []
    for r in range(REPLICAS):
        rot = COMMON[r:] + COMMON[:r]
        table = str.maketrans(COMMON, rot)
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(
                        t["doc_id"].to_numpy() + r * DOC_OFFSET, pa.int64()
                    ),
                    "text": pa.array(
                        texts if r == 0 else [s.translate(table) for s in texts],
                        pa.string(),
                    ),
                    "lang": t["lang"],
                    "source": t["source"],
                    "n_chars": t["n_chars"],  # translate is 1:1
                }
            )
        )
    pq.write_table(
        pa.concat_tables(parts), os.path.join(DST, "documents.parquet")
    )
    # embeddings: ann_scale_probe's jittered-replica derivation
    replicate_embeddings(SRC, DST, REPLICAS)
    # events 10x (ext_ts_holt et al.)
    replicate_events(SRC, DST, REPLICAS, DOC_OFFSET)




if __name__ == "__main__":
    spark = get_spark(app_name="r6-scale-probe")
    if "--skip-build" not in sys.argv or not os.path.isdir(DST):
        t0 = time.perf_counter()
        build()
        print(f"built {DST} in {time.perf_counter() - t0:.1f}s")

    QUERIES["src_parquet_scan"](spark, SRC).collect()
    anchor_walls = {}
    for key in ANCHOR_KEYS:
        anchor_walls[key], _ = warm_wall(spark, key, SRC)
    anchors = _anchor_ratios(anchor_walls, 0.1)

    out: dict = {"sf": "0.1 -> 10x docs/emb", "anchors": anchors, "keys": {}}
    if anchors:
        ratios = sorted(anchors.values())
        out["anchor_median"] = ratios[len(ratios) // 2]
    print("| key | sf0.1 | 10x corpus | ratio | rows sf0.1 -> 10x |")
    print("|---|---|---|---|---|")
    for key in KEYS:
        w01, r01 = warm_wall(spark, key, SRC)
        w10, r10 = warm_wall(spark, key, DST)
        out["keys"][key] = {
            "sf0.1_s": round(w01, 2),
            "x10_s": round(w10, 2),
            "ratio": round(w10 / w01, 2),
            "rows_sf0.1": r01,
            "rows_x10": r10,
        }
        print(
            f"| {key} | {w01:.1f} s | {w10:.1f} s "
            f"| {w10 / w01:.1f}x | {r01} -> {r10} |"
        )
    (REPO / "R6_SCALE.json").write_text(json.dumps(out, indent=1))
    print(f"anchors: {anchors} (median {out.get('anchor_median')})")
    spark.stop()
