"""Round-7 scale probe: record the 10x point for the three round-5
keys SCALE.md never covered (`stream_chained_windows`,
`agg_markov_transitions`, `join_interval_overlap`) plus the keys
whose shape changed this round (the exact+flag upgrades of
`agg_hll_mergeable` / `agg_kll_quantile_merge` / `ext_sim_ivf_topk`
and the new `ext_embedding_pca_invariants`), completing SCALE.md's
every-key-has-a-scale-point claim.

Derivation (into /tmp/r7_scale_x10; /root/testdata untouched):
- events 10x and embeddings 10x reuse the r6_scale_probe derivations
  (fresh user populations / jittered vector replicas).
- orders + lineitem 10x (new here): replica r offsets every order key
  by r * 10_000_000 (divisible by 32 and 16, so the probe keys'
  `% 32` / `% 16` sampling filters keep the same per-replica subset)
  AND shifts all dates by r * 20_000 days. The date shift keeps each
  replica's internal interval structure byte-identical while pushing
  replicas into disjoint 7-day band ranges — so
  `join_interval_overlap`'s true result grows 10x (one replica's
  pairs x10), not 100x (every replica's intervals colliding with
  every other's). Without the shift the OUTPUT is quadratic by
  problem definition and the probe would measure the data's pair
  volume, not the plan.

Warm walls (second run recorded) + bench anchor ratios. Output:
/root/repo/R7_SCALE.json + markdown rows for SCALE.md.

Usage: python tools/r7_scale_probe.py [--skip-build]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import streamingdemo_spark.extensions  # noqa: E402,F401
import streamingdemo_spark.plans  # noqa: E402,F401
import streamingdemo_spark.streaming.queries  # noqa: E402,F401
from streamingdemo_spark.registry import QUERIES  # noqa: E402
from streamingdemo_spark.session import get_spark  # noqa: E402

from bench import ANCHOR_KEYS, _anchor_ratios  # noqa: E402
from tools.r6_scale_probe import (  # noqa: E402 — shared derivations
    replicate_embeddings,
    replicate_events,
    warm_wall,
)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/r7_scale_x10"
REPLICAS = 10
KEY_OFFSET = 10_000_000  # % 32 == % 16 == 0: preserves sampling filters
DAY_SHIFT_US = 20_000 * 86_400_000_000  # 20k days in microseconds

# CONSTRAINT: the 10x build offsets orders.o_custkey by r*KEY_OFFSET
# per replica but symlinks customer UNSCALED, so replicas r>0 reference
# customers that don't exist. Harmless for the keys below (none joins
# orders to customer) — but any added key that does would silently see
# a 90%-empty join; replicate customer with the matching offset first
# (the sf1_differential build does) before adding such a key.
KEYS = [
    "stream_chained_windows",
    "agg_markov_transitions",
    "join_interval_overlap",
    "agg_hll_mergeable",
    "agg_kll_quantile_merge",
    "ext_sim_ivf_topk",
    "ext_embedding_pca_invariants",
    "src_txn_log_time_travel",
    "ext_quality_gopher_rules",
]


def build() -> None:
    os.makedirs(DST, exist_ok=True)
    # events + embeddings 10x: the r6 probe's derivations, imported
    replicate_events(SRC, DST, REPLICAS, KEY_OFFSET)
    replicate_embeddings(SRC, DST, REPLICAS)

    # orders + lineitem 10x: key offset + disjoint date ranges
    o = pq.read_table(os.path.join(SRC, "orders.parquet"))
    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    o_date = o["o_orderdate"].cast(pa.int64()).to_numpy()
    l_date = li["l_shipdate"].cast(pa.int64()).to_numpy()
    oparts, lparts = [], []
    for r in range(REPLICAS):
        oc = {n: o[n] for n in o.column_names}
        oc["o_orderkey"] = pa.array(
            o["o_orderkey"].to_numpy() + r * KEY_OFFSET, pa.int64()
        )
        oc["o_custkey"] = pa.array(
            o["o_custkey"].to_numpy() + r * KEY_OFFSET, pa.int64()
        )
        oc["o_orderdate"] = pa.array(o_date + r * DAY_SHIFT_US).cast(
            pa.timestamp("us")
        )
        oparts.append(pa.table(oc))
        lc = {n: li[n] for n in li.column_names}
        lc["l_orderkey"] = pa.array(
            li["l_orderkey"].to_numpy() + r * KEY_OFFSET, pa.int64()
        )
        lc["l_shipdate"] = pa.array(l_date + r * DAY_SHIFT_US).cast(
            pa.timestamp("us")
        )
        lparts.append(pa.table(lc))
    pq.write_table(pa.concat_tables(oparts), os.path.join(DST, "orders.parquet"))
    pq.write_table(pa.concat_tables(lparts), os.path.join(DST, "lineitem.parquet"))

    # documents 10x: plain id-offset replicas (no KEYS entry here is
    # dup-structure-sensitive; the cipher derivation lives in the r6
    # probe for those)
    dt = pq.read_table(os.path.join(SRC, "documents.parquet"))
    dparts = []
    for r in range(REPLICAS):
        dc = {n: dt[n] for n in dt.column_names}
        dc["doc_id"] = pa.array(
            dt["doc_id"].to_numpy() + r * KEY_OFFSET, pa.int64()
        )
        dparts.append(pa.table(dc))
    pq.write_table(
        pa.concat_tables(dparts), os.path.join(DST, "documents.parquet")
    )

    # small dims referenced by load_tables callers: symlink unscaled
    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)


if __name__ == "__main__":
    spark = get_spark(app_name="r7-scale-probe")
    if "--skip-build" not in sys.argv or not os.path.isdir(DST):
        t0 = time.perf_counter()
        build()
        print(f"built {DST} in {time.perf_counter() - t0:.1f}s")

    QUERIES["src_parquet_scan"](spark, SRC).collect()
    anchor_walls = {}
    for key in ANCHOR_KEYS:
        anchor_walls[key], _ = warm_wall(spark, key, SRC)
    anchors = _anchor_ratios(anchor_walls, 0.1)

    out: dict = {"sf": "0.1 -> 10x", "anchors": anchors, "keys": {}}
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
    (REPO / "R7_SCALE.json").write_text(json.dumps(out, indent=1))
    print(f"anchors: {anchors} (median {out.get('anchor_median')})")
    spark.stop()
