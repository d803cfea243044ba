"""Round-4 second-batch scale probes: the session's new keys at
sf0.01 vs sf0.1 (documents 10x, embeddings 4x). Methodology as
SCALE.md: warm the session, time a full drain per key per scale,
report the wall ratio next to the data ratio — a key is scale-clean
when wall grows no faster than its dominant input (or its candidate
volume, for the pair-generating dedup keys).

Usage: python tools/r4b_scale_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import streamingdemo_spark.plans  # noqa: E402,F401  (registers keys)
import streamingdemo_spark.extensions  # noqa: E402,F401
import streamingdemo_spark.streaming.queries  # noqa: E402,F401
from streamingdemo_spark.registry import QUERIES  # noqa: E402
from streamingdemo_spark.session import get_spark  # noqa: E402

KEYS = [
    # (key, dominant input at sf0.1 vs sf0.01)
    ("ext_text_bm25", "docs 10x"),
    ("ext_sim_rrf", "docs 10x + emb 4x"),
    ("ext_split_assign", "docs 10x"),
    ("flagship_q7", "lineitem 10x"),
    ("ext_multimodal_phash_dedup", "docs 10x (pairs grow with collisions)"),
    ("ext_bpe_train", "docs 10x (vocab sub-linear)"),
    ("ext_tokenize_apply", "docs 10x"),
    ("ext_sim_ivf_probe_topk", "emb 4x"),
    ("stream_incremental_agg", "events 10x (4 micro-batches)"),
    ("ext_lang_mix_temperature", "docs 10x"),
    ("snk_compaction", "orders 10x (64 -> 4 files)"),
    ("ext_ts_twa", "events 10x"),
    ("ext_emb_gram", "emb 4x (output fixed at d^2)"),
    ("join_asof_nearest", "events 10x"),
    ("subq_any_all", "supplier/customer 10x"),
    ("ext_ts_interp", "events 10x (spine fixed by time range)"),
]


def main() -> None:
    spark = get_spark(app_name="r4b-scale-probe")
    # warm codegen/broadcast machinery
    QUERIES["src_parquet_scan"](spark, "/root/testdata/sf0.01").collect()
    for key, note in KEYS:
        walls = {}
        rows = {}
        for sf in ("0.01", "0.1"):
            t0 = time.perf_counter()
            rows[sf] = QUERIES[key](spark, f"/root/testdata/sf{sf}").count()
            walls[sf] = time.perf_counter() - t0
        print(
            f"{key:30s} {walls['0.01']:6.2f}s -> {walls['0.1']:6.2f}s "
            f"(x{walls['0.1'] / walls['0.01']:.2f}) rows "
            f"{rows['0.01']} -> {rows['0.1']}  [{note}]"
        )
    spark.stop()


if __name__ == "__main__":
    main()
