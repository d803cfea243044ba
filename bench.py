#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line to stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], times each end-to-end (plan + execute +
drain), prints ONE COMPACT final line::

    {"metric": "...", "value": <total_sec>, "unit": "sec", "sf": ...,
     "n_queries": N, "queries": {name: sec, ...},
     "anchor_median": ..., "full_artifact": "BENCH_FULL_r{N}.json"}

The per-query dict rides ON the line (driver contract; 2-decimal
walls + compact separators keep the line inside the driver's
2000-char tail-capture window — see _final_line). Full-precision
walls, anchors, box metadata and the registry-wide wall pass go to
the BENCH_FULL_r{N}.json sidecar.

Headline set: one representative per operator family, weighted toward
the scale-critical paths (fact-table agg, star join, window, dedup,
similarity, streaming replay).
"""

from __future__ import annotations

import json
import os
import sys
import time

def _drain(df) -> int:
    """Materialize every output column and return the row count.

    A bare ``df.count()`` lets Catalyst prune columns the count doesn't
    reference, so projection/UDF-shaped keys (udf_pandas_scalar,
    ext_text_quality, ext_seq_pack) would under-measure: hashing all
    columns per row before aggregating forces full execution while
    keeping the driver transfer to a single row.
    """
    from pyspark.sql import functions as F

    row = (
        df.select(F.xxhash64(*df.columns).alias("h"))
        # bit_xor, not sum: summing 64-bit hashes overflows long under
        # ANSI mode; xor is order-insensitive and cannot overflow
        .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("s"))
        .collect()[0]
    )
    return row["n"]


HEADLINE = [
    "flagship_q3",        # 3-way join + agg + top-k
    "flagship_q5",        # 6-table region-filtered revenue
    "agg_groupby",        # TPC-H Q1 fact-table aggregate
    "agg_skew_salted",    # two-phase salted aggregation
    "join_star3",         # 5-table star join
    "join_asof",          # as-of window emulation
    "win_topk_group",     # partitioned window top-k
    "win_sessionize",     # lag-gap batch sessionization
    "agg_count_distinct", # distinct shuffle
    "sort_limit_topk",    # global top-k
    "subq_exists_corr",   # decorrelated semi-join
    "win_time_tumbling",  # time windows (batch)
    "stream_tumbling",    # real micro-batched stream
    "ext_dedup_exact",    # hash dedup
    "ext_dedup_minhash",  # MinHash LSH
    "ext_chunk_dedup",    # sub-document chunk dedup
    "ext_curation_pipeline", # composed curation job
    "ext_sim_cosine_topk",# brute-force ANN baseline
    "ext_sim_ann_lsh",    # bucketed ANN scale path (oracle-checked)
    "ext_sim_knn_join",   # blocked-GEMM kNN graph
    "ext_text_tfidf",     # token explode + joins
    "ext_text_quality",   # scan-pass quality metrics
    "ext_seq_pack",       # context-window packing
    "udf_pandas_scalar",  # Arrow UDF path
    # round-3 additions
    "join_range_banded",  # big-big interval join via banding
    "join_skew_salted",   # salted shuffle join over a hot key
    "ext_unigram_surprisal",  # corpus-LM quality signal
    "ext_doc_shuffle_sharded",  # production epoch shuffle
    "ext_dedup_url",      # URL-canonicalization dedup
    "ext_graph_pagerank", # iterative join+agg loop (checkpointed)
    "ext_ts_resample",    # time spine + gap fill + forward fill
    "ext_sim_ivf_assign", # broadcast-codebook cell assignment
    # round-4 additions
    "flagship_q18",       # aggregate-driven semi-filter + broadcast hot set
    "stream_stream_outer_join",  # watermarked outer join w/ flush sentinels
    "agg_percentile_exact",      # exact nearest-rank percentiles
    "flagship_q7",        # disjunctive nation-pair pruning
    "ext_sim_rrf",        # BM25 + cosine hybrid rank fusion
    "ext_multimodal_phash_dedup",  # Arrow binary phash + banded LSH
    "ext_bpe_train",      # iterative vocab-bounded merge loop
    # round-4 TPC-H sweep additions
    "flagship_q1",        # pricing summary: map-side-combine showcase
    "flagship_q6",        # all-pushed scan-filter-aggregate
    "flagship_q21",       # correlated EXISTS/NOT EXISTS triple fact pass
    "ext_dedup_substring",  # exact duplicated-span detection
    # round-5 additions
    "ext_sim_rrf_ann",    # candidate-bounded hybrid fusion (production RRF)
    # round-6 additions
    "stream_dedup_substring",  # winnowed substring dedup as a stream
    "ext_dsir_weights",   # DSIR importance weights (hashed-LM broadcast)
    "ext_sim_pq_adc",     # PQ codes + ADC + exact re-rank serving path
    "ext_dedup_setjoin",  # exact prefix-filtered set-similarity join
    "ext_semdedup",       # cluster-scoped semantic dedup (per-cell matmul)
    "ext_retrieval_metrics",  # index-vs-exact IR eval harness
    "ext_coreset_kcenter",    # k-scan farthest-point selection chain
    "ext_cluster_kmeans",     # deterministic Lloyd rounds (IVF fit shape)
    "ext_bootstrap_ci",       # one-pass Poisson bootstrap CI
    # round-8 additions
    "src_txn_log_incremental",     # commit-log stream + delta side-reads
    "stream_quality_gopher_gate",  # stateless quality screen per micro-batch
    # round-9 additions
    "snk_txn_log_rebase",          # conflict-detect + rebase COW merge
    "snk_txn_log_stream_commit",   # exactly-once foreachBatch epoch commit
    "snk_txn_log_pipeline",        # log-to-log transactional ETL end-to-end
    "ext_compression_invariants",  # zlib codec-contract Arrow projection
    # round-10 additions
    "snk_txn_log_compact",         # OPTIMIZE-as-commit + writer race rebase
    "snk_txn_log_multiwriter",     # 3-writer validate->rebase->retry pile-up
    "snk_txn_log_zorder",          # Morton clustering + 2-D stats prune
    "snk_txn_log_incr_mv",         # CDF-driven incremental view maintenance
    "src_txn_log_bloom_prune",     # per-file bloom index point lookup
    # round-11 additions
    "ext_label_noise_ann",         # ANN-graph label screen (production path)
    "ext_dedup_embedding",         # data-derived band width + bucket cap
    "stream_dedup_embedding",      # streaming LSH index maintenance
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")

    import __spark_entry__ as entry_mod
    from streamingdemo_spark.session import get_spark

    spark = get_spark(app_name="streamingdemo-bench")
    queries = entry_mod.queries()

    # Warm the JVM/codegen/broadcast machinery once so per-query numbers
    # measure the engine, not first-touch initialization.
    queries["src_parquet_scan"](spark, sf_dir).collect()
    queries["join_broadcast"](spark, sf_dir).collect()
    # Warm the Python-worker machinery the same way: fork one worker
    # per core, import pandas/numpy, and write one ~16 MB numpy buffer
    # per worker so each worker's malloc arena is faulted once up
    # front (session.py pins the arena so those pages are then kept).
    # Without this the FIRST UDF-bearing key's rep 1 measures worker
    # birth + kernel first-touch (5-10 s on first-touch-expensive
    # kernels), not the engine; no query logic runs here and nothing
    # is cached — the warmup output is discarded.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _touch(s):
        import numpy as np

        arena = np.arange(2_000_000, dtype=np.int64)  # fault ~16 MB
        return s * int(arena[0] + 1)

    n_cores = spark.sparkContext.defaultParallelism
    spark.range(n_cores * 4, numPartitions=n_cores).select(
        _touch("id")
    ).collect()

    timings: dict[str, float] = {}
    for key in HEADLINE:
        walls, n = [], 0
        # best-of-2: micro-batch scheduling and first-touch codegen add
        # seconds of run-to-run noise at this scale; the minimum is the
        # reproducible engine cost. The cache is cleared per rep so ops
        # that persist intermediates (LSH signatures) are measured cold.
        # ANCHOR keys get a third rep and use the MEDIAN instead: their
        # walls are sub-second, where scheduler jitter is a large
        # fraction of the wall and a min-of-2 can masquerade noise as
        # cross-round drift (r11's 1.24-1.31 uniform anchor inflation
        # was box speed, but the artifact couldn't show it; switched in
        # r12, so anchor ratios vs the r11 min-of-2 walls may read a
        # few percent high — that is the named cause).
        reps = 3 if key in ANCHOR_KEYS else 2
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = queries[key](spark, sf_dir)
            n = _drain(df)
            walls.append(time.perf_counter() - t0)
        walls.sort()
        timings[key] = round(
            walls[len(walls) // 2] if key in ANCHOR_KEYS else walls[0], 3
        )
        print(f"# {key}: {timings[key]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(timings),
    }
    # Anchor walls + box metadata travel IN the artifact so a
    # cross-round comparison can normalize mechanically instead of
    # re-running old code (the r6->r7 similarity-family false alarm
    # cost a git-worktree A/B because the artifact carried no anchor).
    anchor_walls = {k: timings[k] for k in ANCHOR_KEYS if k in timings}
    import platform

    box = {
        "cpus": os.cpu_count(),
        "spark_cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "platform": platform.platform(),
        "python": platform.python_version(),
    }
    anchors = _anchor_ratios(timings, float(sf))
    if anchors:
        # Same-key wall ratio vs the previous round's recorded bench.
        # Absolute seconds vary up to ~2x between round VMs (fresh
        # instances), so a uniform anchor ratio != 1.0 is box speed,
        # not a regression — divide the headline by anchor_median to
        # compare rounds structurally.
        ratios = sorted(anchors.values())
        out["anchor_median"] = ratios[len(ratios) // 2]
        # the box-normalized headline the reader previously had to
        # compute by hand: raw wall divided by the box-speed estimate
        out["headline_normalized"] = round(
            total / out["anchor_median"], 3
        )
    # Registry-wide wall pass (r12 verdict #4): one Spark-only wall
    # per registry key at sf0.01, so a plan regression on a
    # NON-headline key surfaces as a bench delta instead of waiting
    # for an sf10 watchdog/byte-pin trip. Lives in the sidecar only.
    registry_walls, registry_truncated = _registry_walls(spark, queries)
    registry_flags = _registry_flags(registry_walls)

    # Full-precision walls, anchors, box metadata and the registry
    # pass go to the sidecar; the stdout line carries the per-query
    # dict the driver contract requires (see _final_line).
    full = dict(out)
    full["anchor_walls"] = anchor_walls
    full["box"] = box
    if anchors:
        full["anchors"] = anchors
    full["queries"] = timings
    full["registry_walls"] = registry_walls
    full["registry_walls_sf"] = 0.01
    full["registry_truncated"] = registry_truncated
    full["registry_flags_1p5x"] = registry_flags
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"BENCH_FULL_r{_current_round()}.json",
    )
    with open(sidecar, "w") as f:
        json.dump(full, f, indent=1)
    out["full_artifact"] = os.path.basename(sidecar)
    print(_final_line(out, timings))


# The driver's stdout capture keeps the LAST 2000 characters of the
# run's output (measured: every recorded BENCH_r*.json "tail" is
# exactly 2000 chars), so the one final JSON line must fit in that
# window or its HEAD gets cut and the driver records `parsed: null`
# (that is what happened to round 9, whose line carried 3-decimal
# walls plus anchors plus box metadata). Rounds 10-13 moved the
# per-query dict to the sidecar to stay small — but the driver
# contract requires `"queries": {name: sec}` ON the line, and without
# it the driver's per-query comparison and 8-core scaling measurement
# both come back empty (PERF_r13.json: n_common 0, per_query {},
# prev/now_bench_ok false). This restores `queries` while staying
# inside the window: compact separators, 2-decimal walls (the driver
# compares per-key ratios; 10 ms quantization is far below run noise),
# anchors/box/full-precision walls live in the sidecar only.
_LINE_BUDGET = 2000


def _final_line(out: dict, timings: dict) -> str:
    minimal = {
        k: out[k]
        for k in ("metric", "value", "unit", "sf", "queries", "full_artifact")
        if k in out
    }
    for fields in (dict(out), minimal):
        for ndigits in (2, 1, 0):
            fields["queries"] = {
                k: (int(round(v)) if ndigits == 0 else round(v, ndigits))
                for k, v in timings.items()
            }
            line = json.dumps(fields, separators=(",", ":"))
            if len(line) <= _LINE_BUDGET - 60:  # slack: newline + jitter
                return line
    return line  # physically cannot fit; emit the minimal form anyway


# Stable, untouched-by-design keys used to estimate box speed relative
# to the previous round's recorded bench (they span scan/join/agg/
# window/sort, so a uniform shift is the VM, not the engine).
ANCHOR_KEYS = [
    "flagship_q3", "agg_groupby", "join_star3",
    "win_topk_group", "sort_limit_topk",
]


def _round_of(path: str) -> int:
    import re

    return int(re.search(r"r(\d+)", os.path.basename(path)).group(1))


def _registry_walls(
    spark, queries, budget_sec: float = 420.0
) -> tuple[dict, bool]:
    """One warm-session Spark-only wall per registry key at sf0.01 —
    cheap cross-round drift coverage for the ~300 keys outside the
    headline set (the headline measures the scale-critical paths at
    sf0.1 with reps; this pass trades precision for COVERAGE: a plan
    regression that doubles a key's wall is visible even when the key
    is sub-second). No oracle, one rep, cache cleared per key so
    memoizing keys measure their own pipeline. Deterministic key
    order; a hard time budget bounds the driver's bench step, and
    hitting it is recorded loudly (``registry_truncated``) rather than
    silently narrowing coverage. A key that raises records ``null`` —
    visible in the artifact, not skipped."""
    sf_dir = "/root/testdata/sf0.01"
    walls: dict[str, float | None] = {}
    t_start = time.perf_counter()
    truncated = False
    for key in sorted(queries):
        if time.perf_counter() - t_start > budget_sec:
            truncated = True
            print(
                f"# registry walls truncated at {len(walls)}/"
                f"{len(queries)} keys (budget {budget_sec}s)",
                file=sys.stderr,
            )
            break
        try:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _drain(queries[key](spark, sf_dir))
            walls[key] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # visible in the artifact, not silent
            print(f"# registry wall ERROR {key}: {exc}", file=sys.stderr)
            walls[key] = None
    return walls, truncated


def _registry_flags(walls: dict) -> list:
    """Keys whose sf0.01 wall grew >= 1.5x vs the newest prior round's
    registry pass AND by more than 0.5 s absolute (sub-second keys
    jitter by scheduler noise; a flag must mean real growth). Sorted
    worst-first as (key, prev_sec, now_sec) triples."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prev: dict = {}
    for path in sorted(
        glob.glob(os.path.join(here, "BENCH_FULL_r*.json")),
        key=_round_of,
        reverse=True,
    ):
        if _round_of(path) >= _current_round():
            continue
        try:
            doc = json.load(open(path))
        except (OSError, ValueError):
            continue
        if doc.get("registry_walls"):
            prev = doc["registry_walls"]
            break
    flags = [
        (k, prev[k], walls[k])
        for k in walls
        if walls.get(k) and prev.get(k)
        and walls[k] >= 1.5 * prev[k] and walls[k] - prev[k] > 0.5
    ]
    return sorted(flags, key=lambda t: -(t[2] / t[1]))


def _current_round() -> int:
    """This bench run's round number: one past the newest recorded
    BENCH_r{N}.json (the driver records round N's artifact before
    round N+1 starts). Overridable for ad-hoc runs so a local rerun
    doesn't clobber nothing / the wrong sidecar."""
    import glob

    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [_round_of(p) for p in glob.glob(os.path.join(here, "BENCH_r*.json"))]
    return (max(rounds) + 1) if rounds else 1


def _anchor_ratios(timings: dict[str, float], sf: float) -> dict[str, float]:
    """Per-anchor wall ratio vs the newest prior artifact that carries
    per-query walls. Prior rounds' walls live either in the recorded
    BENCH_r{N}.json (rounds ≤9 put `queries` on the stdout line) or in
    the BENCH_FULL_r{N}.json sidecar (round ≥10 emission); scan both,
    newest round first."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    candidates = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json"))
        + glob.glob(os.path.join(here, "BENCH_FULL_r*.json")),
        key=_round_of,
        reverse=True,
    )
    for path in candidates:
        if _round_of(path) >= _current_round():
            continue  # never compare against this run's own sidecar
        try:
            doc = json.load(open(path))
        except (OSError, ValueError):
            continue
        # the driver wraps the emitted JSON line under "parsed"; accept
        # the raw line shape, the recorded-artifact shape, and sidecars
        parsed = doc if "queries" in doc else (doc.get("parsed") or {})
        prev = parsed.get("queries") or {}
        if not prev:
            continue
        # ratios only mean "box speed" when both runs used the same scale
        if parsed.get("sf") != sf:
            return {}
        return {
            k: round(timings[k] / prev[k], 3)
            for k in ANCHOR_KEYS
            if k in timings and k in prev and prev[k] > 0
        }
    return {}


if __name__ == "__main__":
    main()
