"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All keys live in ``streamingdemo_spark.registry``; importing the
plans/streaming/extensions packages populates it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import streamingdemo_spark.plans  # noqa: F401  (registers plan keys)

try:  # streaming + extension keys land in later build steps
    import streamingdemo_spark.streaming.queries  # noqa: F401
except ImportError:
    pass
try:
    import streamingdemo_spark.extensions  # noqa: F401
except ImportError:
    pass

from streamingdemo_spark.registry import ORACLES, QUERIES

# Driver check order. The round-1 verify budget ran out after 50 keys
# (registration order), leaving 77 keys without a hard-signal row, so
# the dict is returned in an explicit priority order instead: the two
# round-1 FAILs first (now fixed), then the three latent same-bug keys,
# then every not-yet-checked key cheapest-first (measured wall at
# sf0.01), and the 48 already-proven keys last. Whatever budget exists
# covers new ground before re-proving old ground.
DRIVER_ORDER = [
    "stream_stream_join",
    "agg_percentile", "agg_collect_sorted", "fn_split_array",
    "fn_map", "ext_text_fingerprint",
    # round-2 additions, never driver-checked — run before proven keys
    "ext_ngram_stats", "ext_length_bucket", "ext_chunk_dedup",
    "ext_doc_shuffle", "agg_median_mode", "subq_lateral",
    "set_intersect_all", "ext_embedding_health", "ext_label_balance",
    "stream_sliding", "agg_corr", "ext_dedup_containment",
    "ext_quality_prune", "join_fuzzy",
    "ext_curation_pipeline", "ext_sim_knn_join",
    "ext_doc_chunking", "ext_vocab_coverage",
    "ext_quality_score", "ext_dedup_cross_source",
    "win_ntile",
    "ext_contamination_check",
    "ext_repetition_filter", "ext_embedding_quantize", "sort_limit_topk",
    "fn_hash", "ext_pii_redact", "ext_text_normalize",
    "set_union_all", "fn_explode", "fn_posexplode",
    "fn_struct", "fn_timestamp", "fn_url",
    "ext_token_count", "ext_train_mix", "fn_date",
    "fn_cast", "fn_bitwise", "subq_scalar",
    "fn_regex", "fn_cond", "fn_json",
    "ext_text_quality", "win_first_last", "ext_seq_pack",
    "sort_multi", "subq_exists_corr", "win_time_tumbling",
    "win_dist", "subq_in", "set_except",
    "fn_array_hof", "fn_math", "ext_text_tokens",
    "win_topk_group", "ext_text_stats", "udtf_apply_in_pandas",
    "snk_merge_upsert", "udaf_pandas_agg", "set_intersect",
    "ext_dedup_exact", "ext_multimodal_struct", "win_moving",
    "win_range_frame", "set_except_all", "ext_sim_cosine_topk",
    "win_time_sliding", "ext_sample_stratified", "stream_kafka_smoke",
    "win_sessionize", "set_union_distinct", "udf_pandas_scalar",
    "ext_multimodal_framesample", "cte_with", "ext_dedup_ngram_jaccard",
    "ext_text_tfidf", "ext_multimodal_decode", "ext_text_langid",
    "join_dpp", "udf_scalar_py", "snk_partitioned_write",
    "ext_dedup_embedding", "fn_string", "join_bucketed",
    "stream_stream_static_join", "stream_foreach_batch", "ext_dedup_minhash",
    "stream_dedup", "ext_sim_ann_lsh", "ext_dedup_simhash",
    "stream_rate_smoke", "stream_stateful_custom", "stream_tumbling",
    "stream_session", "ext_sim_ivf_topk", "stream_watermark_late",
    "ext_dedup_cluster", "proj_select", "proj_rename_drop",
    "flt_in_between_like", "flt_compare", "flt_null",
    "dedup_distinct", "agg_histogram", "join_cross",
    "agg_having", "agg_conditional", "join_anti",
    "agg_minmax_by", "win_row_number", "flt_boolean",
    "agg_global", "join_semi", "src_json_scan",
    "agg_grouping_sets", "agg_unpivot", "win_running",
    "proj_withcolumn", "join_right", "win_lag_lead",
    "join_where_theta_equi", "agg_pivot", "join_inner",
    "join_broadcast", "agg_stats", "win_rank",
    "join_left", "agg_cube", "agg_rollup",
    "agg_count_distinct", "join_full", "agg_skew_salted",
    "agg_groupby", "src_csv_scan", "src_orc_scan",
    "src_parquet_scan", "agg_approx_distinct", "join_multikey",
    "join_asof", "src_view_scan", "join_star3",
    "snk_ctas", "join_theta_range", "snk_parquet_write",
    "flagship_q3",
]


def _ordered(mapping: dict) -> dict:
    """Reorder a registry dict by DRIVER_ORDER; unknown keys keep their
    registration order at the end (safety for keys added later)."""
    out = {k: mapping[k] for k in DRIVER_ORDER if k in mapping}
    out.update({k: v for k, v in mapping.items() if k not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q3 shape) on /root/testdata/sf0.001."""
    return QUERIES["flagship_q3"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator key from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle=Y key."""
    return _ordered(ORACLES)
