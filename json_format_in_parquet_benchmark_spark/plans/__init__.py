"""Query plan registry: every operator the engine claims is registered here
with (a) a Spark DataFrame builder and (b) where SQL-expressible, the exact
DuckDB oracle the driver cross-checks at sf0.01.  Import the submodules for
their registration side effects."""

from .registry import REGISTRY, Query, register  # noqa: F401

# Registration side effects -- each module adds its queries to REGISTRY.
# ORDER MATTERS for the external driver (it samples the first 50 registered
# queries); the import order below is overridden by the explicit
# evidence-priority reorder at the bottom of this module.
from . import queries_json  # noqa: E402,F401
from . import queries_generator  # noqa: E402,F401
from . import queries_graph  # noqa: E402,F401
from . import queries_timeseries  # noqa: E402,F401
from . import queries_relational  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_search  # noqa: E402,F401
from . import queries_sketches  # noqa: E402,F401
from . import queries_similarity  # noqa: E402,F401
from . import queries_embedding_stats  # noqa: E402,F401
from . import queries_multimodal  # noqa: E402,F401
from . import queries_udf  # noqa: E402,F401
from . import queries_sinks  # noqa: E402,F401
from . import queries_streaming  # noqa: E402,F401
from . import queries_formats  # noqa: E402,F401
from . import queries_dedup  # noqa: E402,F401
from . import queries_pipeline  # noqa: E402,F401


# Evidence-driven ordering, round 9: the external driver cross-checks the
# FIRST 50 registered queries each round.  CORRECTNESS_r08 landed 50/50
# green, so cumulative coverage is 293/293 and the round-8 verdict's item
# 1 orders this round's window spent on evidence FRESHNESS: the 45
# queries whose most recent driver green is round 3 (the staged
# _ROUND9_EVIDENCE_TODO, now promoted wholesale), plus the three plans
# that CHANGED this round (stream_upsert_foreachbatch gained the
# torn-swap recovery path, similarity_knn_graph's kernel gained the
# zero-norm guard and the shared EQ_GRID constant, format_storage_metrics
# moved from rows-only to a real oracle over portable invariants; the
# jsonc tape moved its container entry counts from the f64 number pool
# into the opcode stream as int8 varints, changing format_roundtrip_jsonc
# and json_golden_probes_tape's encode stage; the shard packers moved
# from one-window-per-partition-key to the two-phase bucketed prefix sum,
# changing pack_token_shards, multimodal_pack_shards and
# pipeline_multimodal_curation; the exact-rank windows moved to the
# two-phase bucketed rank for the same reason, changing dq_outlier_mad
# too -- their prior evidence describes code that no longer exists).
# Changed plans outrank staleness, so with the window capped at 50 the
# three SAFEST r3-stale entries are deferred to lead the round-10 TODO:
# q10_returned_items and q14_promo_revenue (zero-churn TPC-H aggregate
# singles whose family re-pinned 100% green in round 8) and
# scan_schema_evolution (a mergeSchema scan single, unchanged since
# round 2) -- the least-risk postponements available.
# Ordering within the 50: the changed cohort first so a truncated pass
# still covers it, then the failure-prone Arrow/streaming/multimodal
# singles, the similarity/sketch/sink arms, the broad batch cohort, and
# the slow pipeline re-pins at the tail.
_EVIDENCE_PRIORITY = (
    # -- re-pins: plan or oracle changed THIS round --
    "stream_upsert_foreachbatch",
    "similarity_knn_graph",
    "format_storage_metrics",
    "format_roundtrip_jsonc",
    "json_golden_probes_tape",
    "pack_token_shards",
    "multimodal_pack_shards",
    "pipeline_multimodal_curation",
    "dq_outlier_mad",
    # -- r3-stale: streaming family (stateful/Arrow stages first) --
    "stream_sessionize_stateful",
    "stream_dedup_watermarked",
    "stream_hll_distinct_users",
    "stream_stream_join",
    "stream_static_enrich",
    "stream_sliding_window",
    "stream_tumbling_window",
    "stream_sessionize_batch",
    "stream_sliding_window_batch",
    "stream_tumbling_window_batch",
    # -- r3-stale: multimodal / UDF / UDTF Arrow surfaces --
    "multimodal_catalog",
    "multimodal_image_resize",
    "multimodal_video_frame_sample",
    "udaf_median_value",
    "udtf_tokenize_positions",
    # -- r3-stale: similarity arms --
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_lsh_buckets",
    "similarity_lsh_recall",
    "similarity_ivf_partitioned",
    "similarity_ivf_recall",
    # -- r3-stale: sketches --
    "sketch_hll_ndv",
    "sketch_kmv_ndv",
    "sketch_cms_heavy_hitters",
    "sketch_bloom_decontaminate",
    "sketch_histogram_quantiles",
    # -- r3-stale: sinks --
    "sink_partitioned_events",
    "sink_compacted_events",
    "sink_bucketed_join",
    "sink_ndjson_export",
    # -- r3-stale: batch cohort --
    "events_rollup_hll",
    "join_salted_skew_events",
    "split_train_valid_test",
    "sample_mixture_epochs",
    "text_bm25_topk",
    "dedup_incremental",
    "dedup_ngram_prefix",
    "dedup_semantic",
    "dedup_winnow_spans",
    # -- slow r3-stale re-pin at the tail --
    "pipeline_clean_corpus",
)
# ROUND-10 EVIDENCE TODO (registry-checked below): with the round-9
# window above green, every query's most recent driver green is r4+ and
# the stalest cohort is the three r3-greens deferred above plus the
# whole r4-last-green set (49 queries).  Fill the round-10 window with
# these 52 minus slots for whatever churns in round 9.
_ROUND10_EVIDENCE_TODO = (
    # deferred from the round-9 window (see above) -- re-pin FIRST
    "q10_returned_items",
    "q14_promo_revenue",
    "scan_schema_evolution",
    # the r4-last-green cohort
    "aqp_sampled_revenue",
    "dedup_substring_exact",
    "dedup_substring_remove",
    "dq_fd_repair",
    "dq_validate_suite",
    "events_anomaly_zscore",
    "events_cusum_changepoints",
    "events_gapfill_locf",
    "events_markov_transitions",
    "events_moving_average",
    "events_top_paths",
    "events_user_trend_ols",
    "graph_pagerank_trading",
    "graph_triangle_count",
    "multimodal_audio_chunks",
    "multimodal_clip_pairing",
    "orders_market_basket",
    "parts_abc_pareto",
    "parts_skyline_cheap_small",
    "pipeline_contamination_sweep",
    "profile_length_histogram",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q22_dormant_accounts",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "sample_domain_cap",
    "sample_weighted_priority",
    "scan_csv_events",
    "scan_ndjson_corrupt",
    "scan_orc_events",
    "scd2_customer_priority",
    "search_hybrid_rrf",
    "search_rerank_proximity",
    "similarity_hard_negatives",
    "similarity_ivf_append",
    "similarity_ivfpq_topk",
    "similarity_pq_topk",
    "sink_backfill_partition",
    "sink_zorder_events",
    "table_diff_snapshots",
    "text_bpe_encode_corpus",
    "text_bpe_train_merges",
    "text_char_bigram_lm",
    "text_keyword_pagerank",
    "window_ntile_deciles",
)

_missing = [
    n
    for n in _EVIDENCE_PRIORITY + _ROUND10_EVIDENCE_TODO
    if n not in REGISTRY
]
assert not _missing, f"evidence-priority names not in REGISTRY: {_missing}"
_ordered = {n: REGISTRY[n] for n in _EVIDENCE_PRIORITY}
_ordered.update((n, q) for n, q in REGISTRY.items() if n not in _ordered)
REGISTRY.clear()
REGISTRY.update(_ordered)
