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


# Evidence-driven ordering, round 8: the external driver cross-checks the
# FIRST 50 registered queries each round.  CORRECTNESS_r07 landed all 50
# of the round-7 window green, so cumulative driver coverage stands at
# 280/293 with the 13 round-7 session additions never sampled -- the
# round-7 verdict's item 2 says fill the round-8 window with those 13
# plus the stalest r1-r3 greens, prioritizing churn.  Composition:
# the 13 never-sampled; the three queries whose PLAN changed this round
# (similarity_knn_graph moved to the integer-exact two-level assignment
# with a rewritten oracle, sample_dsir_importance moved to the
# single-scan cached-bucket-array shape, stream_upsert_foreachbatch
# gained the idempotent-redelivery marker -- their prior evidence
# describes code that no longer exists); the whole r1/r2-last-green
# cohort (1 + 31 queries: the TPC-H/relational/window/scan/text
# singles); and three r3 picks from the families the round-7 verdict
# names as most churned (multimodal decode, sketch, sink).
# Ordering within the 50: most failure-prone first (the Arrow-stage and
# iterative time-series singles), the changed-this-round trio next so a
# truncation still covers them, the broad r2 cohort, slowest re-pins at
# the tail.
_EVIDENCE_PRIORITY = (
    # -- never-sampled: round-7 additions, most failure-prone first --
    "multimodal_audio_fingerprint",
    "events_hmm_viterbi",
    "events_stl_decompose",
    "events_anomaly_stl_residual",
    "events_forecast_holt_winters",
    "events_theil_sen",
    "events_offpolicy_ips",
    "graph_betweenness_sampled",
    "dedup_simhash_blocks",
    "similarity_sq8_recall",
    "sample_neyman_allocation",
    "text_chunk_semantic",
    "sample_dsir_importance",
    # -- re-pins: plan changed THIS round --
    "similarity_knn_graph",
    "stream_upsert_foreachbatch",
    # -- re-pins: the r1/r2-last-green cohort (stalest first) --
    "dedup_exact_normalized",
    "flagship_events_enriched",
    "filter_pushdown_scan",
    "q3_shipping_priority",
    "asof_join_purchase_click",
    "range_join_user_events",
    "join_semi_anti_customers",
    "join_sortmerge_order_fulfilment",
    "agg_cube_order_status",
    "agg_grouping_sets_orders",
    "agg_salted_skew_user",
    "window_topn_orders_per_customer",
    "window_running_customer_spend",
    "pivot_daily_event_types",
    "unpivot_daily_event_types",
    "sort_topk_lineitems",
    "set_ops_nations",
    "subquery_orders_above_cust_avg",
    "sample_stratified",
    "string_funcs_parts",
    "date_funcs_order_calendar",
    "array_funcs_order_lines",
    "map_funcs_event_props",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "json_keys_profile",
    "json_ndv_profile",
    "text_top_terms_per_lang",
    "text_fingerprint",
    "text_pii_redact",
    "text_gopher_quality",
    "text_decontaminate",
    # -- re-pins: r3 picks from the most-churned families --
    "multimodal_decode_features",
    "sketch_theta_intersection",
    "sink_merge_upsert",
)
# ROUND-9 EVIDENCE TODO (checked below so a rename/removal cannot
# silently desynchronize it from the registry): if CORRECTNESS_r08 lands
# this window green, cumulative coverage reaches 293/293 and the stalest
# remaining cohort is the r3-last-green remainder -- fill the round-9
# window with it (45 queries + 5 slots for whatever churns in round 8).
_ROUND9_EVIDENCE_TODO = (
    "dedup_incremental",
    "dedup_ngram_prefix",
    "dedup_semantic",
    "dedup_winnow_spans",
    "events_rollup_hll",
    "join_salted_skew_events",
    "multimodal_catalog",
    "multimodal_image_resize",
    "multimodal_video_frame_sample",
    "pack_token_shards",
    "pipeline_clean_corpus",
    "q10_returned_items",
    "q14_promo_revenue",
    "sample_mixture_epochs",
    "scan_schema_evolution",
    "similarity_ivf_partitioned",
    "similarity_ivf_recall",
    "similarity_lsh_buckets",
    "similarity_lsh_recall",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_lsh",
    "sink_bucketed_join",
    "sink_compacted_events",
    "sink_ndjson_export",
    "sink_partitioned_events",
    "sketch_bloom_decontaminate",
    "sketch_cms_heavy_hitters",
    "sketch_histogram_quantiles",
    "sketch_hll_ndv",
    "sketch_kmv_ndv",
    "split_train_valid_test",
    "stream_dedup_watermarked",
    "stream_hll_distinct_users",
    "stream_sessionize_batch",
    "stream_sessionize_stateful",
    "stream_sliding_window",
    "stream_sliding_window_batch",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_tumbling_window",
    "stream_tumbling_window_batch",
    "text_bm25_topk",
    "udaf_median_value",
    "udtf_tokenize_positions",
)

_missing = [
    n
    for n in _EVIDENCE_PRIORITY + _ROUND9_EVIDENCE_TODO
    if n not in REGISTRY
]
assert not _missing, f"evidence-priority names not in REGISTRY: {_missing}"
_ordered = {n: REGISTRY[n] for n in _EVIDENCE_PRIORITY}
_ordered.update((n, q) for n, q in REGISTRY.items() if n not in _ordered)
REGISTRY.clear()
REGISTRY.update(_ordered)
