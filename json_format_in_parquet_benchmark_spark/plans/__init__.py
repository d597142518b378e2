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


# Evidence-driven ordering, round 11: the external driver cross-checks
# the FIRST 50 registered queries each round.  CORRECTNESS_r10 landed
# 50/50 green (cumulative: all 293 entries green at their latest check).
# Changed plans outrank staleness (their old evidence describes dead
# code); this round that is 14 entries: the seven two-phase-helper
# consumers (the r11 null-contract fix + pack-shards fold churned every
# consumer's plan hash: customers_rfm_segments, events_interarrival_stats,
# parts_abc_pareto, dq_outlier_mad, pack_token_shards,
# multimodal_pack_shards, pipeline_multimodal_curation), the two new
# global-window conversions (events_uplift_deciles ntile -> two-phase
# rank + integer NTILE arithmetic; customers_gini_spend rank ->
# two-phase, verdict item 3), the rebalanced dynamic-partition sinks
# (similarity_ivf_partitioned + similarity_ivf_append + sink_gdpr_erasure
# + scan_partition_evolution, verdict items 1-2; similarity_ivf_recall
# rides along per the verdict's done-criterion though its plan is
# untouched).  Then the 9 deferred r4 singles (orders_market_basket +
# 8 TPC-H, the round-10 TODO), then 27 of the 45 r5-stale entries (the
# evidence-age ratchet, verdict item 8: the verdict-named four, the
# 11-query r5 TPC-H block, and 12 more; the slow composed ones sit at
# the tail so a truncated pass still covers everything cheap).  The 18
# r5 entries that do not fit are staged below as the round-12 TODO --
# after this round the stalest evidence is r5 with 18 entries left.
_EVIDENCE_PRIORITY = (
    # -- re-pins: plan changed THIS round (two-phase helper consumers) --
    "customers_rfm_segments",
    "events_interarrival_stats",
    "parts_abc_pareto",
    "dq_outlier_mad",
    "pack_token_shards",
    "multimodal_pack_shards",
    "pipeline_multimodal_curation",
    # -- re-pins: global-window conversions (verdict item 3) --
    "events_uplift_deciles",
    "customers_gini_spend",
    # -- re-pins: rebalanced dynamic-partition writes (items 1-2) --
    "similarity_ivf_partitioned",
    "similarity_ivf_append",
    "similarity_ivf_recall",
    "sink_gdpr_erasure",
    "scan_partition_evolution",
    # -- the 9 deferred r4 singles (round-10 TODO, verdict item 4) --
    "orders_market_basket",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q22_dormant_accounts",
    # -- r5-stale ratchet (verdict item 8): verdict-named four --
    "scan_ndjson",
    "json_path_get",
    "multimodal_phash_neardup",
    "format_roundtrip_jsonb_shredded",
    # -- r5-stale: the TPC-H block --
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q11_important_parts",
    "q12_ship_delay_priority",
    "q16_part_supplier_variety",
    "q19_disjunctive_revenue",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    # -- r5-stale: relational / dq / join / events --
    "agg_rollup_region_nation",
    "dq_fd_audit",
    "dq_k_anonymity",
    "dq_skew_profile",
    "events_heatmap_dow_hour",
    "join_bloom_prefilter",
    # -- r5-stale: dedup / embedding / graph (slow composed at the tail) --
    "dedup_minhash_recall",
    "embedding_gram_matrix",
    "graph_kcore_word",
    "embedding_pca_power",
    "graph_communities_trading",
    "pipeline_pretrain_corpus",
)
# ROUND-12 EVIDENCE TODO (registry-checked below): the 18 r5-stale
# entries the round-11 window could not fit, plus the one query ADDED in
# r11 (dedup_url_canonical -- seam-green at sf0.001/sf0.01 + hostile TZ
# this round, but with no driver evidence yet) -- fill the round-12
# window with them first, then whatever churns.  After that the stalest
# evidence is r6.
_ROUND12_EVIDENCE_TODO = (
    "dedup_url_canonical",
    "join_broadcast_region_revenue",
    "join_fuzzy_part_names",
    "json_variant_get",
    "orders_open_interval_sweep",
    "orders_seasonality_index",
    "profile_table_columns",
    "profile_token_zipf",
    "sample_language_temperature",
    "scan_xml_events",
    "similarity_matryoshka_recall",
    "sketch_histogram_rollup",
    "stream_late_data_dropped",
    "stream_session_window",
    "stream_session_window_batch",
    "text_adaptive_length_filter",
    "text_bpe_pair_counts",
    "text_chunk_overlap",
    "text_classifier_score",
)

_missing = [
    n
    for n in _EVIDENCE_PRIORITY + _ROUND12_EVIDENCE_TODO
    if n not in REGISTRY
]
assert not _missing, f"evidence-priority names not in REGISTRY: {_missing}"
_ordered = {n: REGISTRY[n] for n in _EVIDENCE_PRIORITY}
_ordered.update((n, q) for n, q in REGISTRY.items() if n not in _ordered)
REGISTRY.clear()
REGISTRY.update(_ordered)
