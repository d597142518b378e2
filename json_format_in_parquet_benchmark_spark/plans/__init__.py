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


# Evidence-driven ordering, round 6: the external driver cross-checks the
# FIRST 50 registered queries each round.  After round 5, 202 of 261
# round-5 registry entries hold a cumulative driver CORRECTNESS row; 59
# never appeared in a driver sample, and round 6 adds two queries the
# verdict explicitly wants driver-pinned (the strided substring census --
# the 100 TB form -- and the planted-duplicate recall harness).  61
# candidates > 50 slots, so 11 are deferred to round 7, chosen as the
# LOWEST-RISK residue per the round-5 verdict's ranking ("rank by
# failure-proneness ... then the dq_* set"): five dq_* single-scan
# aggregates (benford, referential-integrity, outlier-MAD, drift-chisq,
# l-diversity) and six simple grouped/windowed aggregates whose plan
# families already have multiple driver-green members (HHI, Gini,
# DAU/WAU, time-to-activation, cohort-LTV, KPI-decomposition).  All 11
# stay green under the local driver-faithful gate
# (tests/test_oracle_parity.py parametrizes the full registry).
# Ordering within the 50: the most failure-prone first -- the custom
# Python streaming source/sink trio and the other stateful streaming
# plans, then API-exotic surfaces (lateral/TABLE-arg UDTF, observe(),
# RANGE frame, shredded-scan pushdown, snapshot time travel, the pyds
# batch scanner), then the round-6 additions, then everything else with
# the slowest (MMR, RAG pipeline, containment, planted recall) parked at
# the window's tail so a budget truncation costs the least evidence.
_EVIDENCE_PRIORITY = (
    # -- custom Python streaming source + sink (most failure-prone) --
    "stream_pyds_replay",
    "stream_pyds_ndjson_sink",
    # -- other never-sampled streaming plans --
    "stream_parquet_file_sink",
    "stream_topk_heavy_hitters",
    "stream_lsh_dedup_gate",
    # -- API-exotic surfaces --
    "udtf_event_streaks",
    "window_range_frame",
    "format_scan_shredded_pushdown",
    "sink_snapshot_time_travel",
    "scan_pyds_ndjson_ranges",
    "scan_ndjson_gzip",
    "scan_footer_stats_manifest",
    "dq_observe_inflight",
    "sink_parquet_bloom_lookup",
    "sink_gdpr_erasure",
    "sink_inverted_index",
    "json_paths_census",
    # -- round-6 additions (verdict items 2 and 5) --
    "dedup_substring_strided",
    "generator_documents_planted",
    # -- graph family --
    "graph_bfs_distance",
    "graph_link_prediction",
    "graph_random_walks",
    # -- forecasting / time-series --
    "events_forecast_ses",
    "events_forecast_holt",
    "events_autocorr",
    "orders_backtest_naive",
    "events_bitmap_retention",
    # -- experimentation family --
    "events_ab_welch_ttest",
    "events_ab_cuped",
    "events_ab_srm_check",
    "events_bootstrap_ci",
    "events_uplift_deciles",
    "events_funnel_exclusion",
    "events_attribution_lasttouch",
    "events_sankey_paths",
    # -- joins / sampling / embeddings --
    "join_spatial_grid",
    "join_entity_resolution",
    "sample_stratified_exact",
    "sample_coreset_kcenter",
    "similarity_range_radius",
    "embedding_norms_arrow",
    # -- text analysis --
    "text_novelty_curve",
    "text_tf_cosine_pairs",
    "text_collocations_pmi",
    "text_term_burstiness",
    # -- slow tail (slots 45-50): inside the window, costs the least if
    #    the driver's budget truncates --
    "search_mmr_diversify",
    "dedup_repeated_segments",
    "dedup_containment_pairs",
    "pipeline_rag_ingest",
    "dedup_planted_recall",
    # ---- past the 50-slot window: the 11 deferred to round 7, first in
    #      line next reorder ----
    "dq_benford_digits",
    "dq_referential_integrity",
    "dq_outlier_mad",
    "dq_drift_chisq",
    "dq_l_diversity",
    "suppliers_market_hhi",
    "customers_gini_spend",
    "events_dau_wau",
    "events_time_to_activation",
    "orders_cohort_ltv",
    "events_kpi_decomposition",
)
# ROUND-7 EVIDENCE TODO: after the round-6 driver sample lands, the
# never-sampled set is the 11 deferred names above (already ordered
# past slot 50) plus the round-6 session additions, all currently green
# under the local gate at sf0.001+sf0.01 vanilla AND non-UTC:
#   events_survival_km, events_did_estimator, events_concurrency_peak,
#   events_pattern_funnel, events_global_rownum, events_rolling_hll_wau,
#   events_attribution_markov, events_attribution_shapley,
#   stream_stream_left_outer, dq_dp_noisy_counts,
#   scan_partition_evolution, join_point_in_polygon,
#   asof_join_nearest_click, aqp_stratified_value,
#   udf_arrow_scalar_normalize, events_absence_gaps,
#   dq_duplicate_payments,
#   dedup_substring_strided*, generator_documents_planted*,
#   dedup_planted_recall* (*in the round-6 window -- drop from the list
#   if CORRECTNESS_r06 shows them green).
# Rank the streaming/outer-join and partition-evolution entries first
# (most failure-prone surfaces), then the rest; ~25 candidates fit the
# 50-slot window with room for round-7 additions.

_missing = [n for n in _EVIDENCE_PRIORITY if n not in REGISTRY]
assert not _missing, f"evidence-priority names not in REGISTRY: {_missing}"
_ordered = {n: REGISTRY[n] for n in _EVIDENCE_PRIORITY}
_ordered.update((n, q) for n, q in REGISTRY.items() if n not in _ordered)
REGISTRY.clear()
REGISTRY.update(_ordered)
