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


# Evidence-driven ordering, round 7: the external driver cross-checks the
# FIRST 50 registered queries each round.  CORRECTNESS_r06 landed all 50
# of the round-6 window green, leaving exactly 28 oracled queries with no
# driver evidence ever (the 11 deferred singles + the 17 round-6 session
# additions) -- the round-6 verdict's item 1 says fill the round-7 window
# with those 28 plus the 22 stalest r1/r2 greens.  The 22 re-pins chosen
# by code churn since their last driver green: the format/JSON core (the
# reference-parity heart, last green r1/r2, verdict item 5 names all
# nine), the two queries whose plan+oracle CHANGED this round
# (dedup_simhash gained the max_bucket guard, text_tf_cosine_pairs moved
# to the corpus-relative df cap -- their prior evidence describes code
# that no longer exists), then the dedup family (operators/dedup.py has
# churned every round since r2) and the text/generator cohort.
# Ordering within the 50: most failure-prone first (stream-stream outer
# join, partition-evolution staging, the exotic-API singles), the
# changed-this-round pair mid-window, and the slowest (dedup_clusters,
# minhash) at the tail so a budget truncation costs the least evidence.
_EVIDENCE_PRIORITY = (
    # -- never-sampled: round-6 additions, most failure-prone first --
    "stream_stream_left_outer",
    "scan_partition_evolution",
    "udf_arrow_scalar_normalize",
    "aqp_stratified_value",
    "asof_join_nearest_click",
    "dq_dp_noisy_counts",
    "join_point_in_polygon",
    "events_global_rownum",
    "events_rolling_hll_wau",
    "events_concurrency_peak",
    "events_pattern_funnel",
    "events_survival_km",
    "events_did_estimator",
    "events_attribution_markov",
    "events_attribution_shapley",
    "events_absence_gaps",
    "dq_duplicate_payments",
    # -- never-sampled: the 11 singles deferred from round 6 --
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
    # -- re-pins: the format/JSON reference-parity core (last green
    #    r1/r2; four rounds of churn since) --
    "json_golden_probes",
    "json_golden_probes_tape",
    "json_golden_probes_variant",
    "json_roundtrip_plain",
    "json_shred_typed",
    "json_tojson_canonical",
    "format_roundtrip_jsonb",
    "format_roundtrip_jsonc",
    "format_roundtrip_variant_shred",
    # -- re-pins: plan+oracle changed THIS round --
    "dedup_simhash",
    "text_tf_cosine_pairs",
    # -- re-pins: churned text/generator/dedup families (slowest last) --
    "generator_events",
    "generator_ndv_profile",
    "text_stats",
    "text_quality_score",
    "text_lang_id",
    "text_token_count_bpe",
    "dedup_exact",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
)
# ROUND-8 EVIDENCE TODO: if CORRECTNESS_r07 lands this window green,
# cumulative driver coverage reaches 279/279 oracled queries sampled at
# least once.  Round-8 window should then re-pin by staleness: the
# remaining r1/r2-last-green cohort not re-sampled here (the TPC-H/
# relational/window/scan singles: q3_shipping_priority, flagship_events
# _enriched, filter_pushdown_scan, asof_join_purchase_click,
# range_join_user_events, join_semi_anti_customers, join_sortmerge_
# order_fulfilment, agg_cube_order_status, agg_grouping_sets_orders,
# agg_salted_skew_user, window_topn_orders_per_customer, window_running_
# customer_spend, pivot/unpivot_daily_event_types, sort_topk_lineitems,
# set_ops_nations, subquery_orders_above_cust_avg, sample_stratified,
# string/date/array/map_funcs, events_funnel_conversion, events_
# retention_cohorts, text_top_terms_per_lang, text_fingerprint,
# text_pii_redact, text_gopher_quality, text_decontaminate,
# json_keys_profile, json_ndv_profile), plus the round-7 session
# additions, which were each gated individually at sf0.001+sf0.01
# vanilla AND TZ=America/New_York before their commits but have no
# driver evidence yet: dedup_simhash_blocks, sample_dsir_importance,
# similarity_sq8_recall, events_stl_decompose, events_theil_sen,
# events_forecast_holt_winters, multimodal_audio_fingerprint,
# graph_betweenness_sampled, events_hmm_viterbi,
# events_offpolicy_ips, text_chunk_semantic,
# events_anomaly_stl_residual, sample_neyman_allocation.

_missing = [n for n in _EVIDENCE_PRIORITY if n not in REGISTRY]
assert not _missing, f"evidence-priority names not in REGISTRY: {_missing}"
_ordered = {n: REGISTRY[n] for n in _EVIDENCE_PRIORITY}
_ordered.update((n, q) for n, q in REGISTRY.items() if n not in _ordered)
REGISTRY.clear()
REGISTRY.update(_ordered)
