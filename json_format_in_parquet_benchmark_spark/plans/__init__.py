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


# Evidence-driven ordering, round 10: the external driver cross-checks
# the FIRST 50 registered queries each round.  CORRECTNESS_r09 landed
# 50/50 green, and the round-9 verdict's item 1 orders this window spent
# on the staged 52-query _ROUND10_EVIDENCE_TODO cohort (the 3 r3-stale
# deferrals + the 49 r4-last-green queries) minus slots for whatever
# churned.  Changed plans outrank staleness (their old evidence
# describes dead code); this round that is: customers_rfm_segments
# (three global rank windows -> rank_two_phase, verdict item 2),
# sketch_kmv_ndv + sketch_theta_intersection (per-partition bottom-k
# pre-reduction, verdict item 3), events_interarrival_stats (global gap
# rank -> rank_two_phase, verdict item 6 sweep), parts_abc_pareto
# (global cumulative-share window -> prefix_sum_two_phase, same sweep;
# already in the cohort), and the three below.
# stream_upsert_foreachbatch (mid-rmtree torn swap recovery, ADVICE r9
# medium), format_storage_metrics (oracle text gained the
# intentional-pin fragility note, ADVICE r9 low), and
# sink_partitioned_events (REBALANCE hint on the partitioned write --
# the probe measured the unhinted form file-commit-bound at O(tasks x
# partitions) files).  That is 7 churned slots outside the cohort, so
# the 9 SAFEST cohort entries defer to lead the round-11 TODO: the
# eight r4 TPC-H aggregate singles (q5/q7/q8/q13/q15/q17/q18/q22 --
# zero churn, and the TPC-H family re-pinned 100% green in rounds 8-9)
# plus orders_market_basket (a lineitem self-join single, r4-green).
# Ordering within the 50: the changed cohort first so a truncated pass
# still covers it, then the twice-deferred r3 trio, then the
# failure-prone Arrow/multimodal/scan/sink singles, the similarity and
# search arms, the broad batch cohort, and the slow pipeline at the tail.
_EVIDENCE_PRIORITY = (
    # -- re-pins: plan or oracle changed THIS round --
    "customers_rfm_segments",
    "sketch_kmv_ndv",
    "sketch_theta_intersection",
    "events_interarrival_stats",
    "parts_abc_pareto",
    "stream_upsert_foreachbatch",
    "format_storage_metrics",
    "sink_partitioned_events",
    # -- twice-deferred r3-stale trio: re-pin FIRST among the cohort --
    "q10_returned_items",
    "q14_promo_revenue",
    "scan_schema_evolution",
    # -- r4-stale: Arrow / multimodal / scan / sink surfaces --
    "multimodal_audio_chunks",
    "multimodal_clip_pairing",
    "scan_ndjson_corrupt",
    "scan_csv_events",
    "scan_orc_events",
    "sink_backfill_partition",
    "sink_zorder_events",
    "scd2_customer_priority",
    "table_diff_snapshots",
    # -- r4-stale: similarity / search arms --
    "similarity_hard_negatives",
    "similarity_ivf_append",
    "similarity_ivfpq_topk",
    "similarity_pq_topk",
    "search_hybrid_rrf",
    "search_rerank_proximity",
    # -- r4-stale: text / BPE --
    "text_bpe_encode_corpus",
    "text_bpe_train_merges",
    "text_char_bigram_lm",
    "text_keyword_pagerank",
    # -- r4-stale: dedup --
    "dedup_substring_exact",
    "dedup_substring_remove",
    # -- r4-stale: events batch cohort --
    "events_anomaly_zscore",
    "events_cusum_changepoints",
    "events_gapfill_locf",
    "events_markov_transitions",
    "events_moving_average",
    "events_top_paths",
    "events_user_trend_ols",
    # -- r4-stale: graph --
    "graph_pagerank_trading",
    "graph_triangle_count",
    # -- r4-stale: relational / dq / sample --
    "aqp_sampled_revenue",
    "dq_fd_repair",
    "dq_validate_suite",
    "parts_skyline_cheap_small",
    "profile_length_histogram",
    "sample_domain_cap",
    "sample_weighted_priority",
    "window_ntile_deciles",
    # -- slow composed re-pin at the tail --
    "pipeline_contamination_sweep",
)
# ROUND-11 EVIDENCE TODO (registry-checked below): with the round-10
# window above green, every query's most recent driver green is r5+
# except these 8 deferred r4 TPC-H singles -- fill the round-11 window
# with them first, then whatever churns.
_ROUND11_EVIDENCE_TODO = (
    "orders_market_basket",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q22_dormant_accounts",
)

_missing = [
    n
    for n in _EVIDENCE_PRIORITY + _ROUND11_EVIDENCE_TODO
    if n not in REGISTRY
]
assert not _missing, f"evidence-priority names not in REGISTRY: {_missing}"
_ordered = {n: REGISTRY[n] for n in _EVIDENCE_PRIORITY}
_ordered.update((n, q) for n, q in REGISTRY.items() if n not in _ordered)
REGISTRY.clear()
REGISTRY.update(_ordered)
